"""Checkpoint/resume tests (SURVEY.md §5: absent in the reference; per-GOP
member boundaries are the natural restart points)."""

import numpy as np

from dct3d_tpu import CodecConfig, psnr
from dct3d_tpu.codec.checkpoint import CheckpointingEncoder, resume_info
from dct3d_tpu.parallel.multihost import decode_multihost_container

from conftest import synthetic_video


def test_checkpoint_resume_after_crash(tmp_path):
    cfg = CodecConfig()
    clip = synthetic_video(48, 64, 64, seed=20)
    p = str(tmp_path / "v.d3mh")

    # First run: encode 32 of 48 frames (2 complete members of 2 GOPs),
    # then "crash" with a torn member tail on disk.
    enc = CheckpointingEncoder(p, 64, 64, cfg, checkpoint_gops=2)
    enc.push(clip[:32])
    enc._f.write(b"D3MHgarbage-torn-member")  # simulate crash mid-write
    enc._f.flush()
    enc._f.close()

    frames_safe, bytes_safe = resume_info(p)
    assert frames_safe == 32

    # Resume: constructor truncates the torn tail and continues.
    with CheckpointingEncoder(p, 64, 64, cfg, checkpoint_gops=2) as enc2:
        assert enc2.frames_done == 32
        enc2.push(clip[32:])

    frames_safe, _ = resume_info(p)
    assert frames_safe == 48
    out = decode_multihost_container(open(p, "rb").read(), 64, 64, cfg)
    assert out.shape == (48, 64, 64)
    assert psnr(clip, out) > 30.0


def test_checkpoint_stream_matches_uninterrupted(tmp_path):
    """A resumed file is byte-identical to an uninterrupted run with the
    same checkpoint interval."""
    cfg = CodecConfig()
    clip = synthetic_video(32, 64, 64, seed=21)
    a, b = str(tmp_path / "a.d3mh"), str(tmp_path / "b.d3mh")
    with CheckpointingEncoder(a, 64, 64, cfg, checkpoint_gops=1) as enc:
        enc.push(clip)
    with CheckpointingEncoder(b, 64, 64, cfg, checkpoint_gops=1) as enc:
        enc.push(clip[:16])
    with CheckpointingEncoder(b, 64, 64, cfg, checkpoint_gops=1) as enc:
        assert enc.frames_done == 16
        enc.push(clip[16:])
    assert open(a, "rb").read() == open(b, "rb").read()


def test_cli_checkpoint_encode_decode(tmp_path, capsys):
    from dct3d_tpu import cli
    from dct3d_tpu.io import rawvideo

    clip = synthetic_video(32, 32, 32, seed=22)
    src = str(tmp_path / "src.raw")
    out = str(tmp_path / "v.d3mh")
    dec = str(tmp_path / "dec.raw")
    rawvideo.write_video(src, clip)
    assert cli.main(["encode", src, out, "32", "32",
                     "--checkpoint-every", "2"]) == 0
    # Re-run: resumes (no new frames) and stays valid.
    assert cli.main(["encode", src, out, "32", "32",
                     "--checkpoint-every", "2"]) == 0
    # Container decode without explicit frame count.
    assert cli.main(["decode", out, dec, "32", "32"]) == 0
    back = rawvideo.read_video(dec, 32, 32)
    assert psnr(clip, back) > 30.0


def test_parallel_member_decode_equals_serial(tmp_path):
    """Container members decode in parallel threads to the same frames."""
    from dct3d_tpu.parallel.multihost import (
        _member,
        decode_multihost_container,
    )
    from dct3d_tpu import encode_video

    cfg = CodecConfig()
    clip = synthetic_video(48, 64, 64, seed=23)
    data = b"".join(
        _member(encode_video(clip[i : i + 16], cfg), 16) for i in (0, 16, 32)
    )
    a = decode_multihost_container(data, 64, 64, cfg, workers=3)
    b = decode_multihost_container(data, 64, 64, cfg, workers=1)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (48, 64, 64)
    assert psnr(clip, a) > 30.0


def test_resume_with_different_cfg_rejected(tmp_path):
    p = str(tmp_path / "v.d3mh")
    clip = synthetic_video(16, 64, 64, seed=24)
    with CheckpointingEncoder(p, 64, 64, CodecConfig(quant_strength=5)) as e:
        e.push(clip)
    import pytest

    with pytest.raises(ValueError, match="resume parameters differ"):
        CheckpointingEncoder(p, 64, 64, CodecConfig(quant_strength=10))


def test_resume_ignores_compression_effort_knobs(tmp_path):
    """zlib/zstd level and deflate workers are wire-neutral (members are
    self-contained streams); a default bump in a new build must not
    refuse to resume old files.  Semantic knobs still reject."""
    from conftest import synthetic_video

    clip = synthetic_video(32, 64, 64, seed=24)
    p = str(tmp_path / "v.d3t")
    with CheckpointingEncoder(p, 64, 64, CodecConfig(turbo_zstd_level=10),
                              checkpoint_gops=2, turbo=True) as enc:
        enc.push(clip[:16])
    with CheckpointingEncoder(p, 64, 64, CodecConfig(turbo_zstd_level=3),
                              checkpoint_gops=2, turbo=True) as enc:
        assert enc.frames_done == 16
        enc.push(clip[16:])
    from dct3d_tpu.codec.turbo import decode_turbo_container

    out = decode_turbo_container(open(p, "rb").read(), 64, 64)
    assert out.shape == (32, 64, 64)
    import pytest

    with pytest.raises(ValueError, match="resume parameters differ"):
        CheckpointingEncoder(p, 64, 64, CodecConfig(quant_strength=9),
                             checkpoint_gops=2, turbo=True)
