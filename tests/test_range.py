"""Random-access decode (--range A:B): only the covering GOPs/members run.

Pinned: every range path emits pixels IDENTICAL to the same slice of the
full decode (reference profile raw stream, indexed + multi-member temporal
containers, turbo containers incl. fallback members), and the decode error
contract holds for out-of-bounds ranges.  The reference decoder can only
walk from frame 0 (3d-DCT-video-encoding-OpenCL/decoder.c:207-236); GOP
temporal independence makes seeking a pure skip here."""

import numpy as np
import pytest

from dct3d_tpu import CodecConfig, decode_video, encode_video
from dct3d_tpu.codec import turbo
from dct3d_tpu.codec.decoder import decode_frame_range
from dct3d_tpu.parallel import multihost

from conftest import synthetic_video


@pytest.fixture(scope="module")
def clip():
    return synthetic_video(40, 32, 40, seed=11)


@pytest.fixture(scope="module")
def stream(clip):
    cfg = CodecConfig()
    return encode_video(clip, cfg), decode_video(
        encode_video(clip, cfg), 40, 32, 40, cfg
    )


@pytest.mark.parametrize("a,b", [(0, 8), (3, 13), (8, 16), (17, 40), (39, 40)])
def test_raw_stream_range_matches_full(stream, a, b):
    data, full = stream
    got = decode_frame_range(data, 40, 32, a, b)
    np.testing.assert_array_equal(got, full[a:b])


def test_raw_stream_range_with_index_positions(clip, stream):
    """positions from an index member: scan-free skip, same pixels."""
    from dct3d_tpu.codec.encoder import StreamingEncoder

    data, full = stream
    cfg = CodecConfig()
    enc = StreamingEncoder(40, 32, cfg)
    chunks = [enc.push(clip[j : j + cfg.gop_size])
              for j in range(0, 40, cfg.gop_size)]
    chunks.append(enc.finish())
    assert b"".join(chunks) == data
    positions = multihost.gop_positions(
        enc.gop_bit_ends, 5, cfg.gop_size, 40
    )
    got = decode_frame_range(data, 40, 32, 11, 29, positions=positions)
    np.testing.assert_array_equal(got, full[11:29])
    with pytest.raises(ValueError):  # short index
        decode_frame_range(data, 40, 32, 11, 29, positions=positions[:2])


def test_range_errors(stream):
    data, _ = stream
    with pytest.raises(ValueError):
        decode_frame_range(data, 40, 32, 5, 5)
    with pytest.raises(EOFError):
        decode_frame_range(data, 40, 32, 36, 48)


def test_container_range_indexed_and_multimember(clip):
    cfg = CodecConfig()
    # Two spans -> two stream members, first with an index member (exactly
    # what a 2-host encode emits).
    from dct3d_tpu.codec.encoder import StreamingEncoder

    parts = []
    offsets = [(0, 24), (24, 40)]
    for i, (a, b) in enumerate(offsets):
        enc = StreamingEncoder(40, 32, cfg)
        chunks = [enc.push(clip[j : j + cfg.gop_size])
                  for j in range(a, b, cfg.gop_size)]
        chunks.append(enc.finish())
        parts.append(multihost._member(b"".join(chunks), b - a))
        if i == 0:
            parts.append(multihost.make_index_member(enc.gop_bit_ends))
    data = b"".join(parts)
    full = multihost.decode_multihost_container(data, 40, 32, cfg)
    for a, b in [(0, 40), (3, 30), (20, 28), (25, 40), (10, 26)]:
        got = multihost.decode_container_range(data, 40, 32, a, b, cfg)
        np.testing.assert_array_equal(got, full[a:b])
    with pytest.raises(EOFError):
        multihost.decode_container_range(data, 40, 32, 39, 41, cfg)


def test_turbo_range_matches_full(clip):
    cfg = CodecConfig()
    data = turbo.encode_turbo_video(clip, cfg)
    full = turbo.decode_turbo_container(data, 40, 32, cfg)
    for a, b in [(0, 8), (3, 13), (16, 40), (39, 40)]:
        got = turbo.decode_turbo_range(data, 40, 32, a, b, cfg)
        np.testing.assert_array_equal(got, full[a:b])
    with pytest.raises(EOFError):
        turbo.decode_turbo_range(data, 40, 32, 32, 48, cfg)
    with pytest.raises(ValueError):
        turbo.decode_turbo_range(data, 40, 32, 8, 8, cfg)


def test_cli_range(tmp_path, clip):
    from dct3d_tpu.cli import main

    src = tmp_path / "src.raw"
    src.write_bytes(clip.tobytes())
    enc = tmp_path / "enc.bin"
    dec_full = tmp_path / "full.raw"
    dec_rng = tmp_path / "rng.raw"
    assert main(["encode", str(src), str(enc), "40", "32"]) in (0, None)
    assert main(["decode", str(enc), str(dec_full), "40", "32", "40"]) \
        in (0, None)
    assert main(["decode", str(enc), str(dec_rng), "40", "32",
                 "--range", "5:21"]) in (0, None)
    full = np.frombuffer(dec_full.read_bytes(), np.uint8).reshape(40, 32, 40)
    got = np.frombuffer(dec_rng.read_bytes(), np.uint8).reshape(-1, 32, 40)
    np.testing.assert_array_equal(got, full[5:21])
    # --range + explicit frame count is ambiguous -> usage error
    assert main(["decode", str(enc), str(dec_rng), "40", "32", "16",
                 "--range", "5:21"]) == 2
    # bad spec
    assert main(["decode", str(enc), str(dec_rng), "40", "32",
                 "--range", "7:7"]) == 2


def test_turbo_range_with_fallback_members():
    """Quant-0 turbo containers interleave reference-profile fallback
    members (test_turbo_quant0_falls_back_per_gop); --range must decode
    across the member-type seam identically."""
    cfg = CodecConfig(quant_strength=0)
    clip = synthetic_video(24, 64, 64, seed=77)
    data = turbo.encode_turbo_video(clip, cfg)
    types = [m[2] for m in multihost.split_members(data)]
    assert multihost.MEMBER_TEMPORAL in types, types
    full = turbo.decode_turbo_container(data, 64, 64, cfg)
    for a, b in [(0, 24), (5, 19), (9, 16)]:
        got = turbo.decode_turbo_range(data, 64, 64, a, b, cfg)
        np.testing.assert_array_equal(got, full[a:b])


def test_turbo_range_wrong_container_raises_valueerror(clip):
    """A container with no turbo-or-fallback members (e.g. RGB channel
    types) is a wrong TYPE, not truncation: ValueError (matching
    decode_turbo_container), never EOFError.  (A plain temporal container
    IS legal turbo input — the every-GOP-fell-back case.)"""
    cfg = CodecConfig()
    ch = encode_video(clip[:8], cfg)
    rgbish = b"".join(
        multihost._member(ch, 8, t)
        for t in (multihost.MEMBER_RED, multihost.MEMBER_GREEN,
                  multihost.MEMBER_BLUE)
    )
    with pytest.raises(ValueError):
        turbo.decode_turbo_range(rgbish, 40, 32, 0, 8, cfg)
    # the every-GOP-fell-back container decodes fine through the range API
    plain = multihost._member(encode_video(clip, cfg), 40)
    got = turbo.decode_turbo_range(plain, 40, 32, 3, 13, cfg)
    np.testing.assert_array_equal(
        got, decode_video(encode_video(clip, cfg), 40, 32, 40, cfg)[3:13]
    )


def test_rgb_range_matches_full():
    """RGB containers (reference profile, with and without index; turbo-rgb;
    legacy all-zero tags via the CLI flag) decode ranges identical to the
    full decode's slice."""
    from dct3d_tpu.codec import rgb_codec

    cfg = CodecConfig()
    rgb = np.stack(
        [synthetic_video(24, 32, 40, seed=s) for s in (1, 2, 3)], axis=-1
    )
    data = rgb_codec.encode_rgb_video(rgb, cfg, index=True)
    full = rgb_codec.decode_rgb_video(data, 40, 32, cfg)
    for a, b in [(0, 24), (5, 19), (9, 16)]:
        got = rgb_codec.decode_rgb_range(data, 40, 32, a, b, cfg)
        np.testing.assert_array_equal(got, full[a:b])
    with pytest.raises(EOFError):
        rgb_codec.decode_rgb_range(data, 40, 32, 20, 30, cfg)

    tdata = turbo.encode_turbo_rgb_video(rgb, cfg)
    tfull = turbo.decode_turbo_rgb_video(tdata, 40, 32, cfg)
    for a, b in [(3, 13), (16, 24)]:
        got = turbo.decode_turbo_rgb_range(tdata, 40, 32, a, b, cfg)
        np.testing.assert_array_equal(got, tfull[a:b])


def test_cli_range_legacy_rgb(tmp_path, clip):
    """Legacy all-zero-tag 3-member RGB containers are identified only by
    the --rgb flag; --range must decode them as RGB, never concatenate the
    channel streams as grayscale frames."""
    from dct3d_tpu.cli import main
    from dct3d_tpu.codec import rgb_codec

    cfg = CodecConfig()
    ch = encode_video(clip[:8], cfg)
    legacy = b"".join(multihost._member(ch, 8, 0) for _ in range(3))
    p = tmp_path / "legacy.d3v"
    p.write_bytes(legacy)
    out = tmp_path / "o.rgb"
    assert main(["decode", str(p), str(out), "40", "32",
                 "--rgb", "--range", "2:6"]) in (0, None)
    full = rgb_codec.decode_rgb_video(legacy, 40, 32, cfg)
    got = np.frombuffer(out.read_bytes(), np.uint8).reshape(-1, 32, 40, 3)
    np.testing.assert_array_equal(got, full[2:6])


def test_range_fuzz_error_contract(stream, rng):
    """--range inherits the decode error contract: corrupt -> ValueError,
    truncated -> EOFError; raw zlib exceptions never escape."""
    data, _ = stream
    # (Cutting just the 2-byte adler tail leaves a complete payload and
    # legitimately decodes, matching decode_video — so cut well inside.)
    for cut in (1, len(data) // 3, 2 * len(data) // 3):
        with pytest.raises((EOFError, ValueError)):
            decode_frame_range(data[:cut], 40, 32, 17, 40)
    buf = bytearray(data)
    for _ in range(8):
        i = int(rng.integers(0, len(buf)))
        buf[i] ^= int(rng.integers(1, 256))
    try:
        decode_frame_range(bytes(buf), 40, 32, 17, 40)
    except (ValueError, EOFError):
        pass  # either contract error is fine; anything else must not escape


def test_cli_range_checkpointed_container(tmp_path, clip):
    """--range across a checkpointed container's member seams (one member
    per --checkpoint-every span) equals the full decode's slice — both
    profiles."""
    from dct3d_tpu.cli import main
    from dct3d_tpu.io import rawvideo

    src = str(tmp_path / "src.raw")
    rawvideo.write_video(src, clip)
    for tag, flags in (("p", []), ("t", ["--turbo"])):
        out = str(tmp_path / f"ck_{tag}.d3mh")
        assert main(["encode", src, out, "40", "32",
                     "--checkpoint-every", "2", *flags]) == 0
        full = str(tmp_path / f"full_{tag}.raw")
        rng_ = str(tmp_path / f"rng_{tag}.raw")
        assert main(["decode", out, full, "40", "32"]) == 0
        # 12:28 spans the member boundary at frame 16 (2 GOPs/member)
        assert main(["decode", out, rng_, "40", "32",
                     "--range", "12:28"]) in (0, None)
        fb = open(full, "rb").read()
        assert open(rng_, "rb").read() == fb[12 * 1280 : 28 * 1280]


def test_cli_range_with_crop_and_y4m(tmp_path):
    """--range composes with --pad/--crop and with .y4m output."""
    from dct3d_tpu.cli import main
    from dct3d_tpu.io import rawvideo

    clip = synthetic_video(16, 30, 36, seed=9)  # needs --pad (not /8)
    src = str(tmp_path / "src.raw")
    rawvideo.write_video(src, clip)
    enc = str(tmp_path / "e.bin")
    assert main(["encode", src, enc, "36", "30", "--pad"]) == 0
    full = str(tmp_path / "full.raw")
    assert main(["decode", enc, full, "40", "32", "16",
                 "--crop", "36x30"]) == 0
    rng_ = str(tmp_path / "rng.raw")
    assert main(["decode", enc, rng_, "40", "32",
                 "--range", "4:12", "--crop", "36x30"]) in (0, None)
    fb = open(full, "rb").read()
    fpx = 36 * 30
    assert open(rng_, "rb").read() == fb[4 * fpx : 12 * fpx]
    # y4m output of a range
    y4m = str(tmp_path / "r.y4m")
    assert main(["decode", enc, y4m, "40", "32",
                 "--range", "4:12", "--crop", "36x30"]) in (0, None)
    head = open(y4m, "rb").read(60)
    assert head.startswith(b"YUV4MPEG2") and b"W36 H30" in head


def test_decode_auto_range_routes_all_forms(clip):
    """decode_auto_range routes raw / temporal / turbo / rgb forms like the
    CLI and equals decode_auto's slice."""
    from dct3d_tpu import decode_auto, decode_auto_range
    from dct3d_tpu.codec import rgb_codec

    cfg = CodecConfig()
    rgb = np.stack(
        [synthetic_video(16, 32, 40, seed=s) for s in (4, 5, 6)], axis=-1
    )
    forms = [
        encode_video(clip, cfg),
        multihost._member(encode_video(clip, cfg), 40),
        turbo.encode_turbo_video(clip, cfg),
        rgb_codec.encode_rgb_video(rgb, cfg),
        turbo.encode_turbo_rgb_video(rgb, cfg),
    ]
    for data in forms:
        full = decode_auto(data, 40, 32, frames=None if data[:4] == b"D3MH"
                           else 40, cfg=cfg)
        got = decode_auto_range(data, 40, 32, 3, 11, cfg=cfg)
        np.testing.assert_array_equal(got, full[3:11])
