"""Parallel-inflatable streams (index member v2 sync offsets).

The whole-stream inflate was the last serial stage of the host decode
path.  The parallel DEFLATE sink now resets its priming window at GOP
boundaries (entropy.ParallelDeflateSink.gop_boundary) so no back-
reference crosses them, records the compressed byte offset of each
boundary, and the index member carries those offsets (v2 — old readers
ignore the extra array).  Decode then inflates GOPs in parallel
(entropy.parallel_inflate) with serial fallback on ANY inconsistency.

Pinned here: the stream still inflates end-to-end as ONE valid zlib
stream (reference-readable), the parallel inflate is byte-identical to
the serial one, index v1/v2 parsing coexists, and garbage syncs can
never produce wrong output.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from conftest import synthetic_video

from dct3d_tpu.codec import entropy
from dct3d_tpu.codec.decoder import decode_video
from dct3d_tpu.codec.encoder import StreamingEncoder
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.parallel import multihost


def _sink_stream(chunks, boundaries=True):
    sink = entropy.ParallelDeflateSink(workers=2, block_size=1 << 14)
    out = []
    for c in chunks:
        if boundaries:
            sink.gop_boundary()
        out.append(sink.push_packed(np.frombuffer(c, np.uint8), len(c) * 8))
    out.append(sink.finish())
    syncs = sink.sync_offsets()
    sink.close()
    return b"".join(out), syncs


def test_sink_boundaries_keep_one_valid_stream():
    rng = np.random.default_rng(0)
    chunks = [rng.integers(0, 50, 60000, dtype=np.uint8).tobytes()
              for _ in range(5)]
    data, syncs = _sink_stream(chunks)
    assert zlib.decompress(data) == b"".join(chunks) + b"\x00"
    assert syncs is not None and len(syncs) == 5 and syncs[0] == 2
    assert syncs == sorted(syncs)


def test_parallel_inflate_matches_serial():
    rng = np.random.default_rng(1)
    chunks = [rng.integers(0, 99, rng.integers(1, 90000), dtype=np.uint8)
              .tobytes() for _ in range(7)]
    data, syncs = _sink_stream(chunks)
    assert entropy.parallel_inflate(data, syncs) == zlib.decompress(data)


def test_parallel_inflate_rejects_garbage_syncs():
    rng = np.random.default_rng(2)
    chunks = [rng.integers(0, 9, 40000, dtype=np.uint8).tobytes()
              for _ in range(3)]
    data, syncs = _sink_stream(chunks)
    want = zlib.decompress(data)
    # wrong offsets (still sorted/in-range) must fall back, not corrupt
    bad = [2, max(3, syncs[1] - 1), syncs[2] + 1]
    assert entropy.parallel_inflate(data, bad) == want
    # non-sync-reset stream (priming crosses boundaries): fallback too
    data2, _ = _sink_stream(chunks, boundaries=False)
    assert entropy.parallel_inflate(data2, syncs) == zlib.decompress(data2)
    # malformed lists
    assert entropy.parallel_inflate(data, []) == want
    assert entropy.parallel_inflate(data, [5, 4, 3]) == want


def test_index_member_v2_roundtrip_and_compat():
    ends = [100, 250, 391]
    syncs = [2, 40, 77]
    m2 = multihost.make_index_member(ends, sync_offsets=syncs)
    m1 = multihost.make_index_member(ends)
    (_, p2, t2), = multihost.split_members(m2)
    (_, p1, t1), = multihost.split_members(m1)
    assert t1 == t2 == multihost.MEMBER_INDEX
    assert multihost.parse_index(p2) == ends  # v1 readers see v1 content
    assert multihost.parse_index(p1) == ends
    assert multihost.parse_index_syncs(p2) == syncs
    assert multihost.parse_index_syncs(p1) is None


def test_encoder_syncs_decode_identically():
    cfg = CodecConfig(deflate_workers=2)  # parallel sink
    video = synthetic_video(32, 32, 48, seed=11)
    enc = StreamingEncoder(48, 32, cfg)
    data = enc.push(video) + enc.finish()
    syncs = enc.gop_sync_offsets
    assert syncs is not None and len(syncs) == 4
    ends = enc.gop_bit_ends
    payload = zlib.decompress(data)
    assert entropy.parallel_inflate(data, syncs) == payload
    positions = multihost.gop_positions(ends, 4, cfg.gop_size, 32)
    a = decode_video(data, 48, 32, 32, cfg, positions=positions,
                     sync_offsets=syncs)
    b = decode_video(data, 48, 32, 32, cfg, positions=positions)
    np.testing.assert_array_equal(a, b)


def test_parity_sink_has_no_syncs():
    cfg = CodecConfig(deflate_workers=0)
    video = synthetic_video(16, 32, 48, seed=3)
    enc = StreamingEncoder(48, 32, cfg)
    enc.push(video) + enc.finish()
    assert enc.gop_sync_offsets is None


def test_cli_default_container_carries_syncs(tmp_path):
    from dct3d_tpu import cli
    from dct3d_tpu.io import rawvideo

    src = str(tmp_path / "src.raw")
    rawvideo.write_video(src, synthetic_video(24, 32, 48, seed=5))
    enc = str(tmp_path / "enc.bin")
    assert cli.main(["encode", src, enc, "48", "32"]) == 0
    with open(enc, "rb") as f:
        members = multihost.split_members(f.read())
    ipay = next(p for _, p, t in members if t == multihost.MEMBER_INDEX)
    syncs = multihost.parse_index_syncs(ipay)
    assert syncs is not None and len(syncs) == 3
    # container decode (routes through decode_multihost_container ->
    # parallel inflate) still yields the counted-raw decode's pixels
    dec = str(tmp_path / "dec.raw")
    assert cli.main(["decode", enc, dec, "48", "32"]) == 0
    raw = str(tmp_path / "raw.bin")
    assert cli.main(["encode", src, raw, "48", "32", "--no-index"]) == 0
    dec2 = str(tmp_path / "dec2.raw")
    assert cli.main(["decode", raw, dec2, "48", "32", "24"]) == 0
    np.testing.assert_array_equal(
        rawvideo.read_video(dec, 48, 32), rawvideo.read_video(dec2, 48, 32)
    )


def test_equal_adjacent_syncs_are_empty_spans():
    rng = np.random.default_rng(7)
    chunks = [rng.integers(0, 40, 50000, dtype=np.uint8).tobytes()
              for _ in range(3)]
    sink = entropy.ParallelDeflateSink(workers=2, block_size=1 << 14)
    out = []
    for c in chunks:
        sink.gop_boundary()
        sink.gop_boundary()  # duplicate boundary: empty span
        out.append(sink.push_packed(np.frombuffer(c, np.uint8), len(c) * 8))
    out.append(sink.finish())
    syncs = sink.sync_offsets()
    sink.close()
    data = b"".join(out)
    assert len(syncs) == 6
    assert entropy.parallel_inflate(data, syncs) == zlib.decompress(data)


def test_sharded_encoder_emits_step_syncs():
    import jax

    from dct3d_tpu.parallel.mesh import make_mesh
    from dct3d_tpu.parallel.sharding import ShardedEncoder

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    mesh = make_mesh(gop=2, tile=1, devices=jax.devices()[:2])
    cfg = CodecConfig(deflate_workers=2)
    video = synthetic_video(32, 64, 64, seed=9)
    enc = ShardedEncoder(64, 64, mesh, cfg)
    data = enc.push(video) + enc.finish()
    syncs = enc.gop_sync_offsets
    assert syncs is not None and len(syncs) == 4  # 2 steps x 2 GOPs
    assert syncs[0] == syncs[1] == 2 and syncs[2] == syncs[3] > 2
    assert entropy.parallel_inflate(data, syncs) == zlib.decompress(data)


def test_rgb_index_container_carries_syncs():
    from dct3d_tpu.codec.rgb_codec import decode_rgb_video, encode_rgb_video

    rng = np.random.default_rng(13)
    video = rng.integers(0, 256, (16, 32, 48, 3), dtype=np.uint16).astype(
        np.uint8
    )
    cfg = CodecConfig(deflate_workers=2)
    data = encode_rgb_video(video, cfg, index=True)
    members = multihost.split_members(data)
    idx_payloads = [p for _, p, t in members if t == multihost.MEMBER_INDEX]
    assert len(idx_payloads) == 3
    assert all(multihost.parse_index_syncs(p) is not None
               for p in idx_payloads)
    a = decode_rgb_video(data, 48, 32, cfg)
    b = decode_rgb_video(encode_rgb_video(video, cfg, index=False),
                         48, 32, cfg)
    np.testing.assert_array_equal(a, b)
