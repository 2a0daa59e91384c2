"""Seekable per-GOP bit index (docs/FORMAT.md "index member").

The headerless reference stream forces a serial eg_scan before parallel
entropy decode; the index removes it.  Pinned here:
  * the encoder's gop_bit_ends equal the scan-derived GOP boundaries,
  * parallel_chunks with positions is bit-identical to the scanning path,
  * the sharded encoder's index matches the single-device one,
  * the CLI container roundtrip (encode --index -> info -> decode with no
    frame count) reproduces the plain decode exactly.
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pytest

from dct3d_tpu.codec import entropy
from dct3d_tpu.codec.decoder import decode_video
from dct3d_tpu.codec.encoder import StreamingEncoder
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.parallel import multihost

from conftest import synthetic_video


def _encode_with_index(video, cfg):
    t, h, w = video.shape
    enc = StreamingEncoder(w, h, cfg)
    chunks = [enc.push(video[i : i + cfg.gop_size])
              for i in range(0, t, cfg.gop_size)]
    chunks.append(enc.finish())
    return b"".join(chunks), enc.gop_bit_ends


def test_gop_bit_ends_match_scan():
    cfg = CodecConfig()
    video = synthetic_video(24, 32, 40)
    data, ends = _encode_with_index(video, cfg)
    assert len(ends) == 3
    payload = zlib.decompress(data)
    cpg = 32 * 40 * cfg.gop_size
    pos = 0
    for e in ends:
        pos = entropy.scan_values(payload, cpg, pos)
        if pos is None:
            pytest.skip("native library unavailable")
        assert pos == e


def test_parallel_chunks_positions_match_scanned():
    cfg = CodecConfig()
    video = synthetic_video(32, 24, 32, seed=3)
    data, ends = _encode_with_index(video, cfg)
    payload = np.frombuffer(zlib.decompress(data), np.uint8)
    cpg = 24 * 32 * cfg.gop_size
    n = len(ends)
    if entropy.scan_values(payload, 1, 0) is None:
        pytest.skip("native library unavailable")
    scanned = list(entropy.parallel_chunks(
        payload, cpg, n, entropy.decode_values))
    positions = multihost.gop_positions(ends, n, cfg.gop_size, 32)
    assert positions is not None
    indexed = list(entropy.parallel_chunks(
        payload, cpg, n, entropy.decode_values, positions=positions))
    for (va, pa), (vb, pb) in zip(scanned, indexed):
        np.testing.assert_array_equal(va, vb)
        assert pa == pb


def test_parallel_chunks_short_index_rejected():
    with pytest.raises(ValueError):
        list(entropy.parallel_chunks(
            np.zeros(8, np.uint8), 4, 3, entropy.decode_values,
            positions=[0, 10],
        ))


def test_gop_positions_guards():
    # Stale index (wrong GOP count for the member) -> None, not garbage.
    assert multihost.gop_positions([10, 20], 3, 8, 24) is None
    assert multihost.gop_positions([10, 20, 30], 3, 8, 24) == [0, 10, 20]


def test_sharded_index_matches_single_device():
    import jax

    from dct3d_tpu.parallel import mesh as mesh_lib
    from dct3d_tpu.parallel.sharding import ShardedEncoder

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = CodecConfig()
    video = synthetic_video(32, 32, 40, seed=5)
    _, ends_single = _encode_with_index(video, cfg)
    m = mesh_lib.make_mesh(gop=2, tile=2, devices=jax.devices()[:4])
    enc = ShardedEncoder(40, 32, m, cfg)
    enc.push(video)
    enc.finish()
    assert enc.gop_bit_ends == ends_single


def test_index_member_roundtrip():
    ends = [5, 123456789, 2**40]
    member = multihost.make_index_member(ends)
    parsed = multihost.split_members(member)
    assert parsed[0][2] == multihost.MEMBER_INDEX
    assert multihost.parse_index(parsed[0][1]) == ends
    # An index member among temporal members keeps the container temporal.
    stream = multihost._member(b"x", 8)
    kind = multihost.container_kind(multihost.split_members(stream + member))
    assert kind == "temporal"


def test_container_decode_uses_index(monkeypatch):
    cfg = CodecConfig()
    video = synthetic_video(24, 32, 40, seed=7)
    data, ends = _encode_with_index(video, cfg)
    plain = decode_video(data, 40, 32, 24, cfg)
    container = (multihost._member(data, 24)
                 + multihost.make_index_member(ends))
    # Prove the index path is taken: scanning must not be needed.
    monkeypatch.setattr(
        entropy, "scan_values",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("scanned")),
    )
    out = multihost.decode_multihost_container(container, 40, 32, cfg)
    np.testing.assert_array_equal(out, plain)


def test_cli_index_roundtrip(tmp_path):
    from dct3d_tpu.cli import main

    src = tmp_path / "src.raw"
    enc = tmp_path / "enc.d3v"
    dec = tmp_path / "dec.raw"
    video = synthetic_video(24, 32, 40, seed=9)
    src.write_bytes(video.tobytes())
    assert main(["encode", str(src), str(enc), "40", "32", "--index"]) == 0
    # info reports the index member with its GOP count.
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["info", str(enc)]) == 0
    info = json.loads(buf.getvalue())
    assert info["kind"] == "temporal"
    types = [m["type"] for m in info["members"]]
    assert types == ["temporal", "index"]
    assert info["members"][1]["gops"] == 3
    # decode with NO frame count (self-describing container).
    assert main(["decode", str(enc), str(dec), "40", "32"]) == 0
    got = np.frombuffer(dec.read_bytes(), np.uint8).reshape(24, 32, 40)
    ref = decode_video(
        zlib_stream_of(enc.read_bytes()), 40, 32, 24, CodecConfig()
    )
    np.testing.assert_array_equal(got, ref)


def zlib_stream_of(container: bytes) -> bytes:
    """First temporal member's payload of a D3MH container."""
    return multihost.split_members(container)[0][1]


def test_rgb_index_roundtrip(monkeypatch):
    from dct3d_tpu.codec.rgb_codec import decode_rgb_video, encode_rgb_video

    cfg = CodecConfig()
    rgb = np.stack(
        [synthetic_video(16, 24, 32, seed=s) for s in (1, 2, 3)], axis=-1
    )
    plain = encode_rgb_video(rgb, cfg)
    indexed = encode_rgb_video(rgb, cfg, index=True)
    members = multihost.split_members(indexed)
    assert [m[2] for m in members] == [1, 4, 2, 4, 3, 4]
    assert multihost.container_kind(members) == "rgb"
    want = decode_rgb_video(plain, 32, 24, cfg)
    # Indexed decode must not scan.
    monkeypatch.setattr(
        entropy, "scan_values",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("scanned")),
    )
    got = decode_rgb_video(indexed, 32, 24, cfg)
    np.testing.assert_array_equal(got, want)


def test_cli_mesh_decode_indexed_container(tmp_path, monkeypatch):
    """decode --mesh on an indexed single-stream container routes through
    the ShardedDecoder with the index positions (no serial scan)."""
    import jax

    from dct3d_tpu.cli import main

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    src = tmp_path / "src.raw"
    enc = tmp_path / "enc.d3v"
    dec = tmp_path / "dec.raw"
    deq = tmp_path / "deq.raw"
    video = synthetic_video(32, 32, 40, seed=11)
    src.write_bytes(video.tobytes())
    assert main(["encode", str(src), str(enc), "40", "32", "--index"]) == 0
    assert main(["decode", str(enc), str(dec), "40", "32"]) == 0
    monkeypatch.setattr(
        entropy, "scan_values",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("scanned")),
    )
    assert main(["decode", str(enc), str(deq), "40", "32",
                 "--mesh", "2x2"]) == 0
    assert dec.read_bytes() == deq.read_bytes()


def test_checkpoint_index_members(tmp_path, monkeypatch):
    """--checkpoint-every + --index: every member carries its index; resume
    keeps the pairing and the container decodes scan-free."""
    from dct3d_tpu.codec.checkpoint import CheckpointingEncoder

    cfg = CodecConfig()
    video = synthetic_video(32, 24, 32, seed=13)
    path = str(tmp_path / "ckpt.d3v")
    with CheckpointingEncoder(path, 32, 24, cfg, checkpoint_gops=2,
                              index=True) as enc:
        enc.push(video[:16])
    with CheckpointingEncoder(path, 32, 24, cfg, checkpoint_gops=2,
                              index=True) as enc:
        assert enc.frames_done == 16
        enc.push(video[16:])
    data = open(path, "rb").read()
    members = multihost.split_members(data)
    assert [m[2] for m in members] == [0, 4, 0, 4]
    assert all(
        len(multihost.parse_index(p)) == 2
        for _, p, t in members if t == multihost.MEMBER_INDEX
    )
    want = decode_video(members[0][1], 32, 24, 16, cfg)
    monkeypatch.setattr(
        entropy, "scan_values",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("scanned")),
    )
    got = multihost.decode_multihost_container(data, 32, 24, cfg)
    np.testing.assert_array_equal(got[:16], want)
    assert got.shape == (32, 24, 32)


def test_torn_index_member_falls_back(tmp_path):
    """A crash mid-index-write leaves a torn index member: decode must fall
    back to the scanning path (stream members are valid), not crash."""
    cfg = CodecConfig()
    video = synthetic_video(16, 24, 32, seed=17)
    data, ends = _encode_with_index(video, cfg)
    whole = multihost._member(data, 16) + multihost.make_index_member(ends)
    torn = whole[:-7]  # cut inside the index payload
    assert multihost.parse_index(
        multihost.split_members(torn)[-1][1]
    ) is None
    want = decode_video(data, 32, 24, 16, cfg)
    got = multihost.decode_multihost_container(torn, 32, 24, cfg)
    np.testing.assert_array_equal(got, want)


def test_container_without_streams_rejected():
    idx_only = multihost.make_index_member([1, 2])
    with pytest.raises(ValueError, match="no decodable stream members"):
        multihost.decode_multihost_container(idx_only, 8, 8)


def test_cli_mesh_decode_tail_gops_fall_back(tmp_path, capsys):
    """decode --mesh on a container whose frame count doesn't fill whole
    mesh steps must decode ALL frames (single-device fallback), not drop
    the tail."""
    import jax

    from dct3d_tpu.cli import main

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    src = tmp_path / "src.raw"
    enc = tmp_path / "enc.d3v"
    dec = tmp_path / "dec.raw"
    video = synthetic_video(24, 32, 40, seed=19)  # 3 GOPs, mesh step = 2
    src.write_bytes(video.tobytes())
    assert main(["encode", str(src), str(enc), "40", "32", "--index"]) == 0
    assert main(["decode", str(enc), str(dec), "40", "32",
                 "--mesh", "2x2"]) == 0
    assert len(dec.read_bytes()) == 24 * 32 * 40


def test_multihost_encode_index(monkeypatch):
    """encode_multihost(index=True): main + tail members each carry their
    index, and container decode is scan-free and equal to the plain form."""
    import jax

    from dct3d_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    cfg = CodecConfig()
    m = mesh_lib.make_mesh(gop=2, tile=1, devices=jax.devices()[:2])
    video = synthetic_video(24, 24, 32, seed=23)  # 3 GOPs: 2 main + 1 tail
    plain = multihost.encode_multihost(video, 32, 24, 24, m, cfg)
    indexed = multihost.encode_multihost(video, 32, 24, 24, m, cfg,
                                         index=True)
    assert [x[2] for x in multihost.split_members(indexed)] == [0, 4, 0, 4]
    want = multihost.decode_multihost_container(plain, 32, 24, cfg)
    monkeypatch.setattr(
        entropy, "scan_values",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("scanned")),
    )
    got = multihost.decode_multihost_container(indexed, 32, 24, cfg)
    np.testing.assert_array_equal(got, want)
