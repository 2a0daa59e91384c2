"""Seekability is the default for framework outputs (round 5).

Default file encodes wrap the stream in an indexed D3MH container, so
decode needs no frame count and the host entropy stage is scan-free;
--no-index restores the raw headerless stream; --parity keeps the raw
reference-byte-exact layout, with --index writing the index to an .idx
sidecar that decode auto-loads.  The stream bytes themselves never change
(the indexed-vs-raw member byte-identity is pinned in test_index.py).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from conftest import synthetic_video

from dct3d_tpu import cli
from dct3d_tpu.io import rawvideo


@pytest.fixture(scope="module")
def clip_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("seek")
    src = str(d / "src.raw")
    video = synthetic_video(24, 32, 48, seed=7)
    rawvideo.write_video(src, video)
    return src, video


def _read(path, w=48, h=32):
    return rawvideo.read_video(path, w, h)


def test_default_encode_is_indexed_container(tmp_path, clip_file, capsys):
    src, video = clip_file
    enc = str(tmp_path / "enc.bin")
    dec = str(tmp_path / "dec.raw")
    assert cli.main(["encode", src, enc, "48", "32"]) == 0
    with open(enc, "rb") as f:
        assert f.read(4) == b"D3MH"
    assert cli.main(["info", enc]) == 0
    out = capsys.readouterr().out
    assert "index" in out
    # decode with NO frame count
    assert cli.main(["decode", enc, dec, "48", "32"]) == 0
    got = _read(dec)
    assert got.shape[0] == 24
    # pixels identical to the raw-stream decode
    enc2 = str(tmp_path / "enc2.bin")
    dec2 = str(tmp_path / "dec2.raw")
    assert cli.main(["encode", src, enc2, "48", "32", "--no-index"]) == 0
    with open(enc2, "rb") as f:
        assert f.read(4) != b"D3MH"
    assert cli.main(["decode", enc2, dec2, "48", "32", "24"]) == 0
    np.testing.assert_array_equal(got, _read(dec2))


def test_parity_stays_raw_and_sidecar_indexes(tmp_path, clip_file):
    src, video = clip_file
    p0 = str(tmp_path / "p0.bin")  # --parity alone: raw, no sidecar
    p1 = str(tmp_path / "p1.bin")  # --parity --index: raw + .idx sidecar
    assert cli.main(["encode", src, p0, "48", "32", "--parity"]) == 0
    assert cli.main(["encode", src, p1, "48", "32", "--parity",
                     "--index"]) == 0
    assert not os.path.exists(p0 + ".idx")
    assert os.path.exists(p1 + ".idx")
    with open(p0, "rb") as a, open(p1, "rb") as b:
        pa, pb = a.read(), b.read()
    assert pa == pb, "sidecar must not change the parity stream bytes"
    assert pa[:4] != b"D3MH"
    # sidecar: decode with no frame count, via the indexed entropy path
    dec = str(tmp_path / "dec.raw")
    from dct3d_tpu.codec import decoder as decoder_mod

    calls = {}
    orig = decoder_mod.decode_video

    def spy(*a, **k):
        calls["positions"] = k.get("positions")
        return orig(*a, **k)

    decoder_mod.decode_video = spy
    try:
        assert cli.main(["decode", p1, dec, "48", "32"]) == 0
    finally:
        decoder_mod.decode_video = orig
    assert calls.get("positions"), "sidecar positions did not reach decode"
    got = _read(dec)
    assert got.shape[0] == 24
    # and identical to the plain counted decode of the same stream
    dec2 = str(tmp_path / "dec2.raw")
    assert cli.main(["decode", p0, dec2, "48", "32", "24"]) == 0
    np.testing.assert_array_equal(got, _read(dec2))


def test_sidecar_range_decode(tmp_path, clip_file):
    src, video = clip_file
    p1 = str(tmp_path / "p1.bin")
    assert cli.main(["encode", src, p1, "48", "32", "--parity",
                     "--index"]) == 0
    dec = str(tmp_path / "part.raw")
    assert cli.main(["decode", p1, dec, "48", "32", "--range",
                     "10:20"]) == 0
    full = str(tmp_path / "full.raw")
    assert cli.main(["decode", p1, full, "48", "32"]) == 0
    np.testing.assert_array_equal(_read(dec), _read(full)[10:20])


def test_stale_sidecar_falls_back_to_error_or_scan(tmp_path, clip_file):
    # A torn/garbage sidecar must not break a counted decode.
    src, video = clip_file
    p1 = str(tmp_path / "p1.bin")
    assert cli.main(["encode", src, p1, "48", "32", "--parity",
                     "--index"]) == 0
    with open(p1 + ".idx", "wb") as f:
        f.write(b"garbage sidecar")
    dec = str(tmp_path / "dec.raw")
    assert cli.main(["decode", p1, dec, "48", "32", "24"]) == 0
    assert _read(dec).shape[0] == 24
    # without a count, a garbage sidecar cannot supply one -> exit 2
    assert cli.main(["decode", p1, str(tmp_path / "x.raw"),
                     "48", "32"]) == 2


def test_stdout_encode_stays_raw(tmp_path, clip_file, monkeypatch, capsys):
    import io as _io
    import sys as _sys

    src, _ = clip_file
    buf = _io.BytesIO()

    class FakeOut:
        buffer = buf

        @staticmethod
        def flush():
            pass

    monkeypatch.setattr(_sys, "stdout", FakeOut)
    assert cli.main(["encode", src, "-", "48", "32"]) == 0
    assert buf.getvalue()[:4] != b"D3MH"


def test_turbo_default_unaffected(tmp_path, clip_file):
    # Turbo members are already self-delimiting; the index default must
    # not inject a raw index member into turbo containers.
    src, _ = clip_file
    enc = str(tmp_path / "t.d3t")
    assert cli.main(["encode", src, enc, "48", "32", "--turbo"]) == 0
    from dct3d_tpu.parallel.multihost import MEMBER_INDEX, split_members

    with open(enc, "rb") as f:
        members = split_members(f.read())
    assert all(m[2] != MEMBER_INDEX for m in members)


def test_sidecar_feeds_sharded_decode(tmp_path, clip_file):
    # Raw parity stream + .idx sidecar, decoded on a CPU test mesh with no
    # frame count: positions and count come from the sidecar, pixels match
    # the single-device decode byte-for-byte.
    src, _ = clip_file
    p1 = str(tmp_path / "p1.bin")
    assert cli.main(["encode", src, p1, "48", "32", "--parity",
                     "--index"]) == 0
    a = str(tmp_path / "mesh.raw")
    b = str(tmp_path / "single.raw")
    assert cli.main(["decode", p1, a, "48", "32", "--mesh", "1x2"]) == 0
    assert cli.main(["decode", p1, b, "48", "32"]) == 0
    np.testing.assert_array_equal(_read(a), _read(b))
