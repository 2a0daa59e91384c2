"""Fused speculative decode (entropy.speculative_planar4_chunks).

The plain-stream (headerless) decode path: byte-aligned segments are
speculatively DECODED in parallel, validated by the position handshake,
and chunk planes assembled with nibble-granular copies.  These tests pin
byte-identity against the serial planar4 decoder — including the end bit
positions — on content that exercises every internal route:

  * in-nibble values (the fast eg_win4 walk + zero-copy chunk views),
  * wide codewords (every value an exception; handshake misses on
    never-converging walks -> the serial catch-up decode),
  * long zero-bit runs (the scalar slow path),
  * truncation (fused must refuse; the serial path owns EOF semantics).

_SPEC_MIN_SEG is patched down so suite-sized payloads engage the path
(production engages at >= 256 KiB payloads).
"""

from __future__ import annotations

import numpy as np
import pytest

from dct3d_tpu import native
from dct3d_tpu.codec import entropy


pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native library unavailable"
)


@pytest.fixture(autouse=True)
def _small_segments(monkeypatch):
    monkeypatch.setattr(entropy, "_SPEC_MIN_SEG", 4096)


def _serial(buf, n_chunks, V):
    out, pos = [], 0
    for _ in range(n_chunks):
        plane, ei, ev, pos = entropy.decode_values_planar4(buf, V, pos)
        out.append((plane.copy(), ei.copy(), ev.copy(), pos))
    return out


def _assert_matches(fused, ref):
    fused = list(fused)
    assert len(fused) == len(ref)
    for k, ((p, ei, ev, e), (rp, rei, rev, re_)) in enumerate(
        zip(fused, ref)
    ):
        np.testing.assert_array_equal(p, rp, err_msg=f"chunk {k} plane")
        np.testing.assert_array_equal(ei, rei, err_msg=f"chunk {k} exc_idx")
        np.testing.assert_array_equal(ev, rev, err_msg=f"chunk {k} exc_val")
        assert e == re_, f"chunk {k} end bit {e} != {re_}"


def _stream(vals):
    payload, _ = entropy.encode_values(np.asarray(vals, np.int32))
    # the reference's final extra byte
    return np.frombuffer(payload + b"\x00", np.uint8)


CASES = {
    "mixed": lambda rng, n: np.where(
        rng.random(n) < 0.01,
        rng.integers(-30000, 30000, n),
        rng.integers(-3, 4, n),
    ).astype(np.int32),
    "all_wide": lambda rng, n: (
        rng.integers(500, 2000, n) * rng.choice([-1, 1], n)
    ).astype(np.int32),
    "very_wide": lambda rng, n: rng.integers(10**6, 2 * 10**6, n).astype(
        np.int32
    ),
    "all_zero": lambda rng, n: np.zeros(n, np.int32),
    "zero_run_bursts": lambda rng, n: _bursts(rng, n),
}


def _bursts(rng, n):
    v = rng.integers(-2, 3, n).astype(np.int32)
    for s in range(0, n, n // 7):
        v[s : s + 48] = 2**24  # ~25 leading zero bits per codeword
    return v


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("n_chunks,V", [(5, 30000), (3, 40002)])
def test_fused_matches_serial(name, n_chunks, V):
    rng = np.random.default_rng(hash(name) % 2**32)
    buf = _stream(CASES[name](rng, n_chunks * V))
    fused = entropy.speculative_planar4_chunks(buf, V, n_chunks, workers=4)
    if fused is None:
        pytest.skip("payload below the (patched) segment minimum")
    _assert_matches(fused, _serial(buf, n_chunks, V))


def test_fused_long_stream_views():
    # Many chunks against few segments: most chunks resolve as zero-copy
    # views of the segment planes; identity must hold regardless.
    rng = np.random.default_rng(21)
    n_chunks, V = 40, 5000
    v = rng.integers(-4, 5, n_chunks * V).astype(np.int32)
    p = rng.choice(v.size, v.size // 300, replace=False)
    v[p] = rng.integers(-5000, 5000, p.size)
    buf = _stream(v)
    fused = entropy.speculative_planar4_chunks(buf, V, n_chunks, workers=4)
    assert fused is not None
    _assert_matches(fused, _serial(buf, n_chunks, V))


def test_fused_refuses_truncated_stream():
    rng = np.random.default_rng(3)
    v = rng.integers(-3, 4, 200000).astype(np.int32)
    buf = _stream(v)[:-500]
    assert entropy.speculative_planar4_chunks(buf, 50000, 4, workers=4) \
        is None
    with pytest.raises(EOFError):
        _serial(buf, 4, 50000)


def test_fused_ignores_stream_tail():
    # Decoding fewer chunks than the stream holds must not read past them.
    rng = np.random.default_rng(4)
    v = rng.integers(-3, 4, 250000).astype(np.int32)
    buf = _stream(v)
    fused = entropy.speculative_planar4_chunks(buf, 50000, 3, workers=4)
    assert fused is not None
    _assert_matches(fused, _serial(buf, 3, 50000))


def test_parallel_chunks_routes_through_fused(monkeypatch):
    # The integration point: positions=None + planar4 -> the fused path.
    rng = np.random.default_rng(5)
    n_chunks, V = 4, 60000
    v = rng.integers(-5, 6, n_chunks * V).astype(np.int32)
    buf = _stream(v)
    called = {}
    orig = entropy.speculative_planar4_chunks

    def spy(*a, **k):
        r = orig(*a, **k)
        called["fused"] = r is not None
        return r

    monkeypatch.setattr(entropy, "speculative_planar4_chunks", spy)
    got = list(entropy.parallel_chunks(
        buf, V, n_chunks, entropy.decode_values_planar4
    ))
    assert called.get("fused"), "fused path did not engage"
    _assert_matches(got, _serial(buf, n_chunks, V))


def test_nibble_copy_all_offsets():
    lib = native.load()
    rng = np.random.default_rng(9)
    src = rng.integers(0, 256, 4096, dtype=np.uint8)
    src_n = np.empty(src.size * 2, np.uint8)  # src as nibble list
    src_n[0::2] = src & 0xF
    src_n[1::2] = src >> 4
    for d0, s0, count in [
        (0, 0, 100), (1, 0, 99), (0, 1, 99), (1, 1, 98), (3, 8, 1),
        (2, 5, 0), (7, 2, 513), (100, 771, 2048), (1, 2, 4095),
    ]:
        dst = rng.integers(0, 256, 2100, dtype=np.uint8)
        want = np.empty(dst.size * 2, np.uint8)
        want[0::2] = dst & 0xF
        want[1::2] = dst >> 4
        want[d0 : d0 + count] = src_n[s0 : s0 + count]
        lib.nibble_copy(dst.ctypes.data, d0, src.ctypes.data, s0, count)
        got = np.empty(dst.size * 2, np.uint8)
        got[0::2] = dst & 0xF
        got[1::2] = dst >> 4
        np.testing.assert_array_equal(
            got, want, err_msg=f"d0={d0} s0={s0} count={count}"
        )


@pytest.mark.parametrize("seed", range(12))
def test_fused_randomized_stress(seed):
    """Randomized content mixes / chunk geometries, seeded: value spread,
    wide-value fraction, zero-run bursts and chunk counts all drawn per
    seed — every case must match the serial decoder byte-for-byte."""
    rng = np.random.default_rng(1000 + seed)
    n_chunks = int(rng.integers(2, 9))
    V = int(rng.integers(10000, 60000)) * 2
    n = n_chunks * V
    spread = int(rng.integers(1, 9))
    v = rng.integers(-spread, spread + 1, n).astype(np.int32)
    wide_frac = float(rng.choice([0.0, 0.001, 0.01, 0.2]))
    if wide_frac:
        p = rng.choice(n, max(1, int(n * wide_frac)), replace=False)
        v[p] = rng.integers(-50000, 50000, p.size)
    if rng.random() < 0.5:  # zero-run bursts
        for s in range(0, n, max(1, n // int(rng.integers(3, 9)))):
            v[s : s + int(rng.integers(8, 80))] = int(
                rng.integers(2**16, 2**25)
            )
    buf = _stream(v)
    fused = entropy.speculative_planar4_chunks(
        buf, V, n_chunks, workers=int(rng.integers(2, 5))
    )
    if fused is None:
        pytest.skip("payload below the (patched) segment minimum")
    _assert_matches(fused, _serial(buf, n_chunks, V))
