"""Single-core host entropy micro-profile: ns/value for each native path.

Host-only.  Builds one 1080p GOP's realistic entropy payload (oracle
quantize + native encode) and times eg_scan / eg_decode_planar4 /
eg_decode_planar / eg_decode on ONE core, best-of-N.  These per-core rates
bound the GOP-parallel stage (codec/entropy.parallel_chunks): the plain
path's ceiling is the serial scan, the indexed path's is decode/cores.

Run: python tools/profile_entropy_host.py [reps]
"""

from __future__ import annotations

import ctypes
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from dct3d_tpu import native, oracle
from dct3d_tpu.codec import entropy
from dct3d_tpu.config import CodecConfig

W, H = 1920, 1080


def build_payload(noise: int = 16):
    cfg = CodecConfig()
    rng = np.random.default_rng(1)
    frames = np.empty((cfg.gop_size, H, W), np.uint8)
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    for k in range(cfg.gop_size):
        frames[k] = ((x[None, :] + y + k) & 0xFF).astype(np.uint8)
    if noise:
        frames ^= rng.integers(0, noise, size=frames.shape, dtype=np.uint8)
    q = oracle.quantized_coefficients(frames, cfg)
    vals = q.reshape(-1).astype(np.int32)
    payload, nbits = entropy.encode_values(vals)
    return np.frombuffer(bytes(payload), np.uint8), nbits, vals


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    lib = native.load()
    assert lib is not None
    payload, nbits, vals = build_payload()
    n = vals.size
    print(f"payload {payload.size/1e6:.1f} MB, {n/1e6:.1f} M values, "
          f"{nbits/n:.2f} bits/value")

    def best(fn):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            b = min(b, time.perf_counter() - t0)
        return b

    t = best(lambda: lib.eg_scan(payload.ctypes.data, nbits, 0, n))
    print(f"eg_scan           {t*1e3:8.2f} ms/GOP  {t/n*1e9:6.3f} ns/value "
          f"({8/t:6.0f} fps ceiling)")

    t = best(lambda: entropy.decode_values_planar4(payload, n))
    print(f"decode_planar4    {t*1e3:8.2f} ms/GOP  {t/n*1e9:6.3f} ns/value "
          f"({8/t:6.0f} fps/core)")

    t = best(lambda: entropy.decode_values_planar(payload, n))
    print(f"decode_planar     {t*1e3:8.2f} ms/GOP  {t/n*1e9:6.3f} ns/value")

    out = np.empty(n, np.int32)

    def dec():
        pos = ctypes.c_uint64(0)
        lib.eg_decode(payload.ctypes.data, nbits, ctypes.byref(pos),
                      out.ctypes.data, n)

    t = best(dec)
    print(f"eg_decode (int32) {t*1e3:8.2f} ms/GOP  {t/n*1e9:6.3f} ns/value")

    # Interleaved multi-stream decode (S independent spans per call): the
    # table walk is latency-bound, so S overlapped chains should approach
    # S-fold per-core throughput until uop issue saturates.
    for S in (2, 4, 8):
        m = n // S
        if m % 2:
            m -= 1
        bounds = [0]
        for _ in range(S - 1):
            bounds.append(lib.eg_scan(payload.ctypes.data, nbits,
                                      bounds[-1], m))
        planes = np.empty(S * (m // 2), np.uint8)
        cap = max(1024, m // 16)
        ei = np.empty(S * cap, np.int32)
        ev = np.empty(S * cap, np.int32)
        cnts = np.empty(S, np.uint64)

        def multi():
            p = np.array(bounds, np.uint64)
            rc = lib.eg_decode_planar4_multi(
                payload.ctypes.data, nbits, p.ctypes.data, S, m,
                planes.ctypes.data, ei.ctypes.data, ev.ctypes.data, cap,
                cnts.ctypes.data,
            )
            assert rc == 0, rc
            return p

        t = best(multi)
        nm = S * m
        print(f"multi x{S}          {t*1e3:8.2f} ms/{nm/1e6:.1f}M "
              f"{t/nm*1e9:6.3f} ns/value")
        # correctness: stitch and compare against the single-stream decode
        p = multi()
        ref_plane, ref_i, ref_v, ref_pos = entropy.decode_values_planar4(
            payload, nm)
        assert np.array_equal(planes.reshape(S, -1).reshape(-1),
                              ref_plane[: nm // 2]), f"multi x{S} plane"
        got_i = np.concatenate(
            [ei[k * cap : k * cap + int(cnts[k])] + k * m for k in range(S)])
        got_v = np.concatenate(
            [ev[k * cap : k * cap + int(cnts[k])] for k in range(S)])
        sel = ref_i < nm
        assert np.array_equal(got_i, ref_i[sel]), f"multi x{S} exc idx"
        assert np.array_equal(got_v, ref_v[sel]), f"multi x{S} exc val"
        assert int(p[-1]) == (ref_pos if nm == n else
                              lib.eg_scan(payload.ctypes.data, nbits, 0, nm))

    # Correctness spot check
    plane, ei, ev, pos = entropy.decode_values_planar4(payload, n)
    got = ((np.repeat(plane, 2).reshape(-1, 2)
            >> np.array([0, 4], np.uint8)) & 0xF).reshape(-1)
    got = ((got.astype(np.int32) ^ 8) - 8)
    got[ei] = ev
    assert pos == nbits, (pos, nbits)
    assert np.array_equal(got, vals), "planar4 mismatch"
    print("correctness OK")


if __name__ == "__main__":
    main()
