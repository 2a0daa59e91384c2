"""A/B: GOP-parallel host entropy decode, serial-scan vs index positions.

Host-only (no device): builds a realistic 1080p entropy payload with the
native C encoder from oracle-quantized coefficients, then times
entropy.parallel_chunks with and without the seekable index (docs/FORMAT.md
index member).  The scan thread's ~1.5 ns/value walk is the scanning path's
throughput ceiling; the index removes it, so the stage scales with cores.

Run: python tools/ab_entropy_index.py [n_gops]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from dct3d_tpu import oracle
from dct3d_tpu.codec import entropy
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.ops import expgolomb

W, H = 1920, 1080


def main() -> None:
    n_gops = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = CodecConfig()
    rng = np.random.default_rng(1)
    frames = np.empty((cfg.gop_size, H, W), np.uint8)
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    for k in range(cfg.gop_size):
        frames[k] = ((x[None, :] + y + k) & 0xFF).astype(np.uint8)
    frames ^= rng.integers(0, 16, size=frames.shape, dtype=np.uint8)

    q = oracle.quantized_coefficients(frames, cfg)  # already zigzag order
    vals = q.reshape(-1).astype(np.int32)
    cpg = vals.size
    print(f"{n_gops} GOPs x {cpg} values "
          f"({vals.size * n_gops / 1e6:.1f} M total)")

    # Encode n_gops copies as ONE continuous bit stream; index from widths.
    _, wid = expgolomb.codewords_np(vals)
    gop_bits = int(wid.astype(np.int64).sum())
    payload, nbits = entropy.encode_values(np.tile(vals, n_gops))
    payload = np.frombuffer(bytes(payload), np.uint8)
    ends = [gop_bits * (g + 1) for g in range(n_gops)]
    assert nbits == ends[-1]
    positions = [0] + ends[:-1]

    frames_total = n_gops * cfg.gop_size

    def run(positions):
        t0 = time.perf_counter()
        n = 0
        for plane, ei, ev, _ in entropy.parallel_chunks(
            payload, cpg, n_gops, entropy.decode_values_planar4,
            positions=positions,
        ):
            n += 1
        dt = time.perf_counter() - t0
        return frames_total / dt

    for name, p in [("scan", None), ("index", positions)] * 3:
        print(f"{name:6s} {run(p):8.1f} fps", flush=True)


if __name__ == "__main__":
    main()
