"""A/B: serial whole-stream inflate vs index-v2 parallel inflate.

The whole-stream zlib inflate was the last SERIAL host stage of the
decode path (the speculative/indexed entropy stage and the device step
are both parallel).  The parallel sink's per-GOP window resets + index
v2 sync offsets let entropy.parallel_inflate spread it across cores.

Host-only: builds a realistic 1080p-entropy-payload container through
the production ParallelDeflateSink and times both inflates.

Run: python tools/ab_parallel_inflate.py [n_gops]
"""

from __future__ import annotations

import sys
import time
import zlib

import numpy as np

sys.path.insert(0, "/root/repo")

from dct3d_tpu import oracle
from dct3d_tpu.codec import entropy
from dct3d_tpu.config import CodecConfig

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
    q = oracle.quantized_coefficients(frames, cfg)
    payload, nbits = entropy.encode_values(q.reshape(-1).astype(np.int32))
    gop_bytes = np.frombuffer(payload, np.uint8)

    sink = entropy.ParallelDeflateSink()
    out = []
    for g in range(n_gops):
        sink.gop_boundary()
        out.append(sink.push_packed(gop_bytes.copy(), nbits))
    out.append(sink.finish())
    syncs = sink.sync_offsets()
    sink.close()
    data = b"".join(out)
    print(f"{n_gops} GOPs, stream {len(data)/1e6:.1f} MB compressed, "
          f"{len(payload)*n_gops/1e6:.0f} MB payload", flush=True)

    want = zlib.decompress(data)
    got = entropy.parallel_inflate(data, syncs)
    assert got == want, "parallel inflate diverged!"
    print("identity: OK", flush=True)

    fpg = cfg.gop_size

    def best(f, reps=5):
        f()
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            f()
            b = min(b, time.perf_counter() - t0)
        return b

    ts = best(lambda: zlib.decompress(data))
    tp = best(lambda: entropy.parallel_inflate(data, syncs))
    print(f"serial inflate  : {ts*1e3:7.1f} ms "
          f"({n_gops*fpg/ts:7.1f} fps, {ts*1e3/n_gops:.2f} ms/GOP)")
    print(f"parallel inflate: {tp*1e3:7.1f} ms "
          f"({n_gops*fpg/tp:7.1f} fps, {tp*1e3/n_gops:.2f} ms/GOP)  "
          f"{ts/tp:.2f}x")


if __name__ == "__main__":
    main()
