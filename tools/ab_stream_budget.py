"""A/B: whole-stream pack buffer budget 2 vs 3 bits/value (level-2 rows).

Level-2 placement cost scales with the static stream buffer (two row
gathers over nwords/8 rows), so a tighter budget is a direct win as long
as the content fits (bench clip: 1.236 bits/value; typical video 1-1.3;
overflow retries with the worst-case shape exactly like today).

One process, real TPU: byte parity vs the float64 oracle at both budgets,
then interleaved slope timing (K back-to-back dispatches with the carry
chained on device, one tiny fetch).
"""

from __future__ import annotations

import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu import oracle
from dct3d_tpu.codec.encoder import encode_video
from dct3d_tpu.codec.transform import TransformContext, encode_step
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.utils import enable_compilation_cache

W, H, K2, K10 = 1920, 1080, 2, 12


def clip(t):
    rng = np.random.default_rng(12345)
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    frames = np.empty((t, H, W), np.uint8)
    for k in range(t):
        frames[k] = ((x[None, :] + y + k) & 0xFF).astype(np.uint8)
    return frames ^ rng.integers(0, 16, size=frames.shape, dtype=np.uint8)


def main() -> None:
    enable_compilation_cache()
    frames = clip(8)
    ref = oracle.encode(frames, CodecConfig())

    setups = {}
    for budget in (3, 2):
        cfg = CodecConfig(stream_bits_per_value=budget)
        ctx = TransformContext(cfg)
        data = encode_video(frames, cfg, ctx)
        assert data == ref, f"budget {budget}: bitstream diverged from oracle"
        fj = jnp.asarray(frames)
        mb = ctx.max_packed_bytes(fj.size)
        g = encode_step(fj, ctx.enc_t, jnp.uint32(0), jnp.int32(0),
                        max_bytes=mb, cfg=cfg)
        assert not bool(g.overflow), f"budget {budget}: overflow"
        setups[budget] = (cfg, ctx, fj, mb)
        print(f"budget {budget}: parity OK, buffer {mb/1e6:.2f} MB",
              flush=True)

    def chain(budget, steps):
        cfg, ctx, fj, mb = setups[budget]
        carry = (jnp.uint32(0), jnp.int32(0))
        g = None
        t0 = time.perf_counter()
        for _ in range(steps):
            g = encode_step(fj, ctx.enc_t, carry[0], carry[1],
                            max_bytes=mb, cfg=cfg)
            carry = (g.carry_code, g.carry_bits)
        int(g.total_bits)
        return time.perf_counter() - t0

    for b in (3, 2):
        chain(b, 1)  # remote program load
    for _ in range(3):
        for b in (3, 2):
            dt = (chain(b, K10) - chain(b, K2)) / (K10 - K2)
            print(f"budget {b}: {dt*1e3:6.2f} ms/GOP  {8/dt:7.1f} fps",
                  flush=True)


if __name__ == "__main__":
    main()
