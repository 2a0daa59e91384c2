"""Prototype: K GOPs per DECODE dispatch.

The encode side measured NEGATIVE (tools/proto_multigop_step.py: launch
issue hides under the 7 ms step; K-GOP dispatch slightly worse).  Decode
steps are ~1.8 ms — shorter than the ~1 ms relay launch cost the train
shows (2.77 ms/GOP dispatch train vs 1.7-2.0 in-program,
tools/profile_decode_stages.py) — so batching K decode bodies into one
dispatch may genuinely amortize it here.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.codec.transform import (
    TransformContext, decode_step_planar4, planar4_to_frames,
)
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.utils import enable_compilation_cache


def main():
    enable_compilation_cache()
    cfg = CodecConfig()
    ctx = TransformContext(cfg)
    rng = np.random.default_rng(0)
    T, H, W = cfg.gop_size, 1080, 1920
    n = T * H * W
    n_exc = n // cfg.cube_size + 8192

    def gop_inputs(seed):
        r = np.random.default_rng(seed)
        plane = r.integers(0, 256, n // 2, dtype=np.uint16).astype(np.uint8)
        ei = np.sort(r.choice(n, n_exc, replace=False)).astype(np.int32)
        ev = r.integers(-2000, 2000, n_exc).astype(np.int32)
        return jnp.asarray(plane), jnp.asarray(ei), jnp.asarray(ev)

    inputs = [gop_inputs(s) for s in range(4)]

    # (a) dispatch train (bench methodology)
    def train(steps):
        fd = None
        t0 = time.perf_counter()
        for i in range(steps):
            p, ei, ev = inputs[i % 4]
            fd = decode_step_planar4(p, ei, ev, ctx.dec_me, ctx.dec_mo,
                                     cfg=cfg, height=H, width=W)
        jax.device_get(fd[0, 0, 0])
        return time.perf_counter() - t0

    train(1)
    best = min((train(10) - train(2)) / 8 for _ in range(3))
    print(f"(a) dispatch train      {best*1e3:7.2f} ms/GOP")

    # (c) K-GOP batched dispatch
    for K in (2, 4):
        @jax.jit
        def step_k(ins):
            return [
                planar4_to_frames(p, ei, ev, ctx.dec_me, ctx.dec_mo,
                                  cfg=cfg, height=H, width=W)
                for p, ei, ev in ins
            ]

        t0 = time.perf_counter()
        outs = step_k(inputs[:K])
        jax.device_get(outs[-1][0, 0, 0])
        print(f"    [K={K} compile+first: {time.perf_counter()-t0:.0f} s]")

        def traink(steps):
            o = None
            t0 = time.perf_counter()
            for _ in range(steps):
                o = step_k(inputs[:K])
            jax.device_get(o[-1][0, 0, 0])
            return time.perf_counter() - t0

        m = max(8 // K, 2)
        best = min((traink(m + 2) - traink(2)) / m / K for _ in range(3))
        print(f"(c) K={K} dispatch      {best*1e3:7.2f} ms/GOP")


if __name__ == "__main__":
    main()
