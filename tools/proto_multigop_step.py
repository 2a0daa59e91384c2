"""Prototype: K GOPs per encode/decode dispatch to amortize relay overhead.

Round-3 rejected multi-GOP dispatch when the cube repack was the XLA 6-axis
transpose (374-479 s compiles, no win — tools/profile_scan_gops.py).  The
Pallas relayout landed since and its grid already carries a `gops`
dimension (ops/relayout.frames_to_cubes_perm), so re-test: measure

  (a) single-GOP dispatch train (the production pipeline today),
  (b) in-program fori_loop slope (pure compute, no dispatch overhead),
  (c) a 2-GOP and 4-GOP unrolled step (one dispatch, per-GOP pack calls
      chained through the carry in-program, per-GOP outputs).

If (c) approaches (b) per GOP and compiles in sane time, productionize.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.codec.transform import TransformContext, encode_step, _encode_core
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.utils import enable_compilation_cache


def main():
    enable_compilation_cache()
    cfg = CodecConfig()
    ctx = TransformContext(cfg)
    rng = np.random.default_rng(0)
    T, H, W = cfg.gop_size, 1080, 1920
    # Bench-like content: smooth gradient + noise (same class as bench.py).
    y, x = np.mgrid[0:H, 0:W]
    base = ((x + y) // 8 % 256).astype(np.uint8)
    frames = (base[None] + rng.integers(0, 8, (T, H, W))).astype(np.uint8)
    fj = jnp.asarray(frames)
    mb = ctx.max_packed_bytes(fj.size)

    # (a) dispatch train --------------------------------------------------
    def train(steps):
        carry = (jnp.uint32(0), jnp.int32(0))
        g = None
        t0 = time.perf_counter()
        for _ in range(steps):
            g = encode_step(fj, ctx.enc_t, carry[0], carry[1],
                            max_bytes=mb, cfg=cfg)
            carry = (g.carry_code, g.carry_bits)
        int(g.total_bits)
        return time.perf_counter() - t0

    train(1)
    best = min((train(10) - train(2)) / 8 for _ in range(3))
    print(f"(a) dispatch train      {best*1e3:7.2f} ms/GOP")

    # (b) in-program loop -------------------------------------------------
    def mk(k):
        @jax.jit
        def f(frames):
            def body(i, carry):
                g = _encode_core(frames, ctx.enc_t, carry[0], carry[1],
                                 mb, cfg)
                # Force the packed buffer LIVE with a data-dependent
                # element, or XLA dead-codes the whole level-2 pack and
                # the slope reads ~1.1 ms/GOP (the bogus first version of
                # this probe — see PERFORMANCE.md round 4 / bench.py
                # compute_device_fps).
                live = g.packed[
                    (g.total_bits % jnp.int32(g.packed.shape[0]))
                ].astype(jnp.uint32)
                return (g.carry_code ^ live, g.carry_bits)

            c = jax.lax.fori_loop(
                0, k, body, (jnp.uint32(0), jnp.int32(0)))
            return c[0] + c[1].astype(jnp.uint32)

        return f

    def run(f):
        out = f(fj)
        jax.device_get(out)
        b = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_get(f(fj))
            b = min(b, time.perf_counter() - t0)
        return b

    t0 = time.perf_counter()
    f2, f10 = mk(2), mk(10)
    r2 = run(f2)
    print(f"    [in-program compile+run warm: {time.perf_counter()-t0:.0f} s]")
    r10 = run(f10)
    print(f"(b) in-program slope    {(r10-r2)/8*1e3:7.2f} ms/GOP")

    # (c) K-GOP unrolled step --------------------------------------------
    for K in (2, 4):
        @jax.jit
        def step_k(frames_k, code, bits):
            outs = []
            for g in range(K):
                r = _encode_core(frames_k[g], ctx.enc_t, code, bits, mb, cfg)
                code, bits = r.carry_code, r.carry_bits
                outs.append(r)
            return outs

        fk = jnp.broadcast_to(fj[None], (K, T, H, W)).copy()
        t0 = time.perf_counter()
        outs = step_k(fk, jnp.uint32(0), jnp.int32(0))
        jax.device_get(outs[-1].total_bits)
        print(f"    [K={K} compile+first: {time.perf_counter()-t0:.0f} s]")

        def traink(steps):
            code, bits = jnp.uint32(0), jnp.int32(0)
            o = None
            t0 = time.perf_counter()
            for _ in range(steps):
                o = step_k(fk, code, bits)
                code, bits = o[-1].carry_code, o[-1].carry_bits
            int(o[-1].total_bits)
            return time.perf_counter() - t0

        n = max(8 // K, 2)
        best = min((traink(n + 2) - traink(2)) / n / K for _ in range(3))
        print(f"(c) K={K} dispatch      {best*1e3:7.2f} ms/GOP")


if __name__ == "__main__":
    main()
