"""Slope-based device timing: the relay adds ~26-40 ms per dispatch+fetch
round trip, swamping per-op costs.  Each candidate op runs K times inside
ONE jitted program (fori_loop with a carried data dependency so XLA cannot
collapse iterations); cost = (t(K2) - t(K1)) / (K2 - K1).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.codec import framing
from dct3d_tpu.codec.transform import TransformContext, _PRECISION, _round_half_away
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.ops import bitpack, expgolomb
from dct3d_tpu.utils import enable_compilation_cache

REPS = 3
K1, K2 = 2, 10


def run_once(fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def slope(make_looped, *args):
    t1 = run_once(make_looped(K1), *args)
    t2 = run_once(make_looped(K2), *args)
    return (t2 - t1) / (K2 - K1)


def main():
    enable_compilation_cache()
    cfg = CodecConfig(pack_bits_per_value=4)
    ctx = TransformContext(cfg)
    rng = np.random.default_rng(1)
    T, H, W = 8, 1080, 1920
    frames = np.empty((T, H, W), np.uint8)
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    for k in range(T):
        frames[k] = ((x[None, :] + y + k) & 0xFF).astype(np.uint8)
    frames ^= rng.integers(0, 16, size=frames.shape, dtype=np.uint8)
    fj = jnp.asarray(frames)
    n = frames.size
    mb = ctx.max_packed_bytes(n)

    # -- transform ----------------------------------------------------------
    def mk_transform(k):
        @jax.jit
        def f(fr):
            def body(_, carry):
                c = framing.frames_to_cubes(fr ^ (carry & 1), cfg).astype(
                    jnp.float32
                )
                s = jnp.dot(c, ctx.enc_t, precision=_PRECISION)
                q = _round_half_away(s, 0.5).astype(jnp.int32)
                return q.sum().astype(jnp.uint8)

            return jax.lax.fori_loop(0, k, body, jnp.uint8(0))

        return f

    print(f"transform:        {slope(mk_transform, fj)*1e3:8.2f} ms")

    # -- codewords ----------------------------------------------------------
    q0 = jax.jit(
        lambda fr: _round_half_away(
            jnp.dot(framing.frames_to_cubes(fr, cfg).astype(jnp.float32),
                    ctx.enc_t, precision=_PRECISION), 0.5
        ).astype(jnp.int32)
    )(fj)

    def mk_codewords(k):
        @jax.jit
        def f(q):
            def body(_, carry):
                code, width = expgolomb.codewords(
                    (q + (carry & 1)).reshape(-1)
                )
                return (code.sum() + width.sum().astype(jnp.uint32)).astype(
                    jnp.int32
                )

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return f

    print(f"codewords:        {slope(mk_codewords, q0)*1e3:8.2f} ms")

    # -- full pack (production) --------------------------------------------
    code_np, width_np = expgolomb.codewords_np(np.asarray(q0).reshape(-1))
    code_j = jnp.asarray(code_np.astype(np.uint32))
    width_j = jnp.asarray(width_np.astype(np.int32))

    def mk_pack(k, max_width, w_words=None):
        @jax.jit
        def f(code, width):
            def body(_, carry):
                buf, tb, tail, ovf = bitpack.pack_bits(
                    code | (carry & 1), width, mb, max_width=max_width,
                    w_words=w_words,
                )
                return buf[0].astype(jnp.uint32) + tail

            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        return f

    print(f"pack (worst):     {slope(partial(mk_pack, max_width=27), code_j, width_j)*1e3:8.2f} ms")
    print(f"pack (budget 4):  {slope(partial(mk_pack, max_width=27, w_words=bitpack.budget_w_words(256, 4)), code_j, width_j)*1e3:8.2f} ms")

    # -- gather 2M ----------------------------------------------------------
    nw = 2 * 1024 * 1024
    table = jnp.asarray(rng.integers(0, 1 << 30, 15_000_000, np.int64),
                        jnp.uint32)
    idx = jnp.asarray(rng.integers(0, 15_000_000, nw), jnp.int32)

    def mk_gather(k):
        @jax.jit
        def f(t, i):
            def body(_, carry):
                return t[(i + carry) % 15_000_000].sum()

            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        return f

    print(f"gather 2M/15M:    {slope(mk_gather, table, idx)*1e3:8.2f} ms")

    # -- cummax + scatter over nwords (level-2 scaffolding) -----------------
    g_count = -(-n // 256)
    sw = jnp.asarray(np.sort(rng.integers(0, nw, g_count)).astype(np.int32))
    base_g = jnp.asarray(rng.integers(0, 1 << 20, g_count), jnp.int32)

    def mk_smear(k):
        @jax.jit
        def f(sw_, bg):
            def body(_, carry):
                a = jax.lax.cummax(
                    jnp.full((nw,), -(1 << 30), jnp.int32)
                    .at[sw_]
                    .max(bg + carry, mode="drop")
                )
                return a[-1]

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return f

    print(f"smear (scatter+cummax) 2M: {slope(mk_smear, sw, base_g)*1e3:8.2f} ms")

    # -- back-to-back encode_step (production pipelining) -------------------
    from dct3d_tpu.codec.transform import encode_step

    def chain(steps):
        carry = (jnp.uint32(0), jnp.int32(0))
        g = None
        t0 = time.perf_counter()
        for _ in range(steps):
            g = encode_step(fj, ctx.enc_t, carry[0], carry[1],
                            max_bytes=mb, cfg=cfg)
            carry = (g.carry_code, g.carry_bits)
        int(g.total_bits)
        return time.perf_counter() - t0

    chain(1)  # warm
    t1 = min(chain(2) for _ in range(REPS))
    t2 = min(chain(10) for _ in range(REPS))
    per = (t2 - t1) / 8
    print(f"encode_step back-to-back: {per*1e3:8.2f} ms/GOP "
          f"= {cfg.gop_size/per:7.1f} fps")


if __name__ == "__main__":
    main()
