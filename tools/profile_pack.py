"""Micro-benchmarks for the encode hot-path rework (round 2).

Isolates the three costs the stage profile exposed (tools/profile_encode.py:
transform 27.6 ms, level-1 einsum +14.9 ms, level-2 assembly +60 ms at a
1080p GOP) and measures candidate replacements:

  * raw gather cost vs table size (is level-2 latency-bound on HBM?)
  * cube relayout variants (u8 transpose vs f32-first vs two-step)
  * pack level-1/2 with budget-capped per-group buffers (w_words from the
    pack budget instead of the 27-bit worst case)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.codec import framing
from dct3d_tpu.codec.transform import TransformContext, _PRECISION, _round_half_away
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.ops import bitpack, expgolomb
from dct3d_tpu.utils import enable_compilation_cache

REPS = 5


def timeit(fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


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

    # ---- 1. bare gather cost vs table size --------------------------------
    nw = 2 * 1024 * 1024
    for tbl_size in (15_000_000, 2_200_000, 500_000):
        table = jnp.asarray(rng.integers(0, 1 << 30, tbl_size, np.int64),
                            jnp.uint32)
        idx = jnp.asarray(rng.integers(0, tbl_size, nw), jnp.int32)

        @jax.jit
        def g(t, i):
            return t[i].sum()

        print(f"gather 2M from {tbl_size/1e6:5.1f}M words: "
              f"{timeit(g, table, idx)*1e3:7.2f} ms")

    # sorted (piecewise-contiguous) indices — locality effect
    idx_sorted = jnp.sort(idx)

    @jax.jit
    def gs(t, i):
        return t[i].sum()

    print(f"gather 2M sorted from 15M:      "
          f"{timeit(gs, table, idx_sorted)*1e3:7.2f} ms")

    # ---- 2. relayout variants ---------------------------------------------
    @jax.jit
    def relayout_u8(f):
        return framing.frames_to_cubes(f, cfg).sum(dtype=jnp.int32)

    @jax.jit
    def relayout_f32_first(f):
        g = f.astype(jnp.float32)
        x = g.reshape(1, T, H // 8, 8, W // 8, 8)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(-1, 512)
        return x.sum()

    @jax.jit
    def relayout_two_step(f):
        # P1: (t, by, dy, x) -> (by, t, dy, x): row-block copy, contiguous W
        x = f.reshape(T, H // 8, 8, W)
        x = x.transpose(1, 0, 2, 3)  # (135, 8, 8, 1920)
        # P2: (by, t*dy, bx, dx) -> (by, bx, t*dy, dx)
        x = x.reshape(H // 8, 64, W // 8, 8).transpose(0, 2, 1, 3)
        return x.reshape(-1, 512).sum(dtype=jnp.int32)

    @jax.jit
    def full_transform(f):
        cubes = framing.frames_to_cubes(f, cfg).astype(jnp.float32)
        scaled = jnp.dot(cubes, ctx.enc_t, precision=_PRECISION)
        q = _round_half_away(scaled, 0.5).astype(jnp.int32)
        return q.sum()

    pre = jnp.asarray(
        np.ascontiguousarray(
            frames.reshape(1, T, H // 8, 8, W // 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(-1, 512)
        )
    )

    @jax.jit
    def matmul_only(c):
        scaled = jnp.dot(c.astype(jnp.float32), ctx.enc_t, precision=_PRECISION)
        return _round_half_away(scaled, 0.5).astype(jnp.int32).sum()

    @jax.jit
    def matmul_default_prec(c):
        scaled = jnp.dot(c.astype(jnp.float32), ctx.enc_t)
        return _round_half_away(scaled, 0.5).astype(jnp.int32).sum()

    print(f"relayout u8 (current):          {timeit(relayout_u8, fj)*1e3:7.2f} ms")
    print(f"relayout f32-first:             {timeit(relayout_f32_first, fj)*1e3:7.2f} ms")
    print(f"relayout two-step:              {timeit(relayout_two_step, fj)*1e3:7.2f} ms")
    print(f"matmul+round only (HIGHEST):    {timeit(matmul_only, pre)*1e3:7.2f} ms")
    print(f"matmul+round only (default):    {timeit(matmul_default_prec, pre)*1e3:7.2f} ms")
    print(f"full transform (current):       {timeit(full_transform, fj)*1e3:7.2f} ms")

    # ---- 3. pack with budget-capped group buffers -------------------------
    q = np.asarray(
        jax.jit(lambda f: _round_half_away(
            jnp.dot(framing.frames_to_cubes(f, cfg).astype(jnp.float32),
                    ctx.enc_t, precision=_PRECISION), 0.5).astype(jnp.int32)
        )(fj)
    )
    code_np, width_np = expgolomb.codewords_np(q.reshape(-1))
    print(f"mean bits/value: {width_np.mean():.2f}  max width: {width_np.max()}")
    code_j = jnp.asarray(code_np.astype(np.uint32))
    width_j = jnp.asarray(width_np.astype(np.int32))
    mb = ctx.max_packed_bytes(n)

    def pack_capped(code, width, out_bytes, group, w_words):
        """pack_bits with explicit w_words cap + per-group overflow flag."""
        width = width.astype(jnp.int32)
        nn = width.shape[0]
        pad = (-nn) % group
        code32 = code.astype(jnp.uint32)
        if pad:
            code32 = jnp.concatenate([code32, jnp.zeros((pad,), jnp.uint32)])
            width = jnp.concatenate([width, jnp.zeros((pad,), jnp.int32)])
        g_count = (nn + pad) // group
        code32 = code32.reshape(g_count, group)
        wid = width.reshape(g_count, group)
        gbits = wid.sum(axis=1)
        overflow = jnp.any(gbits > 32 * (w_words - 2) - 30)
        gstart = jnp.cumsum(gbits) - gbits
        total_bits = gstart[-1] + gbits[-1]
        phase = (gstart & 31).astype(jnp.int32)
        loff = jnp.cumsum(wid, axis=1) - wid + phase[:, None]
        word0 = (loff >> 5).astype(jnp.int32)
        start_bit = (loff & 31).astype(jnp.int32)
        over = start_bit + wid - 32
        shr = jnp.clip(over, 0, 31).astype(jnp.uint32)
        shl = jnp.clip(-over, 0, 31).astype(jnp.uint32)
        c0 = jnp.where(over > 0, code32 >> shr, code32 << shl)
        c0 = jnp.where(wid > 0, c0, 0)
        c1 = jnp.where(over > 0, code32 << (32 - shr), 0)
        onehot = (
            word0[:, :, None]
            == jnp.arange(w_words, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.bfloat16)
        planes = jnp.stack(
            [
                (c0 >> 24) & 0xFF, (c0 >> 16) & 0xFF, (c0 >> 8) & 0xFF,
                c0 & 0xFF,
                (c1 >> 24) & 0xFF, (c1 >> 16) & 0xFF, (c1 >> 8) & 0xFF,
                c1 & 0xFF,
            ],
            axis=-1,
        ).astype(jnp.bfloat16)
        sums = jnp.einsum(
            "gcw,gcx->gwx", onehot, planes,
            preferred_element_type=jnp.float32,
        ).astype(jnp.uint32)
        w0 = (sums[..., 0] << 24) + (sums[..., 1] << 16) + (sums[..., 2] << 8) + sums[..., 3]
        w1 = (sums[..., 4] << 24) + (sums[..., 5] << 16) + (sums[..., 6] << 8) + sums[..., 7]
        buf_groups = w0 + jnp.concatenate(
            [jnp.zeros((g_count, 1), jnp.uint32), w1[:, :-1]], axis=1
        )
        table = jnp.concatenate(
            [jnp.zeros((1,), jnp.uint32), buf_groups.reshape(-1)]
        )
        t_max = g_count * w_words
        sw = (gstart >> 5).astype(jnp.int32)
        gidx = jnp.arange(g_count, dtype=jnp.int32)
        nonempty = jnp.where(gbits > 0, gidx, -1)
        last_ne = jax.lax.cummax(nonempty)
        prev_ne = jnp.concatenate([jnp.full((1,), -1, jnp.int32), last_ne[:-1]])
        neg = jnp.int32(-(1 << 30))

        def group_meta(g):
            gc = jnp.clip(g, 0, g_count - 1)
            ok = g >= 0
            base = jnp.where(ok, gc * w_words - sw[gc], neg)
            limit = jnp.where(ok, sw[gc] + w_words, 0)
            return base, limit

        metas = [
            group_meta(gidx),
            group_meta(prev_ne),
            group_meta(jnp.where(prev_ne >= 0,
                                 prev_ne[jnp.clip(prev_ne, 0, g_count - 1)],
                                 -1)),
        ]
        nwords = (out_bytes + 3) // 4
        wi = jnp.arange(nwords, dtype=jnp.int32)
        words = jnp.zeros((nwords,), jnp.uint32)
        for base_g, limit_g in metas:
            base = jax.lax.cummax(
                jnp.full((nwords,), neg, jnp.int32).at[sw].max(base_g, mode="drop")
            )
            limit = jax.lax.cummax(
                jnp.zeros((nwords,), jnp.int32).at[sw].max(limit_g, mode="drop")
            )
            vals = table[jnp.clip(base + wi + 1, 0, t_max)]
            words = words + jnp.where(wi < limit, vals, 0)
        shifts = jnp.array([24, 16, 8, 0], jnp.uint32)
        buf = ((words[:, None] >> shifts[None, :]) & 0xFF).astype(jnp.uint8)
        return buf.reshape(-1)[:out_bytes], total_bits, overflow

    from functools import partial

    @partial(jax.jit, static_argnames=("group", "w_words"))
    def packer(code, width, group, w_words):
        buf, tb, ov = pack_capped(code, width, mb, group, w_words)
        return buf[:1], buf.sum(dtype=jnp.int32), tb, ov

    # Reference output for correctness
    want, want_bits = bitpack.pack_bits_np(code_np, width_np, mb)

    for group, w_words in ((256, 34), (256, 50), (512, 66), (1024, 130),
                           (256, 218)):
        t = timeit(packer, code_j, width_j, group, w_words)
        buf, _, tb, ov = packer(code_j, width_j, group, w_words)
        ok = (not bool(ov)) and np.array_equal(np.asarray(buf)[0:1], want[0:1])
        full = np.asarray(
            jax.jit(lambda c, w: pack_capped(c, w, mb, group, w_words)[0],
                    static_argnames=())(code_j, width_j)
        )
        exact = np.array_equal(full, want) and int(tb) == want_bits
        print(f"pack g={group:4d} w_words={w_words:3d}: {t*1e3:7.2f} ms  "
              f"overflow={bool(ov)}  byte-exact={exact}")

    # current production pack for comparison
    @jax.jit
    def pack_now(code, width):
        buf, tb, tail, ovf = bitpack.pack_bits(
            code, width, mb, max_width=bitpack.max_codeword_bits(512)
        )
        return buf[:1], buf.sum(dtype=jnp.int32), tb

    print(f"pack production (w=218):        "
          f"{timeit(pack_now, code_j, width_j)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
