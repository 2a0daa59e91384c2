"""Bisect the encode step: cumulative prefixes of the pack pipeline, slope
timed, to find where the unaccounted ms live (parts 11 ms vs step 22 ms)."""

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
K1, K2 = 2, 8


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


def slope(make, *args):
    return (run_once(make(K2), *args) - run_once(make(K1), *args)) / (K2 - K1)


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
    group = 256
    w_words = bitpack.budget_w_words(group, 4)
    max_width = bitpack.max_codeword_bits(512)

    def prefix(stage):
        def fn(fr, salt):
            cubes = framing.frames_to_cubes(fr ^ (salt & 1), cfg).astype(
                jnp.float32
            )
            scaled = jnp.dot(cubes, ctx.enc_t, precision=_PRECISION)
            q = _round_half_away(scaled, 0.5).astype(jnp.int32)
            code, width = expgolomb.codewords(q.reshape(-1))
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
            gstart = jnp.cumsum(gbits) - gbits
            total_bits = gstart[-1] + gbits[-1]
            phase = (gstart & 31).astype(jnp.int32)
            sw = (gstart >> 5).astype(jnp.int32)
            if stage == "geom":
                return total_bits.astype(jnp.uint32)
            buf_groups = bitpack._group_pack(code32, wid, phase, w_words)
            if stage == "l1":
                return buf_groups.sum(dtype=jnp.uint32)
            g2 = min(2, g_count)
            mstart = gstart[g_count - g2]
            mbuf = bitpack._group_pack(
                code32[g_count - g2:].reshape(1, -1),
                wid[g_count - g2:].reshape(1, -1),
                (mstart & 31)[None], g2 * group + 2,
            )[0]
            if stage == "mini":
                return buf_groups.sum(dtype=jnp.uint32) + mbuf.sum(dtype=jnp.uint32)
            gidx = jnp.arange(g_count, dtype=jnp.int32)
            nonempty = jnp.where(gbits > 0, gidx, -1)
            last_ne = jax.lax.cummax(nonempty)
            prev_ne = jnp.concatenate([jnp.full((1,), -1, jnp.int32), last_ne[:-1]])
            flat0 = buf_groups.reshape(-1)

            def boundary_from(p):
                pc = jnp.clip(p, 0, g_count - 1)
                delta = sw - sw[pc]
                ok = (p >= 0) & (delta >= 0) & (delta < w_words)
                src = pc * w_words + jnp.clip(delta, 0, w_words - 1)
                return jnp.where(ok, flat0[src], 0)

            p2 = jnp.where(prev_ne >= 0, prev_ne[jnp.clip(prev_ne, 0, g_count - 1)], -1)
            pre = buf_groups.at[:, 0].add(boundary_from(prev_ne) + boundary_from(p2))
            if stage == "premerge":
                return pre.sum(dtype=jnp.uint32) + mbuf.sum(dtype=jnp.uint32)
            flat = pre.reshape(-1)
            padf = jnp.concatenate([flat, jnp.zeros((8,), jnp.uint32)])
            t8 = jnp.stack([padf[k: k + flat.shape[0]] for k in range(8)], axis=1)
            if stage == "t8":
                return t8.sum(dtype=jnp.uint32) + mbuf.sum(dtype=jnp.uint32)
            t_max = flat.shape[0] - 1
            nwords = (mb + 3) // 4
            nrows = -(-nwords // 8)
            rows = jnp.arange(nrows, dtype=jnp.int32)
            w0g = rows * 8
            neg = jnp.int32(-(1 << 30))
            base_g = gidx * w_words - sw

            def smear(ri, vals, init):
                return jax.lax.cummax(
                    jnp.full((nrows,), init, jnp.int32).at[ri].max(vals, mode="drop")
                )

            base_a = smear((sw + 7) // 8, base_g, neg)
            base_b = smear(sw // 8, base_g, neg)
            sw_b = smear(sw // 8, sw, 0)
            if stage == "smear":
                return (base_a.sum() + base_b.sum() + sw_b.sum()).astype(jnp.uint32) + pre.sum(dtype=jnp.uint32)
            row_a = t8[jnp.clip(base_a + w0g, 0, t_max)]
            row_b = t8[jnp.clip(base_b + w0g, 0, t_max)]
            k2 = jnp.arange(8, dtype=jnp.int32)[None, :]
            words = jnp.where(k2 >= (sw_b - w0g)[:, None], row_b, row_a)
            total_words = (total_bits + 31) >> 5
            words = jnp.where((w0g[:, None] + k2) < total_words, words, 0)
            if stage == "gather":
                return words.sum(dtype=jnp.uint32)
            shifts = jnp.array([24, 16, 8, 0], jnp.uint32)
            buf = ((words.reshape(-1)[:nwords, None] >> shifts[None, :]) & 0xFF).astype(jnp.uint8)
            return buf.reshape(-1)[:mb].astype(jnp.uint32).sum()

        return fn

    for stage in ("geom", "l1", "mini", "premerge", "t8", "smear", "gather",
                  "full"):
        def mk(k, stage=stage):
            body_fn = prefix(stage)

            @jax.jit
            def f(fr):
                def body(i, carry):
                    out = body_fn(fr, carry)
                    leaf = jax.tree.leaves(out)[0]
                    return leaf.reshape(-1)[0].astype(jnp.uint32)

                return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

            return f

        print(f"{stage:9s} {slope(mk, fj)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
