"""Bisect the CURRENT encode step (pack_values fast path): cumulative
prefixes of the pipeline, slope timed, to localize the per-GOP milliseconds.

Run: PYTHONPATH=.:/root/.axon_site python tools/profile_pack_bisect.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.codec import framing
from dct3d_tpu.codec.transform import TransformContext, _PRECISION, _round_half_away
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.ops import bitpack, expgolomb, group_pack
from dct3d_tpu.utils import enable_compilation_cache

REPS = 3
K1, K2 = 2, 8
GROUP = 256


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
    cfg = CodecConfig(pack_bits_per_value=4, transport_delta=True)
    ctx = TransformContext(cfg)
    rng = np.random.default_rng(12345)
    T, H, W = 8, 1080, 1920
    frames = np.empty((T, H, W), np.uint8)
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    for k in range(T):
        frames[k] = ((x[None, :] + y + k) & 0xFF).astype(np.uint8)
    frames ^= rng.integers(0, 16, size=frames.shape, dtype=np.uint8)
    d = np.empty_like(frames)
    d[0] = frames[0]
    np.subtract(frames[1:], frames[:-1], out=d[1:])
    fj = jnp.asarray(d)
    n = frames.size
    mb = ctx.max_packed_bytes(n)
    w_words = bitpack.budget_w_words(GROUP, cfg.pack_bits_per_value)
    stages = [
        "delta", "relayout", "transform", "widgeom", "l1", "mini",
        "premerge", "t8", "smear", "gather", "bytes",
    ]

    def prefix(stage):
        def fn(fr, salt):
            fr = fr ^ (salt & 1)
            fr = jax.lax.associative_scan(jnp.add, fr, axis=0)
            if stage == "delta":
                return fr.sum(dtype=jnp.uint32)
            cubes_u8 = jax.lax.optimization_barrier(
                framing.frames_to_cubes(fr, cfg)
            )
            if stage == "relayout":
                return cubes_u8.sum(dtype=jnp.uint32)
            scaled = jnp.dot(cubes_u8.astype(jnp.float32), ctx.enc_t,
                             precision=_PRECISION)
            q = _round_half_away(scaled, 0.5).astype(jnp.int32)
            if stage == "transform":
                return q.sum().astype(jnp.uint32)
            values = q.reshape(-1)
            v2 = values.reshape(-1, GROUP)
            g_count = v2.shape[0]
            wid8 = expgolomb.codewords(values)[1].astype(jnp.int8).reshape(
                g_count, GROUP
            )
            gbits, gstart, total_bits, phase, sw, overflow = bitpack._geometry(
                wid8, jnp.int32(0), w_words
            )
            if stage == "widgeom":
                return total_bits.astype(jnp.uint32)
            buf_groups = group_pack.group_pack_values_pallas(v2, phase, w_words)
            if stage == "l1":
                return buf_groups[:, 0].sum(dtype=jnp.uint32) + total_bits.astype(jnp.uint32)
            g2 = 2
            code32m = expgolomb.codewords(v2[-g2:].reshape(-1))[0].reshape(g2, GROUP)
            tail_byte = bitpack._tail_byte(
                code32m, wid8[-g2:].astype(jnp.int32), gstart[-g2:], total_bits
            )
            if stage == "mini":
                return buf_groups[:, 0].sum(dtype=jnp.uint32) + tail_byte.astype(jnp.uint32)
            # -- _place internals (dense premerge) --
            gidx = jnp.arange(g_count, dtype=jnp.int32)
            endw = jnp.clip(((gstart & 31) + gbits - 1) >> 5, 0, w_words - 1)
            lastw = jnp.sum(
                jnp.where(
                    endw[:, None] == jnp.arange(w_words, dtype=jnp.int32)[None, :],
                    buf_groups, 0,
                ),
                axis=1, dtype=jnp.uint32,
            )
            same_word = (
                sw - jnp.concatenate([sw[:1], sw[:-1]])
                == jnp.concatenate([jnp.zeros((1,), jnp.int32), endw[:-1]])
            )
            bnd = jnp.where(
                (gidx > 0) & same_word,
                jnp.concatenate([jnp.zeros((1,), jnp.uint32), lastw[:-1]]),
                0,
            )
            pre = buf_groups.at[:, 0].add(bnd)
            if stage == "premerge":
                return pre[:, 0].sum(dtype=jnp.uint32) + tail_byte.astype(jnp.uint32)
            flat = pre.reshape(-1)
            padf = jnp.concatenate([flat, jnp.zeros((8,), jnp.uint32)])
            t8 = jnp.stack([padf[k: k + flat.shape[0]] for k in range(8)], axis=1)
            if stage == "t8":
                return t8[:, 0].sum(dtype=jnp.uint32) + tail_byte.astype(jnp.uint32)
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
                return (base_a.sum() + base_b.sum() + sw_b.sum()).astype(jnp.uint32) + t8[:, 0].sum(dtype=jnp.uint32)
            row_a = t8[jnp.clip(base_a + w0g, 0, t_max)]
            row_b = t8[jnp.clip(base_b + w0g, 0, t_max)]
            k2 = jnp.arange(8, dtype=jnp.int32)[None, :]
            words = jnp.where(k2 >= (sw_b - w0g)[:, None], row_b, row_a)
            total_words = (total_bits + 31) >> 5
            words = jnp.where((w0g[:, None] + k2) < total_words, words, 0)
            if stage == "gather":
                return words[:, 0].sum(dtype=jnp.uint32)
            shifts = jnp.array([24, 16, 8, 0], jnp.uint32)
            buf = ((words.reshape(-1)[:nwords, None] >> shifts[None, :]) & 0xFF
                   ).astype(jnp.uint8)
            return buf[::4096, 0].sum(dtype=jnp.uint32)

        def mk(k):
            @jax.jit
            def looped(fr):
                def body(i, carry):
                    return fn(fr, carry).astype(jnp.uint8)

                return jax.lax.fori_loop(0, k, body, jnp.uint8(0))

            return looped

        return mk

    prev = 0.0
    for stage in stages:
        t = slope(prefix(stage), fj)
        print(f"{stage:10s} cum {t*1e3:7.2f} ms   +{(t-prev)*1e3:6.2f} ms",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
