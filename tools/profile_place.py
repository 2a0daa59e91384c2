"""Slope-timed breakdown of level-2 placement (_place) on the real TPU.

Cumulative prefixes, bench config (group budget 4, stream budget 3):

  l1        transform+widths+geometry+Pallas pack (baseline to subtract)
  premerge  + boundary gather + at[:,0].add
  t8        + overlapping 8-word window table build (sum to keep live)
  gather1   + row_a gather only
  place     + full placement (both gathers, selects, zeroing, byte split)
"""

from __future__ import annotations

import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.codec import framing
from dct3d_tpu.codec.transform import TransformContext, _PRECISION, _round_half_away
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.ops import bitpack, expgolomb, group_pack
from dct3d_tpu.ops.bitpack import ROW_WORDS
from dct3d_tpu.utils import enable_compilation_cache

W, H = 1920, 1080
K2, K10 = 2, 12


def train(fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K2):
            out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(K10):
            out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        t10 = time.perf_counter() - t0
        slopes.append((t10 - t2) / (K10 - K2))
    return sorted(slopes)[1]


def main():
    enable_compilation_cache()
    cfg = CodecConfig(pack_bits_per_value=4)
    ctx = TransformContext(cfg)
    rng = np.random.default_rng(1)
    frames = np.empty((cfg.gop_size, H, W), np.uint8)
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    for k in range(cfg.gop_size):
        frames[k] = ((x[None, :] + y + k) & 0xFF).astype(np.uint8)
    frames ^= rng.integers(0, 16, size=frames.shape, dtype=np.uint8)
    fj = jnp.asarray(frames)
    n = frames.size
    out_bytes = ctx.max_packed_bytes(n)
    mw = bitpack.max_codeword_bits(cfg.cube_size)
    w_words = min(bitpack.budget_w_words(256, cfg.pack_bits_per_value),
                  bitpack.worst_case_w_words(256, mw))
    print(f"w_words={w_words} out_bytes={out_bytes}", flush=True)

    def upto_l1(f):
        cubes = framing.frames_to_cubes(f, cfg).astype(ctx.enc_t.dtype)
        scaled = jnp.dot(cubes, ctx.enc_t, precision=_PRECISION)
        q = _round_half_away(scaled, cfg.quant_bias).astype(jnp.int32)
        v2 = q.reshape(-1, 256)
        wid8 = expgolomb.codewords(q.reshape(-1))[1].astype(jnp.int8).reshape(
            -1, 256
        )
        gbits, gstart, total_bits, phase, sw, overflow = bitpack._geometry(
            wid8, jnp.int32(3), w_words
        )
        buf = group_pack.group_pack_values_pallas(v2, phase, w_words)
        return buf, gbits.astype(jnp.int32), gstart, total_bits

    def premerge(buf_groups, gbits, gstart):
        g_count = buf_groups.shape[0]
        sw = (gstart >> 5).astype(jnp.int32)
        gidx = jnp.arange(g_count, dtype=jnp.int32)
        nonempty = jnp.where(gbits > 0, gidx, -1)
        last_ne = jax.lax.cummax(nonempty)
        prev_ne = jnp.concatenate([jnp.full((1,), -1, jnp.int32), last_ne[:-1]])
        flat0 = buf_groups.reshape(-1)
        pc = jnp.clip(prev_ne, 0, g_count - 1)
        delta = sw - sw[pc]
        ok = (prev_ne >= 0) & (delta >= 0) & (delta < w_words)
        src = pc * w_words + jnp.clip(delta, 0, w_words - 1)
        bnd = jnp.where(ok, flat0[src], 0)
        return buf_groups.at[:, 0].add(bnd), sw

    @jax.jit
    def stage_l1(f):
        buf, gbits, gstart, tb = upto_l1(f)
        return buf.sum(dtype=jnp.uint32) + tb.astype(jnp.uint32)

    @jax.jit
    def stage_premerge(f):
        buf, gbits, gstart, tb = upto_l1(f)
        pre, sw = premerge(buf, gbits, gstart)
        return pre.sum(dtype=jnp.uint32) + tb.astype(jnp.uint32)

    @jax.jit
    def stage_t8(f):
        buf, gbits, gstart, tb = upto_l1(f)
        pre, sw = premerge(buf, gbits, gstart)
        flat = pre.reshape(-1)
        padf = jnp.concatenate([flat, jnp.zeros((ROW_WORDS,), jnp.uint32)])
        t8 = jnp.stack(
            [padf[k : k + flat.shape[0]] for k in range(ROW_WORDS)], axis=1
        )
        return t8.sum(dtype=jnp.uint32) + tb.astype(jnp.uint32)

    @jax.jit
    def stage_gather1(f):
        buf, gbits, gstart, tb = upto_l1(f)
        pre, sw = premerge(buf, gbits, gstart)
        g_count = pre.shape[0]
        flat = pre.reshape(-1)
        padf = jnp.concatenate([flat, jnp.zeros((ROW_WORDS,), jnp.uint32)])
        t8 = jnp.stack(
            [padf[k : k + flat.shape[0]] for k in range(ROW_WORDS)], axis=1
        )
        t_max = flat.shape[0] - 1
        nwords = (out_bytes + 3) // 4
        nrows = -(-nwords // ROW_WORDS)
        rows = jnp.arange(nrows, dtype=jnp.int32)
        w0_glob = rows * ROW_WORDS
        neg = jnp.int32(-(1 << 30))
        gidx = jnp.arange(g_count, dtype=jnp.int32)
        base_g = gidx * w_words - sw

        def smear(row_idx, vals, init):
            return jax.lax.cummax(
                jnp.full((nrows,), init, jnp.int32).at[row_idx].max(
                    vals, mode="drop"
                )
            )

        base_a = smear((sw + ROW_WORDS - 1) // ROW_WORDS, base_g, neg)
        row_a = t8[jnp.clip(base_a + w0_glob, 0, t_max)]
        return row_a.sum(dtype=jnp.uint32) + tb.astype(jnp.uint32)

    @jax.jit
    def stage_place(f):
        buf, gbits, gstart, tb = upto_l1(f)
        out = bitpack._place(buf, gbits.astype(jnp.int32), gstart, tb,
                             out_bytes, w_words)
        return out[:1], tb

    prev = 0.0
    for name, fn in [("l1", stage_l1), ("premerge", stage_premerge),
                     ("t8", stage_t8), ("gather1", stage_gather1),
                     ("place", stage_place)]:
        s = train(fn, fj)
        print(f"{name:10s} {s*1e3:9.2f} ms  (+{(s-prev)*1e3:8.2f} ms)",
              flush=True)
        prev = s


if __name__ == "__main__":
    main()
