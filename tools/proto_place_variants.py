"""Prototype experiments for cheaper level-2 placement (run on real TPU).

Variants (all byte-checked against the shipped _place on the same inputs):

  base        shipped bitpack._place
  presel      premerge via one-hot select + roll (valid when every group is
              nonempty, which pack_values guarantees: 256 codewords x >=1
              bit) instead of the 64800-element boundary gather
  w16 / w32   overlapping window table of 16 / 32 words: halves / quarters
              the number of row gathers (cost per contiguous row is supposed
              to be ~1 element; check how it scales with row width)

Prints slope times; asserts exactness first on small CPU-style shapes.
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


def place_variant(buf_groups, gbits, gstart, total_bits, out_bytes, w_words,
                  row_words=8, presel=False):
    """_place with configurable window width and premerge strategy."""
    g_count = buf_groups.shape[0]
    sw = (gstart >> 5).astype(jnp.int32)
    gidx = jnp.arange(g_count, dtype=jnp.int32)

    if presel:
        # Every group nonempty -> predecessor is g-1; its boundary word is
        # its LAST occupied word, selected with a one-hot over w_words.
        endw = ((gstart & 31) + gbits - 1) >> 5  # last occupied local word
        endw = jnp.clip(endw, 0, w_words - 1)
        lastw = jnp.sum(
            jnp.where(endw[:, None] == jnp.arange(w_words)[None, :],
                      buf_groups, 0),
            axis=1, dtype=jnp.uint32,
        )
        # Predecessor's last word overlaps THIS group's word 0 only when the
        # predecessor's end word IS this group's start word.
        same_word = (sw - jnp.concatenate([sw[:1], sw[:-1]])
                     == jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                         endw[:-1]]))
        bnd = jnp.where(
            (gidx > 0) & same_word,
            jnp.concatenate([jnp.zeros((1,), jnp.uint32), lastw[:-1]]),
            0,
        )
        pre = buf_groups.at[:, 0].add(bnd)
    else:
        nonempty = jnp.where(gbits > 0, gidx, -1)
        last_ne = jax.lax.cummax(nonempty)
        prev_ne = jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                                   last_ne[:-1]])
        flat0 = buf_groups.reshape(-1)
        pc = jnp.clip(prev_ne, 0, g_count - 1)
        delta = sw - sw[pc]
        ok = (prev_ne >= 0) & (delta >= 0) & (delta < w_words)
        src = pc * w_words + jnp.clip(delta, 0, w_words - 1)
        pre = buf_groups.at[:, 0].add(jnp.where(ok, flat0[src], 0))

    RW = row_words
    flat = pre.reshape(-1)
    padf = jnp.concatenate([flat, jnp.zeros((RW,), jnp.uint32)])
    trw = jnp.stack([padf[k : k + flat.shape[0]] for k in range(RW)], axis=1)
    t_max = flat.shape[0] - 1

    nwords = (out_bytes + 3) // 4
    nrows = -(-nwords // RW)
    rows = jnp.arange(nrows, dtype=jnp.int32)
    w0_glob = rows * RW
    neg = jnp.int32(-(1 << 30))
    base_g = gidx * w_words - sw

    def smear(row_idx, vals, init):
        return jax.lax.cummax(
            jnp.full((nrows,), init, jnp.int32).at[row_idx].max(
                vals, mode="drop"
            )
        )

    base_a = smear((sw + RW - 1) // RW, base_g, neg)
    base_b = smear(sw // RW, base_g, neg)
    sw_b = smear(sw // RW, sw, 0)

    row_a = trw[jnp.clip(base_a + w0_glob, 0, t_max)]
    row_b = trw[jnp.clip(base_b + w0_glob, 0, t_max)]
    k = jnp.arange(RW, dtype=jnp.int32)[None, :]
    words = jnp.where(k >= (sw_b - w0_glob)[:, None], row_b, row_a)
    total_words = (total_bits + 31) >> 5
    words = jnp.where((w0_glob[:, None] + k) < total_words, words, 0)

    shifts = jnp.array([24, 16, 8, 0], jnp.uint32)
    buf = ((words.reshape(-1)[:nwords, None] >> shifts[None, :]) & 0xFF
           ).astype(jnp.uint8)
    return buf.reshape(-1)[:out_bytes]


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

    def mk(rw, presel):
        @jax.jit
        def fn(f):
            buf, gbits, gstart, tb = upto_l1(f)
            out = place_variant(buf, gbits, gstart, tb, out_bytes, w_words,
                                row_words=rw, presel=presel)
            return out[:1], out.sum(dtype=jnp.uint32), tb
        return fn

    @jax.jit
    def base(f):
        buf, gbits, gstart, tb = upto_l1(f)
        out = bitpack._place(buf, gbits, gstart, tb, out_bytes, w_words)
        return out[:1], out.sum(dtype=jnp.uint32), tb

    # exactness first (one execution each, compare checksums + full fetch)
    want = jax.device_get(base(fj)[1])
    variants = [("presel_w8", mk(8, True)), ("w16", mk(16, False)),
                ("presel_w16", mk(16, True)), ("presel_w32", mk(32, True))]
    for name, fn in variants:
        got = jax.device_get(fn(fj)[1])
        print(f"{name}: checksum match = {int(got) == int(want)}", flush=True)
        # w16/w32 may legitimately mismatch (a row can span >2 groups when
        # groups run near the 8-word minimum); their timings still answer
        # how row-gather cost scales with row width.  presel_w8 must match.
        if name == "presel_w8":
            assert int(got) == int(want), name

    s = train(base, fj)
    print(f"{'base':12s} {s*1e3:9.2f} ms", flush=True)
    for name, fn in variants:
        s = train(fn, fj)
        print(f"{name:12s} {s*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
