"""Level-2 place variant: redirect the row_a gather to row 0 on rows with
no interior group boundary.

row_a (previous-owner window) is consumed by the final select ONLY on rows
where the owner changes mid-row (base_a != base_b) — ~sw%8!=0 group starts,
~1/3 of rows at 1080p/3-bit budget.  The tail-skip negative result showed
repeated same-row gathers are cache-hot and nearly free, so pointing the
other ~2/3 of row_a indices at row 0 should drop most of that gather's
~13 ns/row cost without changing a byte.

Run on the real TPU; slope-timed.
"""

from __future__ import annotations

import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.ops import bitpack, expgolomb, group_pack
from dct3d_tpu.utils import enable_compilation_cache

K2, K10 = 2, 12
GROUP = 256
N = 64800 * 256  # one 1080p GOP of values
W_WORDS = 34


def place_variant(buf_groups, gbits, gstart, total_bits, out_bytes: int,
                  w_words: int):
    """bitpack._place dense path + boundary-only row_a indices."""
    ROW_WORDS = bitpack.ROW_WORDS
    g_count = buf_groups.shape[0]
    sw = (gstart >> 5).astype(jnp.int32)
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
    base_g = gidx * w_words - sw

    def smear(row_idx, vals, init):
        return jax.lax.cummax(
            jnp.full((nrows,), init, jnp.int32).at[row_idx].set(
                vals, mode="drop", indices_are_sorted=True,
                unique_indices=True,
            )
        )

    base_a = smear((sw + ROW_WORDS - 1) // ROW_WORDS, base_g, neg)
    base_b = smear(sw // ROW_WORDS, base_g, neg)
    sw_b = smear(sw // ROW_WORDS, sw, 0)
    total_words = (total_bits + 31) >> 5

    # THE CHANGE: row_a only matters when the owner changes inside the row.
    idx_a = jnp.where(base_a != base_b,
                      jnp.clip(base_a + w0_glob, 0, t_max), 0)
    row_a = t8[idx_a]
    row_b = t8[jnp.clip(base_b + w0_glob, 0, t_max)]
    k = jnp.arange(ROW_WORDS, dtype=jnp.int32)[None, :]
    words = jnp.where(k >= (sw_b - w0_glob)[:, None], row_b, row_a)
    words = jnp.where((w0_glob[:, None] + k) < total_words, words, 0)

    shifts = jnp.array([24, 16, 8, 0], jnp.uint32)
    buf = ((words.reshape(-1)[:nwords, None] >> shifts[None, :]) & 0xFF).astype(
        jnp.uint8
    )
    return buf.reshape(-1)[:out_bytes]


def slope(fn, *args):
    out = fn(*args)
    jax.device_get(out[:1])
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K2):
            out = fn(*args)
        jax.device_get(out[:1])
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(K10):
            out = fn(*args)
        jax.device_get(out[:1])
        t10 = time.perf_counter() - t0
        slopes.append((t10 - t2) / (K10 - K2))
    return sorted(slopes)[1]


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(7)
    vals = (rng.standard_normal((N,)) * 1.2).astype(np.int32)
    vals[::256] = rng.integers(-4000, 4000, N // 256)
    values = jnp.asarray(vals)
    out_bytes = (N * 3) // 8  # the 3-bit/value stream budget

    wid8 = expgolomb.codewords(values)[1].astype(jnp.int8).reshape(-1, GROUP)
    gbits, gstart, total_bits, phase, sw, overflow = bitpack._geometry(
        wid8, jnp.int32(0), W_WORDS
    )
    buf_groups = group_pack.group_pack_values_pallas(
        values.reshape(-1, GROUP), phase, W_WORDS
    )
    args = (buf_groups, gbits, gstart, total_bits)
    assert not bool(overflow)

    base = jax.jit(lambda *a: bitpack._place(*a, out_bytes, W_WORDS,
                                             dense=True))
    var = jax.jit(lambda *a: place_variant(*a, out_bytes, W_WORDS))

    ref = base(*args)
    got = var(*args)
    ok = bool(jnp.all(ref == got))
    t_base = slope(base, *args)
    t_var = slope(var, *args)
    print(f"base     {t_base*1e3:7.2f} ms")
    print(f"boundary {t_var*1e3:7.2f} ms  exact={ok}")


if __name__ == "__main__":
    main()
