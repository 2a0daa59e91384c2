"""Level-2 place variant: ONE row gather per output row via an augmented
group table.

Shipped dense place gathers TWO 8-word windows per output row (row_a =
previous owner, row_b = owner of the row's last word) + a select — 2 x
~194K row gathers at 1080p.  proto_place_boundary showed gather cost is
per-ROW regardless of address locality, so the fix is FEWER rows:

Augment each group's w_words buffer with 7 leading words = the stream
words sw[g]-7..sw[g]-1 (the predecessor's tail, fetched by ONE 64.8K-row
gather from the premerged table).  Then the window for output row r
(global words 8r..8r+7) lives entirely inside the augmented row of the
owner g of word 8r+7, at local offset 7 + 8r - sw[g]:

  * words before sw[g] sit in the prepended tail (8r >= sw[g]-7 because
    no group starts in (sw[g], 8r+7]);
  * words at/after sw[g] sit in the group's own premerged words
    (7 + 8r+7 - sw[g] <= 7 + endw <= 40 < 41).

One gather (194K rows) + one small gather (64.8K) replaces two 194K
gathers + two of the three smears + the final select.

Run on the real TPU; slope-timed; byte-checked vs bitpack._place.
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
N = 64800 * 256
W_WORDS = 34


def place_aug(buf_groups, gbits, gstart, total_bits, out_bytes: int,
              w_words: int):
    ROW_WORDS = bitpack.ROW_WORDS
    g_count = buf_groups.shape[0]
    sw = (gstart >> 5).astype(jnp.int32)
    gidx = jnp.arange(g_count, dtype=jnp.int32)

    # Pre-merge (unchanged): predecessor's boundary word into word 0.
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

    # Predecessor tails: stream words sw[g]-7..sw[g]-1 live in g-1's row at
    # local index >= 1 (sw[g]-sw[g-1] >= 8), so one t8 row covers them.
    prev_sw = jnp.concatenate([sw[:1], sw[:-1]])
    tail_pos = (gidx - 1) * w_words + (sw - (ROW_WORDS - 1) - prev_sw)
    tails = t8[jnp.where(gidx > 0, jnp.clip(tail_pos, 0, t_max), 0)]
    aug = jnp.concatenate([tails[:, : ROW_WORDS - 1], pre], axis=1)
    aug_w = w_words + ROW_WORDS - 1

    flat_a = aug.reshape(-1)
    padfa = jnp.concatenate([flat_a, jnp.zeros((ROW_WORDS,), jnp.uint32)])
    t8a = jnp.stack(
        [padfa[k : k + flat_a.shape[0]] for k in range(ROW_WORDS)], axis=1
    )
    ta_max = flat_a.shape[0] - 1

    nwords = (out_bytes + 3) // 4
    nrows = -(-nwords // ROW_WORDS)
    rows = jnp.arange(nrows, dtype=jnp.int32)
    w0_glob = rows * ROW_WORDS
    neg = jnp.int32(-(1 << 30))
    # In augmented coords the owner's window base is g*aug_w + 7 - sw[g].
    base_ga = gidx * aug_w + (ROW_WORDS - 1) - sw

    def smear(row_idx, vals, init):
        return jax.lax.cummax(
            jnp.full((nrows,), init, jnp.int32).at[row_idx].set(
                vals, mode="drop", indices_are_sorted=True,
                unique_indices=True,
            )
        )

    base_b = smear(sw // ROW_WORDS, base_ga, neg)
    total_words = (total_bits + 31) >> 5

    words = t8a[jnp.clip(base_b + w0_glob, 0, ta_max)]
    k = jnp.arange(ROW_WORDS, dtype=jnp.int32)[None, :]
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
    out_bytes = (N * 3) // 8

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
    var = jax.jit(lambda *a: place_aug(*a, out_bytes, W_WORDS))

    ref = base(*args)
    got = var(*args)
    ok = bool(jnp.all(ref == got))
    if not ok:
        d = np.flatnonzero(np.asarray(ref) != np.asarray(got))
        print(f"MISMATCH at {d[:8]} of {d.size}")
    t_base = slope(base, *args)
    t_var = slope(var, *args)
    print(f"base {t_base*1e3:7.2f} ms")
    print(f"aug  {t_var*1e3:7.2f} ms  exact={ok}")

    # Carry-phase variant: nonzero lead bits shift everything.
    gbits2, gstart2, total2, phase2, sw2, _ = bitpack._geometry(
        wid8, jnp.int32(13), W_WORDS
    )
    bg2 = group_pack.group_pack_values_pallas(
        values.reshape(-1, GROUP), phase2, W_WORDS
    )
    ref2 = base(bg2, gbits2, gstart2, total2)
    got2 = var(bg2, gbits2, gstart2, total2)
    print(f"lead=13 exact={bool(jnp.all(ref2 == got2))}")


if __name__ == "__main__":
    main()
