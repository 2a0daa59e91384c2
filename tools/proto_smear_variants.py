"""Smear-stage variants for level-2 place: the 3 scatter+cummax smears cost
~1.7 ms/GOP (the ~65K-element scatters are the near-serial part; the cummax
is cheap).  Candidates:

  cur3   three separate 1-wide scatter-max + cummax (production)
  two2   ONE 2-wide-row scatter-max (base_g, sw at row sw//8) + one 1-wide
         (base_g at row (sw+7)//8), cummax over stacked columns
  one3   ONE 3-wide-row scatter: (base_g@sw//8, sw@sw//8) and base_a's
         scatter folded by scattering base_g ALSO at (sw+7)//8 via a second
         scatter -- kept for reference, same as two2 but single cummax call
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

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


def slope(make, *args):
    return (run_once(make(K2), *args) - run_once(make(K1), *args)) / (K2 - K1)


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(7)
    g_count = 64800
    w_words = 34
    nrows = 194_400
    neg = jnp.int32(-(1 << 30))
    # realistic monotone group start words: ~1.2 bits/value => ~9.6 words/group
    gaps = rng.integers(8, 12, g_count)
    sw_np = np.concatenate([[0], np.cumsum(gaps)[:-1]]).astype(np.int32)
    sw = jnp.asarray(sw_np)
    gidx = jnp.arange(g_count, dtype=jnp.int32)
    base_g = gidx * w_words - sw

    def mk_cur3(k):
        @jax.jit
        def f(sw, base_g):
            def body(_, carry):
                def smear(ri, vals, init):
                    return jax.lax.cummax(
                        jnp.full((nrows,), init, jnp.int32)
                        .at[ri].max(vals + carry, mode="drop")
                    )

                base_a = smear((sw + 7) // 8, base_g, neg)
                base_b = smear(sw // 8, base_g, neg)
                sw_b = smear(sw // 8, sw, 0)
                return (base_a[-1] + base_b[-1] + sw_b[-1]) & 1

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return f

    def mk_two2(k):
        @jax.jit
        def f(sw, base_g):
            def body(_, carry):
                pair = (
                    jnp.full((nrows, 2), neg, jnp.int32)
                    .at[sw // 8]
                    .max(jnp.stack([base_g + carry, sw], axis=-1),
                         mode="drop")
                )
                single = (
                    jnp.full((nrows, 1), neg, jnp.int32)
                    .at[(sw + 7) // 8]
                    .max((base_g + carry)[:, None], mode="drop")
                )
                allc = jax.lax.cummax(
                    jnp.concatenate([pair, single], axis=1), axis=0
                )
                base_b, sw_b, base_a = allc[:, 0], allc[:, 1], allc[:, 2]
                return (base_a[-1] + base_b[-1] + sw_b[-1]) & 1

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return f

    def mk_sorted3(k):
        # Dense pack_values invariant: every group emits >= 256 bits =
        # 8 words, so sw//8 and (sw+7)//8 are STRICTLY increasing ->
        # sorted AND unique; XLA scatter has fast paths for both flags.
        @jax.jit
        def f(sw, base_g):
            def body(_, carry):
                def smear(ri, vals, init):
                    return jax.lax.cummax(
                        jnp.full((nrows,), init, jnp.int32)
                        .at[ri].max(vals + carry, mode="drop",
                                    indices_are_sorted=True,
                                    unique_indices=True)
                    )

                base_a = smear((sw + 7) // 8, base_g, neg)
                base_b = smear(sw // 8, base_g, neg)
                sw_b = smear(sw // 8, sw, 0)
                return (base_a[-1] + base_b[-1] + sw_b[-1]) & 1

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return f

    def mk_sortedset3(k):
        # Unique indices let scatter-max degrade to scatter-SET.
        @jax.jit
        def f(sw, base_g):
            def body(_, carry):
                def smear(ri, vals, init):
                    return jax.lax.cummax(
                        jnp.full((nrows,), init, jnp.int32)
                        .at[ri].set(vals + carry, mode="drop",
                                    indices_are_sorted=True,
                                    unique_indices=True)
                    )

                base_a = smear((sw + 7) // 8, base_g, neg)
                base_b = smear(sw // 8, base_g, neg)
                sw_b = smear(sw // 8, sw, 0)
                return (base_a[-1] + base_b[-1] + sw_b[-1]) & 1

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return f

    t_cur = slope(mk_cur3, sw, base_g)
    t_two = slope(mk_two2, sw, base_g)
    t_srt = slope(mk_sorted3, sw, base_g)
    t_set = slope(mk_sortedset3, sw, base_g)
    print(f"cur3 (3 scatters):        {t_cur*1e3:7.2f} ms")
    print(f"two2 (2-wide + 1 + stacked cummax): {t_two*1e3:7.2f} ms")
    print(f"sorted3 (sorted+unique max):        {t_srt*1e3:7.2f} ms")
    print(f"sortedset3 (sorted+unique set):     {t_set*1e3:7.2f} ms")

    # equivalence check
    def smear(ri, vals, init):
        return jax.lax.cummax(
            jnp.full((nrows,), init, jnp.int32).at[ri].max(vals, mode="drop")
        )

    ref = (
        smear((sw + 7) // 8, base_g, neg),
        smear(sw // 8, base_g, neg),
        smear(sw // 8, sw, 0),
    )
    pair = (
        jnp.full((nrows, 2), neg, jnp.int32)
        .at[sw // 8].max(jnp.stack([base_g, sw], axis=-1), mode="drop")
    )
    single = (
        jnp.full((nrows, 1), neg, jnp.int32)
        .at[(sw + 7) // 8].max(base_g[:, None], mode="drop")
    )
    allc = jax.lax.cummax(jnp.concatenate([pair, single], axis=1), axis=0)
    # sw_b smear inits at 0 in production; neg-init then clamp reproduces it
    assert bool(jnp.all(allc[:, 2] == ref[0])), "base_a mismatch"
    assert bool(jnp.all(allc[:, 0] == ref[1])), "base_b mismatch"
    assert bool(jnp.all(jnp.maximum(allc[:, 1], 0) == ref[2])), "sw_b mismatch"
    print("equivalence: OK")


if __name__ == "__main__":
    main()
