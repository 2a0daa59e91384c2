"""Does an XLA row gather cost per-row or per-element on this TPU?

The pack's level-2 is ~60 ms of 2M-element random gathers (latency-bound,
~14 ns/elt).  If gathering an R-word contiguous row costs about the same as
gathering one word, the placement can gather nwords/R rows from an
overlapping-window table and win ~Rx.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.utils import enable_compilation_cache

REPS = 3
K1, K2 = 2, 10
TOTAL = 2 * 1024 * 1024  # output words


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
    rng = np.random.default_rng(0)
    tbl_words = 2_200_000
    for r in (1, 4, 8, 16, 32):
        nrows = TOTAL // r
        table = jnp.asarray(
            rng.integers(0, 1 << 30, (tbl_words, r), np.int64), jnp.uint32
        )
        idx = jnp.asarray(rng.integers(0, tbl_words, nrows), jnp.int32)

        def mk(k):
            @jax.jit
            def f(t, i):
                def body(_, carry):
                    return t[(i + carry) % tbl_words].sum()

                return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

            return f

        s = slope(mk, table, idx)
        print(f"R={r:3d}: {nrows/1e3:7.0f}k row-gathers of {4*r:4d}B  "
              f"{s*1e3:7.2f} ms   ({s/nrows*1e9:6.2f} ns/row)")

    # dynamic_slice-in-vmap variant for R=8 (alternative lowering)
    r = 8
    nrows = TOTAL // r
    flat = jnp.asarray(rng.integers(0, 1 << 30, tbl_words + r, np.int64),
                       jnp.uint32)
    idx = jnp.asarray(rng.integers(0, tbl_words, nrows), jnp.int32)

    def mk_ds(k):
        @jax.jit
        def f(t, i):
            def body(_, carry):
                sl = jax.vmap(
                    lambda j: jax.lax.dynamic_slice(t, (j + carry,), (r,))
                )(i)
                return sl.sum()

            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        return f

    s = slope(mk_ds, flat, idx)
    print(f"vmap dynamic_slice R=8: {s*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
