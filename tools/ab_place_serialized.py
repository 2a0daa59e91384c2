"""Serialized (chained fori_loop) re-A/B of the level-2 place variants.

Round 5 found that independent dispatch trains OVERLAP on device
(CLAUDE.md), so the round-3/4 place-variant negatives — measured with
exactly such trains — may be wrong.  The serialized encode bisect puts
place at +4.63 ms/GOP (64% of the encode step), vs the 2.78 the train
method reported, so this re-judges the two strongest variants under the
trustworthy methodology:

  base      shipped _place: TWO 8-word row gathers per output row + select
  boundary  row_a gather redirected to row 0 on rows without an interior
            ownership change (tools/proto_place_boundary.py)
  aug       ONE row gather per output row over an augmented 41-word group
            table (+ one 64.8K-row predecessor-tail gather)
            (tools/proto_place_aug.py)

Each variant is bit-exact vs base (asserted), then slope-timed inside a
fori_loop whose input derives from the previous iteration's output.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.ops import bitpack, expgolomb, group_pack
from dct3d_tpu.utils import enable_compilation_cache

import proto_place_aug
import proto_place_boundary

K1, K2 = 2, 12
GROUP = 256
N = 64800 * 256
W_WORDS = 34


def main() -> None:
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    vals = rng.integers(-2, 3, size=N).astype(np.int32)
    big = rng.choice(N, N // 500, replace=False)
    vals[big] = rng.integers(-300, 300, size=big.size)
    values = jnp.asarray(vals)
    wid8 = expgolomb.codewords(values)[1].astype(jnp.int8).reshape(-1, GROUP)
    gbits, gstart, total_bits, phase, sw, overflow = bitpack._geometry(
        wid8, jnp.int32(0), W_WORDS
    )
    assert not bool(overflow)
    buf_groups = group_pack.group_pack_values_pallas(
        values.reshape(-1, GROUP), phase, W_WORDS
    )
    out_bytes = int(
        (np.int64(2) * N) // 8 + 64
    )  # stream_budget_bits_per_value default

    variants = {
        "base": lambda bg: bitpack._place(
            bg, gbits, gstart, total_bits, out_bytes, W_WORDS, dense=True
        ),
        "boundary": lambda bg: proto_place_boundary.place_variant(
            bg, gbits, gstart, total_bits, out_bytes, W_WORDS
        ),
        "aug": lambda bg: proto_place_aug.place_aug(
            bg, gbits, gstart, total_bits, out_bytes, W_WORDS
        ),
    }

    ref = np.asarray(jax.jit(variants["base"])(buf_groups))
    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(buf_groups))
        ok = np.array_equal(ref, got)
        print(f"{name:9s} exact={ok}", flush=True)
        assert ok

    def chained(fn):
        @jax.jit
        def prog(bg, k):
            def body(i, carry):
                out = fn(bg.at[0, 0].add(carry & jnp.uint32(1)))
                return out.reshape(-1)[0].astype(jnp.uint32)

            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        def run(k):
            jax.device_get(prog(buf_groups, k))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.device_get(prog(buf_groups, k))
                best = min(best, time.perf_counter() - t0)
            return best

        return (run(K2) - run(K1)) / (K2 - K1)

    for name, fn in variants.items():
        print(f"{name:9s} {chained(fn)*1e3:7.2f} ms/GOP serialized",
              flush=True)


if __name__ == "__main__":
    main()
