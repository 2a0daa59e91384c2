"""Slope-timed stage breakdown of the CURRENT encode hot path (pack_values).

Two methodologies per stage (round 5):
  train    K back-to-back dispatches, one tiny fetch — cancels the relay
           RPC between rows, BUT independent dispatches OVERLAP on device,
           so absolute rows underestimate serialized cost (CLAUDE.md);
  chained  fori_loop whose body xors a carry byte into the frames — a true
           data dependency, so each iteration serializes like production's
           carry chain.  This is the authoritative column.

Cumulative prefixes; consecutive-row differences isolate a stage:

  transform   frames -> cubes -> matmul -> round
  widths      + Exp-Golomb widths (int8) as pack_values computes them
  geometry    + group sums / global cumsum / overflow flag
  l1_pallas   + the in-kernel-codeword Pallas group pack (+ carry OR)
  tail        + the 2-group einsum mini-pack tail byte
  full        the shipped encode_step (adds level-2 row-gather placement)

Run on the real TPU in ONE process (first execution per program pays the
remote load).
"""

from __future__ import annotations

import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.codec import framing
from dct3d_tpu.codec.transform import (
    TransformContext, _PRECISION, _round_half_away, encode_step,
)
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.ops import bitpack, expgolomb, group_pack
from dct3d_tpu.utils import enable_compilation_cache

W, H = 1920, 1080
K2, K10 = 2, 12  # dispatch-train lengths; slope over the difference


def train(fn, *args):
    """Median-of-3 slope: K10 vs K2 chained dispatches, one fetch each."""
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])  # compile + remote load
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
    cfg = CodecConfig()
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
    mb = ctx.max_packed_bytes(n)
    mw = bitpack.max_codeword_bits(cfg.cube_size)
    w_words = bitpack.budget_w_words(256, cfg.pack_bits_per_value)
    w_words = min(w_words, bitpack.worst_case_w_words(256, mw))

    def q_of(f):
        # The PRODUCTION transform (Pallas perm relayout + exact-DC fix),
        # so the prefixes bisect the shipped pipeline, not the old 6-axis
        # transpose formulation.
        from dct3d_tpu.codec.transform import _frames_to_q

        return _frames_to_q(f, ctx.enc_t, cfg)

    @jax.jit
    def stage_transform(f):
        return q_of(f).sum()

    @jax.jit
    def stage_widths(f):
        q = q_of(f)
        wid8 = expgolomb.codewords(q.reshape(-1))[1].astype(jnp.int8)
        return wid8.sum(dtype=jnp.int32)

    @jax.jit
    def stage_geometry(f):
        q = q_of(f)
        wid8 = expgolomb.codewords(q.reshape(-1))[1].astype(jnp.int8).reshape(
            -1, 256
        )
        gbits, gstart, total_bits, phase, sw, overflow = bitpack._geometry(
            wid8, jnp.int32(3), w_words
        )
        return total_bits + phase.sum() + overflow.astype(jnp.int32)

    @jax.jit
    def stage_l1(f):
        q = q_of(f)
        v2 = q.reshape(-1, 256)
        wid8 = expgolomb.codewords(q.reshape(-1))[1].astype(jnp.int8).reshape(
            -1, 256
        )
        gbits, gstart, total_bits, phase, sw, overflow = bitpack._geometry(
            wid8, jnp.int32(3), w_words
        )
        buf = group_pack.group_pack_values_pallas(v2, phase, w_words)
        return buf.sum(dtype=jnp.uint32) + total_bits.astype(jnp.uint32)

    @jax.jit
    def stage_tail(f):
        q = q_of(f)
        v2 = q.reshape(-1, 256)
        wid8 = expgolomb.codewords(q.reshape(-1))[1].astype(jnp.int8).reshape(
            -1, 256
        )
        gbits, gstart, total_bits, phase, sw, overflow = bitpack._geometry(
            wid8, jnp.int32(3), w_words
        )
        buf = group_pack.group_pack_values_pallas(v2, phase, w_words)
        code32m = expgolomb.codewords(v2[-2:].reshape(-1))[0].reshape(2, 256)
        tail = bitpack._tail_byte(
            code32m, wid8[-2:].astype(jnp.int32), gstart[-2:], total_bits
        )
        return buf.sum(dtype=jnp.uint32) + tail

    @jax.jit
    def stage_full(f):
        g = encode_step(f, ctx.enc_t, jnp.uint32(0), jnp.int32(3),
                        max_bytes=mb, cfg=cfg)
        # Fold a data-dependent element of `packed` into the scalar so the
        # chained wrapper cannot dead-code the pack pipeline (the first
        # chained probe of this stage read 0.97 ms for exactly that
        # reason — same trap bench.py's in-program slope guards against).
        live = g.packed[
            (g.total_bits % jnp.int32(g.packed.shape[0]))
        ].astype(jnp.uint32)
        return live + g.total_bits.astype(jnp.uint32)

    def chained(stage_fn):
        """Serialized in-program slope (see module docstring)."""
        @jax.jit
        def prog(f, k):
            def body(i, carry):
                out = stage_fn(f ^ (carry & 1).astype(jnp.uint8))
                leaf = jax.tree.leaves(out)[-1]
                return jnp.asarray(leaf).reshape(-1)[0].astype(jnp.int32)

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        def run(k):
            jax.device_get(prog(fj, k))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.device_get(prog(fj, k))
                best = min(best, time.perf_counter() - t0)
            return best

        return (run(K10) - run(K2)) / (K10 - K2)

    stages = [
        ("transform", stage_transform),
        ("widths", stage_widths),
        ("geometry", stage_geometry),
        ("l1_pallas", stage_l1),
        ("tail", stage_tail),
        ("full", stage_full),
    ]
    print(f"{'stage':12s} {'train':>9s} {'chained':>9s} {'+chained':>9s}"
          f" {'fps(chained)':>12s}", flush=True)
    prev = 0.0
    for name, fn in stages:
        s_train = train(fn, fj)
        s_chain = chained(fn)
        print(f"{name:12s} {s_train*1e3:8.2f}m {s_chain*1e3:8.2f}m "
              f"{(s_chain-prev)*1e3:+8.2f}m {cfg.gop_size/s_chain:11.1f}",
              flush=True)
        prev = s_chain


if __name__ == "__main__":
    main()
