"""Prototype: level-2 place via dynamic-roll Pallas kernel (VERDICT r2
item 7 — one more shot at the encode-step roofline gap).

The splice kernel (ops/splice.py STATUS) died on Mosaic's rule that a
dynamic-offset VMEM vector store needs a 1024-element-aligned offset.
This kernel sidesteps the rule instead of fighting it: place each
group's (<=128-word) buffer inside ONE (8, 128) tile register using
dynamic rolls — `pltpu.roll` with a TRACED shift compiles on real TPUs
(probed 2026-08-19) — then OR the tile into the output at a dynamic
index on the MAJOR (untiled) axis, which Mosaic allows unconditionally:

    rel = sw[g]            # absolute start word, arbitrary
    q, t, s = rel >> 10, (rel >> 7) & 7, rel & 127
    A   = row padded into sublane 0 of an (8,128) tile
    B   = lane-roll(A, s)  with the wrapped lanes moved one sublane down
    C   = sublane-roll(B, t) split into this-tile / next-tile halves
    out[q] |= C0 ; out[q+1] |= C1     # dynamic MAJOR index: legal

Handles the production tight path (w_words <= 128; budget_w_words(256,4)
= 34).  The worst-case retry shape (218 words) keeps the XLA row-gather
formulation.

Run on TPU: correctness vs ops/bitpack._place on a real 1080p GOP's
geometry, then slope timing of place alone and of the full encode step.
CPU (--cpu): interpret-mode correctness only.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build_place_roll():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = 1024  # groups per grid cell (SMEM int32 blocks tile by 1024)

    def _kernel(sw_ref, buf_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        w = buf_ref.shape[1]
        li = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        si = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        def body(g, _):
            rel = sw_ref[g]
            q = rel >> 10
            t = (rel >> 7) & 7
            s = rel & 127
            row = buf_ref[pl.ds(g, 1), :]  # (1, w) uint32
            a = jnp.pad(row, ((0, 7), (0, 128 - w)))
            al = pltpu.roll(a, shift=s, axis=1)
            b = jnp.where(li >= s, al, 0) | pltpu.roll(
                jnp.where(li < s, al, 0), shift=1, axis=0
            )
            bs = pltpu.roll(b, shift=t, axis=0)
            this = jnp.where(si >= t, bs, 0)
            nxt = jnp.where(si < t, bs, 0)
            o_ref[pl.ds(q, 1)] = o_ref[pl.ds(q, 1)] | this[None]
            o_ref[pl.ds(q + 1, 1)] = o_ref[pl.ds(q + 1, 1)] | nxt[None]
            return 0

        jax.lax.fori_loop(0, B, body, 0)

    def _kernel2(sw_ref, buf_ref, o_ref, accv, nxtv, curs):
        """v2: the current output tile rides the fori carry in vregs and
        flushes with ONE pure store when the tile index advances (~once
        per 100 groups at typical rates) — no per-group RMW of the output.
        Correct because sw is nondecreasing and a group spans < 1024
        words, so q advances by at most 1 per group.  Carry persists
        across grid cells via scratch."""
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
            accv[...] = jnp.zeros_like(accv)
            nxtv[...] = jnp.zeros_like(nxtv)
            curs[0] = sw_ref[0] >> 10

        w = buf_ref.shape[1]
        li = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        si = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        def body(g, carry):
            acc, nxa, cur = carry
            rel = sw_ref[g]
            q = rel >> 10
            t = (rel >> 7) & 7
            s = rel & 127
            row = buf_ref[pl.ds(g, 1), :]
            a = jnp.pad(row, ((0, 7), (0, 128 - w)))
            al = pltpu.roll(a, shift=s, axis=1)
            b = jnp.where(li >= s, al, 0) | pltpu.roll(
                jnp.where(li < s, al, 0), shift=1, axis=0
            )
            bs = pltpu.roll(b, shift=t, axis=0)
            this = jnp.where(si >= t, bs, 0)
            nx = jnp.where(si < t, bs, 0)
            adv = q > cur

            @pl.when(adv)
            def _():
                o_ref[pl.ds(cur, 1)] = acc[None]

            acc = jnp.where(adv, nxa, acc) | this
            nxa = jnp.where(adv, 0, nxa) | nx
            return acc, nxa, jnp.where(adv, cur + 1, cur)

        acc, nxa, cur = jax.lax.fori_loop(
            0, B, body, (accv[...], nxtv[...], curs[0])
        )
        accv[...] = acc
        nxtv[...] = nxa
        curs[0] = cur

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[pl.ds(cur, 1)] = acc[None]
            o_ref[pl.ds(cur + 1, 1)] = nxa[None]

    @functools.partial(
        jax.jit, static_argnames=("nwords", "interpret")
    )
    def place_roll2(buf_groups, sw, *, nwords: int, interpret: bool = False):
        g_count, w = buf_groups.shape
        assert w <= 128
        pad = (-g_count) % B
        if pad:
            buf_groups = jnp.concatenate(
                [buf_groups, jnp.zeros((pad, w), jnp.uint32)]
            )
            sw = jnp.concatenate([sw, jnp.broadcast_to(sw[-1:], (pad,))])
        g_count = buf_groups.shape[0]
        tiles = -(-nwords // 1024) + 2
        out = pl.pallas_call(
            _kernel2,
            grid=(g_count // B,),
            in_specs=[
                pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((B, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tiles, 8, 128), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tiles, 8, 128), jnp.uint32),
            scratch_shapes=[
                pltpu.VMEM((8, 128), jnp.uint32),
                pltpu.VMEM((8, 128), jnp.uint32),
                pltpu.SMEM((1,), jnp.int32),
            ],
            interpret=interpret,
        )(sw, buf_groups)
        return out.reshape(-1)[:nwords]

    @functools.partial(
        jax.jit, static_argnames=("nwords", "interpret")
    )
    def place_roll(buf_groups, sw, *, nwords: int, interpret: bool = False):
        """(G, W<=128) uint32 phase-aligned group buffers + (G,) start
        words -> (nwords,) uint32 stream words (OR-concatenation)."""
        g_count, w = buf_groups.shape
        assert w <= 128, "roll place covers the tight path only"
        pad = (-g_count) % B
        if pad:
            # Pad groups re-place group -1's tile harmlessly (OR with 0).
            buf_groups = jnp.concatenate(
                [buf_groups, jnp.zeros((pad, w), jnp.uint32)]
            )
            sw = jnp.concatenate([sw, jnp.broadcast_to(sw[-1:], (pad,))])
        g_count = buf_groups.shape[0]
        tiles = -(-nwords // 1024) + 2  # +2: q+1 spill of tail groups
        out = pl.pallas_call(
            _kernel,
            grid=(g_count // B,),
            in_specs=[
                pl.BlockSpec((B,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((B, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tiles, 8, 128), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tiles, 8, 128), jnp.uint32),
            interpret=interpret,
        )(sw, buf_groups)
        return out.reshape(-1)[:nwords]

    return place_roll, place_roll2


def main() -> int:
    import jax

    cpu = "--cpu" in sys.argv
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dct3d_tpu.codec import framing
    from dct3d_tpu.codec.transform import TransformContext, _quantize
    from dct3d_tpu.config import CodecConfig
    from dct3d_tpu.ops import bitpack, expgolomb
    from dct3d_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    place_roll, place_roll2 = build_place_roll()
    cfg = CodecConfig()
    ctx = TransformContext(cfg)
    h, w = (216, 384) if cpu else (1080, 1920)
    rng = np.random.default_rng(3)
    x = np.arange(w, dtype=np.uint32)
    y = np.arange(h, dtype=np.uint32)[:, None]
    frames = np.empty((8, h, w), np.uint8)
    for k in range(8):
        frames[k] = ((x[None, :] + y + k) & 0xFF).astype(np.uint8)
    frames ^= rng.integers(0, 16, size=frames.shape, dtype=np.uint8)

    # Real group geometry from the production quantizer.
    q = np.asarray(_quantize(
        framing.frames_to_cubes(jnp.asarray(frames), cfg).astype(jnp.float32),
        ctx.enc_t, cfg,
    )).reshape(-1)
    code, wid = expgolomb.codewords_np(q)
    group = 256
    g_count = q.size // group
    w_words = bitpack.budget_w_words(group, cfg.pack_bits_per_value)
    code32 = jnp.asarray(code.astype(np.uint32)).reshape(g_count, group)
    widj = jnp.asarray(wid.astype(np.int32)).reshape(g_count, group)
    gbits, gstart, total_bits, phase, sw, ovf = bitpack._geometry(
        widj, 0, w_words
    )
    assert not bool(ovf), "bench clip fits the budget"
    buf_groups = bitpack._group_pack_einsum(code32, widj, phase, w_words)
    out_bytes = ctx.max_packed_bytes(q.size)
    nwords = (out_bytes + 3) // 4

    want = np.asarray(bitpack._place(
        buf_groups, gbits, gstart, total_bits, out_bytes, w_words, dense=True
    ))
    shifts = np.array([24, 16, 8, 0], np.uint32)
    tw = (int(total_bits) + 31) // 32
    for name, fn in (("roll", place_roll), ("roll2", place_roll2)):
        got_w = np.asarray(fn(buf_groups, sw, nwords=nwords, interpret=cpu))
        got = ((got_w[:, None] >> shifts[None, :]) & 0xFF).astype(np.uint8)
        got = got.reshape(-1)[:out_bytes]
        # _place zeroes words past the stream; the kernel's output is zero
        # there by construction — compare inside the stream.
        assert np.array_equal(got[: tw * 4], want[: tw * 4]), (
            f"{name} place differs from XLA place inside the stream"
        )
    print(f"byte-equality OK ({g_count} groups, w_words={w_words})",
          flush=True)
    if cpu:
        return 0

    # Slope both formulations (K in one fori program, carried dependency).
    def mk(kind, k):
        @jax.jit
        def f(bg, sw_, gb, gs):
            def body(_, carry):
                bgx = bg.at[0, 0].add(carry & 1)
                if kind == "roll":
                    out = place_roll(bgx, sw_, nwords=nwords)
                    r = out[0] + out[-1]
                elif kind == "roll2":
                    out = place_roll2(bgx, sw_, nwords=nwords)
                    r = out[0] + out[-1]
                else:
                    buf = bitpack._place(
                        bgx, gb, gs, total_bits, out_bytes, w_words,
                        dense=True,
                    )
                    r = buf[0].astype(jnp.uint32) + buf[-1]
                return r

            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        return f

    def run_once(fn, *a, r=3):
        jax.device_get(fn(*a))
        best = 1e9
        for _ in range(r):
            t0 = time.perf_counter()
            jax.device_get(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    for kind in ("xla", "roll", "roll2"):
        t1 = run_once(mk(kind, 2), buf_groups, sw, gbits, gstart)
        t2 = run_once(mk(kind, 10), buf_groups, sw, gbits, gstart)
        dt = (t2 - t1) / 8
        print(f"place[{kind:4s}]: {1000 * dt:6.2f} ms/GOP", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
