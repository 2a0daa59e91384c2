"""Pallas TPU kernel: level-1 group pack (per-group phase-aligned words).

Replaces the XLA one-hot bf16 einsum of ops/bitpack._group_pack on real
TPUs: the einsum materializes an (n, w_words) one-hot in HBM (~1.1 GB per
1080p GOP, ~4.5-8 ms); here the select-accumulate runs on the VPU entirely
in VMEM (~2.5 ms, measured in tools/proto_pallas_l1.py — byte-exact).

Mosaic constraints worked around (all discovered by compilation):
  * `cumsum` has no TPU lowering — manual Hillis-Steele scan with
    pltpu.roll + iota mask;
  * reductions over unsigned ints are unimplemented — sums run as int32
    (wrapping adds are bit-identical) and bitcast back;
  * 1D bitcast is unimplemented — columns are concatenated and bitcast 2D;
  * VMEM is ~16 MB — 256 groups per grid step (512 overflows).

The w_words loop is unrolled at trace time, so this path is only selected
for budget-capped buffers (w_words <= 64); the rare worst-case retry and
the tiny mini-pack stay on the einsum (see bitpack._group_pack).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GB = 256  # groups per grid step (VMEM-bound; fewer grid steps beat 128)


def _cumsum_lanes(x):
    """Inclusive prefix sum along axis 1 (no cumsum lowering in Mosaic)."""
    n = x.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < n:
        r = pltpu.roll(x, s, axis=1)
        x = x + jnp.where(idx >= s, r, 0)
        s *= 2
    return x


def _pack_body(code, wid, phase, out_ref, *, w_words: int,
               emit_last: bool = False):
    inc = _cumsum_lanes(wid)
    loff = inc - wid + phase
    word0 = loff >> 5
    start_bit = loff & 31
    over = start_bit + wid - 32  # bits spilling into the next word
    shr = jnp.clip(over, 0, 31).astype(jnp.uint32)
    shl = jnp.clip(-over, 0, 31).astype(jnp.uint32)
    c0 = jnp.where(over > 0, code >> shr, code << shl)
    c0 = jnp.where(wid > 0, c0, 0)
    c1 = jnp.where(over > 0, code << (32 - shr), 0)
    # Sum as int32 (unsigned reductions unimplemented); contributions to a
    # word are bit-disjoint, so wrapping adds reproduce the exact bits.
    # Fold the two masked sums per word (c0 where word0==j plus the spill
    # c1 where word0==j-1) into ONE over the lane-concatenated (GB, 2*group)
    # pair — same elements touched, half the compare/select/reduce streams
    # (2.98 -> 1.29 ms at GB=256, tools/proto_l1_variants.py).
    z = jnp.concatenate(
        [pltpu.bitcast(c0, jnp.int32), pltpu.bitcast(c1, jnp.int32)], axis=1
    )
    w = jnp.concatenate([word0, word0 + 1], axis=1)
    cols = [
        jnp.sum(jnp.where(w == j, z, 0), axis=1, keepdims=True)
        for j in range(w_words)
    ]
    if emit_last:
        # The group's LAST occupied word (= _place's premerge boundary
        # word), selected here where the words are already live instead of
        # re-selecting over the (g, w_words) table in XLA (~0.7 ms/GOP).
        # endw matches bitpack._geometry: (phase + gbits - 1) >> 5.
        endw = jnp.clip((phase + inc[:, -1:] - 1) >> 5, 0, w_words - 1)
        last = jnp.zeros_like(cols[0])
        for j in range(w_words):
            last = last + jnp.where(endw == j, cols[j], 0)
        cols.append(last)
    out_ref[...] = pltpu.bitcast(jnp.concatenate(cols, axis=1), jnp.uint32)


def _kernel(code_ref, wid_ref, phase_ref, out_ref, *, w_words: int):
    _pack_body(code_ref[...].astype(jnp.uint32), wid_ref[...],
               phase_ref[...], out_ref, w_words=w_words)


def _kernel_values(val_ref, phase_ref, out_ref, *, w_words: int,
                   emit_last: bool = False):
    """Like _kernel but derives the Exp-Golomb codewords from raw int32
    coefficients in VMEM (no code/width arrays ever hit HBM).  bitlen via
    the float32 exponent (exact for code numbers < 2^24; ours are < 2^16)."""
    v = val_ref[...]
    m = jnp.where(v > 0, 2 * v - 1, -2 * v)
    code = m + 1  # int32 in [1, 2^16)
    expo = (pltpu.bitcast(code.astype(jnp.float32), jnp.int32) >> 23) & 0xFF
    wid = 2 * (expo - 126) - 1  # = 2*bitlen(code) - 1
    _pack_body(pltpu.bitcast(code, jnp.uint32), wid, phase_ref[...],
               out_ref, w_words=w_words, emit_last=emit_last)


def _call(kernel, inputs, in_block_shapes, gc: int, w_words: int,
          interpret: bool):
    # Under shard_map(check_vma=True) the output aval must declare which
    # mesh axes it varies over; it varies exactly like the inputs do.
    vma = frozenset().union(*(jax.typeof(x).vma for x in inputs))
    return pl.pallas_call(
        kernel,
        grid=(gc // GB,),
        in_specs=[
            pl.BlockSpec(shape, lambda i: (i, 0), memory_space=pltpu.VMEM)
            for shape in in_block_shapes
        ],
        out_specs=pl.BlockSpec((GB, w_words), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gc, w_words), jnp.uint32, vma=vma),
        interpret=interpret,
    )(*inputs)


@functools.partial(
    jax.jit, static_argnames=("w_words", "interpret", "with_lastw")
)
def group_pack_values_pallas(values, phase, w_words: int,
                             interpret: bool = False,
                             with_lastw: bool = False):
    """(g, group) int32 coefficients -> (g, w_words) phase-aligned words.

    The codeword math runs inside the kernel, so only the raw values cross
    HBM.  The grid pad appends zero-VALUE groups (width-1 codewords, unlike
    pack_bits' zero-width pads) — harmless because padded group rows are
    sliced off here and never enter the caller's geometry.

    with_lastw=True additionally returns each group's last occupied word
    (the dense premerge boundary, see _pack_body) as a (g,) array:
    returns (buf, lastw) instead of buf."""
    g_count, group = values.shape
    pad = (-g_count) % GB
    if pad:
        values = jnp.concatenate(
            [values, jnp.zeros((pad, group), jnp.int32)]
        )
        phase = jnp.concatenate([phase, jnp.zeros((pad,), jnp.int32)])
    out_cols = w_words + (1 if with_lastw else 0)
    out = _call(
        functools.partial(_kernel_values, w_words=w_words,
                          emit_last=with_lastw),
        (values, phase[:, None]),
        [(GB, group), (GB, 1)],
        values.shape[0], out_cols, interpret,
    )
    if with_lastw:
        return out[:g_count, :w_words], out[:g_count, w_words]
    return out[:g_count]


@functools.partial(jax.jit, static_argnames=("w_words", "interpret"))
def group_pack_pallas(code32, wid, phase, w_words: int,
                      interpret: bool = False):
    """(g, group) codewords -> (g, w_words) phase-aligned uint32 words.

    Drop-in for bitpack._group_pack's einsum (byte-exact, tested both in
    interpret mode on CPU and compiled on TPU)."""
    g_count, group = code32.shape
    pad = (-g_count) % GB
    if pad:
        code32 = jnp.concatenate([code32, jnp.zeros((pad, group), jnp.uint32)])
        wid = jnp.concatenate([wid, jnp.zeros((pad, group), jnp.int32)])
        phase = jnp.concatenate([phase, jnp.zeros((pad,), jnp.int32)])
    out = _call(
        functools.partial(_kernel, w_words=w_words),
        (code32, wid, phase[:, None]),
        [(GB, group), (GB, group), (GB, 1)],
        code32.shape[0], w_words, interpret,
    )
    return out[:g_count]
