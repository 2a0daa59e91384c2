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
  * VMEM is ~16 MB — 128 groups per grid step.

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

GB = 128  # groups per grid step (VMEM-bound; 512 exceeds the 16 MB limit)


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


def _kernel(code_ref, wid_ref, phase_ref, out_ref, *, w_words: int):
    wid = wid_ref[...]
    code = code_ref[...].astype(jnp.uint32)
    phase = phase_ref[...]  # (GB, 1)
    loff = _cumsum_lanes(wid) - wid + phase
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
    c0i = pltpu.bitcast(c0, jnp.int32)
    c1i = pltpu.bitcast(c1, jnp.int32)
    m_prev = jnp.zeros_like(word0, dtype=jnp.bool_)
    cols = []
    for j in range(w_words):
        m0 = word0 == j
        w0j = jnp.sum(jnp.where(m0, c0i, 0), axis=1, keepdims=True)
        # c1 of codewords whose c0 landed in word j-1 spills into word j.
        w1j = jnp.sum(jnp.where(m_prev, c1i, 0), axis=1, keepdims=True)
        cols.append(w0j + w1j)
        m_prev = m0
    out_ref[...] = pltpu.bitcast(jnp.concatenate(cols, axis=1), jnp.uint32)


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
    gc = code32.shape[0]
    out = pl.pallas_call(
        functools.partial(_kernel, w_words=w_words),
        grid=(gc // GB,),
        in_specs=[
            pl.BlockSpec((GB, group), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, group), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GB, w_words), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gc, w_words), jnp.uint32),
        interpret=interpret,
    )(code32, wid, phase[:, None])
    return out[:g_count]
