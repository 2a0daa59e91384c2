"""Pallas TPU kernel (EXPERIMENTAL): splice per-group bit buffers into the
global stream.

This is level 2 of the device bit-packer (ops/bitpack.py): G variable-length
bit strings, each pre-packed at its global 32-bit phase into a zero-padded
(G, W) uint32 buffer, must be OR-concatenated at word offsets sw[g] into one
output word array.  XLA can only express this as per-output-word gathers
(~50 ms per 1080p GOP — gathers are near-serial on TPU); the natural machine
shape is "copy each group's words to its offset and OR the one boundary
word", which is what this kernel does.

STATUS — measured outcome of SURVEY.md §7 M2/M3's "benchmark, keep whichever
wins": this kernel is logic-correct (interpret-mode tests pass, including
multi-cell boundaries) but Mosaic REJECTS it for real TPUs: VMEM is tiled
(8, 128), so a dynamic-offset vector store `span[pl.ds(rel, w)]` requires
rel to be a multiple of 1024 elements — "cannot statically prove that index
in dimension 0 is a multiple of 1024".  Bitstream word offsets are
data-dependent and arbitrary, so honoring the constraint needs a dynamic
cross-lane rotate per group (emulated as ~10 conditional static rolls),
which costs about as much as the XLA gather formulation it would replace.
Conclusion: arbitrary-bit-offset scatter is hostile to TPU vector memory at
the ISA level, and the gather/cummax formulation in bitpack.py IS the
idiomatic TPU answer.  pack_bits therefore defaults to the XLA path
everywhere; the kernel is kept for the record and exercised in interpret
mode by tests.

ROUND-3 FOLLOW-UP (tools/proto_place_roll.py, measured 2026-08-19): the
alignment rule CAN be sidestepped — `pltpu.roll` accepts TRACED shifts on
real TPUs, so a group places inside one (8,128) vreg via dynamic
lane+sublane rolls with wrap masks, stored at a dynamic index on the
untiled major axis.  Two such kernels ran byte-exact on hardware and both
measured SLOWER than the XLA row gather (5.95 / 6.02 vs 3.33 ms/GOP at
1080p): per-group dynamic placement costs ~85 serial scalar cycles/group
that no memory-traffic optimization touches (an output-tile-in-vregs
variant with 100x fewer stores tied the naive RMW variant).  The negative
conclusion above stands on hardware measurement, not just Mosaic's
verifier.

Original design notes:

  * grid over blocks of B groups; the TPU grid is SEQUENTIAL on a core, so
    read-modify-write of the shared output and a carry scratch that persists
    across grid steps are race-free by construction;
  * per cell: zero a VMEM span, OR each group's W words in at its relative
    offset (dynamic-offset VMEM vector ops), then DMA the span to HBM in
    fixed-size chunks;
  * chunk DMAs may overrun a cell's true span with zeros — by construction
    the overrun lands in the NEXT cell's territory (every full cell spans
    >= B*group/32 >= CHUNK words) and is rewritten by it one grid step
    later; the shared partial boundary word is carried in SMEM and OR-merged
    into the successor's span instead;
  * the final partial word is written by the last owning cell as-is (its
    trailing bits are the stream tail padding).

Interpret mode makes the same kernel runnable on CPU for tests; bitpack
selects the XLA gather formulation off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B_GROUPS = 256  # groups per grid cell
CHUNK = 1024  # words per output DMA


def _kernel(sw_ref, gend_ref, buf_ref, out_ref, span, carry_block, sem, *,
            span_words: int, max_chunks: int):
    i = pl.program_id(0)
    b, w = buf_ref.shape

    @pl.when(i == 0)
    def _():
        carry_block[:] = jnp.zeros((CHUNK,), jnp.uint32)

    span[:] = jnp.zeros((span_words,), jnp.uint32)
    # HBM DMA offsets must be chunk-aligned (Mosaic requires the proof), so
    # the cell's span starts at the chunk boundary at or below its first
    # group; the chunk's words before that boundary are the predecessor's —
    # its final (partial) chunk is carried here and re-laid at span[0:CHUNK].
    # This also OR-merges the shared boundary word for free.
    base0 = sw_ref[0]
    align = pl.multiple_of((base0 // CHUNK) * CHUNK, CHUNK)
    span[pl.ds(0, CHUNK)] = carry_block[:]

    def body(g, _):
        rel = sw_ref[g] - align
        row = buf_ref[pl.ds(g, 1), :].reshape((w,))
        span[pl.ds(rel, w)] = span[pl.ds(rel, w)] | row
        return 0

    jax.lax.fori_loop(0, b, body, 0)

    end_bits = gend_ref[b - 1]
    end_word = jax.lax.shift_right_logical(end_bits, 5)
    ncell = end_word - align + 1  # words incl. the trailing partial word
    # Carry the final (possibly partial) chunk to the successor, which will
    # rewrite that chunk in full.
    carry_block[:] = span[
        pl.ds(pl.multiple_of(((end_word - align) // CHUNK) * CHUNK, CHUNK), CHUNK)
    ]

    # DMA destination is addressed by CHUNK-row of the 2D output — dynamic
    # row indices need no offset-divisibility proof, unlike byte offsets.
    n_rows = out_ref.shape[0]
    base_row = base0 // CHUNK
    for c in range(max_chunks):
        # Second guard: on a pack-buffer overflow (driver retries those)
        # group offsets can exceed the output; never DMA out of range.
        @pl.when((c * CHUNK < ncell) & (base_row + c < n_rows))
        def _():
            dma = pltpu.make_async_copy(
                span.at[pl.ds(c * CHUNK, CHUNK)],
                out_ref.at[base_row + c],
                sem,
            )
            dma.start()
            dma.wait()


@functools.partial(
    jax.jit, static_argnames=("nwords", "group", "interpret")
)
def splice(buf_groups, sw, gend, *, nwords: int, group: int,
           interpret: bool = False):
    """OR-concatenate (G, W) phase-aligned group buffers into global words.

    Args:
      buf_groups: (G, W) uint32 zero-padded per-group word buffers.
      sw: (G,) int32 start word of each group (nondecreasing).
      gend: (G,) int32 end bit position of each group (gstart + gbits).
      nwords: static output length in words.
      group: codewords per group (bounds each cell's span).

    Returns: (nwords,) uint32.  Words past the total bit length are
    unspecified (the caller slices to the true byte count).
    """
    g_count, w_words = buf_groups.shape
    pad = (-g_count) % B_GROUPS
    if pad:
        buf_groups = jnp.concatenate(
            [buf_groups, jnp.zeros((pad, w_words), jnp.uint32)]
        )
        # Pad groups are empty, starting at the stream end.
        sw = jnp.concatenate([sw, jnp.broadcast_to(sw[-1:], (pad,))])
        gend = jnp.concatenate([gend, jnp.broadcast_to(gend[-1:], (pad,))])
    g_count = buf_groups.shape[0]

    # Worst-case cell span: chunk-alignment slack + B_GROUPS * group
    # codewords * 32 bits + buffer tail, rounded up to whole DMA chunks.
    span_words = -(-(CHUNK + B_GROUPS * group + w_words) // CHUNK) * CHUNK
    max_chunks = span_words // CHUNK
    out = pl.pallas_call(
        functools.partial(
            _kernel, span_words=span_words, max_chunks=max_chunks
        ),
        grid=(g_count // B_GROUPS,),
        in_specs=[
            pl.BlockSpec((B_GROUPS,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B_GROUPS,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B_GROUPS, w_words), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (-(-nwords // CHUNK) + max_chunks, CHUNK), jnp.uint32
        ),
        scratch_shapes=[
            pltpu.VMEM((span_words,), jnp.uint32),
            pltpu.VMEM((CHUNK,), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(sw, gend, buf_groups)
    return out.reshape(-1)[:nwords]
