"""Pallas TPU kernel: frame -> cube relayout via word transposes + an
exact MXU unscramble.

The 6-axis uint8 cube transpose (framing.frames_to_cubes) is the encode
transform's whole cost on TPU (~1.9 ms/GOP at 1080p for a 16.6 MB move;
XLA reformulations pinned negative, PERFORMANCE.md).  Mosaic cannot express
the exact cube byte order either: 5-D reshapes, strided lane slices, lane
interleaves and minor collapses are all rejected, and the one legal
identity-order chain (via a (g,2,64)->(g,64,2) transpose) lowers ~4x
SLOWER than XLA (tools/proto_relayout_perm.py: 6.96 vs 1.64 ms).

What IS fast (0.48 ms) is a PERMUTED cube layout built from supported ops
on i32 words:

  frames u8 (T,H,W) --free XLA bitcast--> (T,H,W/4) i32
  per 8-row slab:   (8,8,W/4) --collapse--> (64,W/4) --2D transpose-->
                    (W/4,64)  [row 2*bx+w, lane 8*k+i]

Byte c = 64k+8i+4w+b of cube (by,bx) lands at permuted position
sigma(c) = 256w+32k+4i+b of row by*nbw+bx.

The exact order is restored by ONE one-hot matmul on the MXU,
`perm_cubes @ P` with P[sigma(c), c] = 1: uint8 pixel values are exact in
bfloat16 and each output column has a single nonzero product, so the
result is BIT-IDENTICAL to frames_to_cubes(...).astype(f32) — the
downstream HIGHEST-precision DCT matmul sees the same operand in the same
summation order, keeping float64-oracle parity (the direct row-permuted
enc_t variant changes the K summation order and flips ~0.4ppm of
quantized values — rejected; see tools/proto_relayout_perm.py).

Reference parity target: readCubes cube enumeration, encoder.c:10-45.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supports(cfg, height: int, width: int) -> bool:
    """The kernel covers the 8x8x8 cube geometry (block widths that pack
    whole i32 words); other geometries use the XLA transpose."""
    return (
        cfg.block_d == 8 and cfg.block_h == 8 and cfg.block_w == 8
        and height % 8 == 0 and width % 8 == 0
    )


def sigma(cube_size: int = 512) -> np.ndarray:
    """sigma[c] = lane of cube byte c in the kernel's permuted layout."""
    c = np.arange(cube_size)
    k, i = c >> 6, (c >> 3) & 7
    w, b = (c >> 2) & 1, c & 3
    return 256 * w + 32 * k + 4 * i + b


def unscramble_matrix(dtype=jnp.bfloat16) -> jax.Array:
    """P with P[sigma(c), c] = 1: perm_cubes @ P = exact cube bytes."""
    p = np.zeros((512, 512), np.float32)
    p[sigma(), np.arange(512)] = 1.0
    return jnp.asarray(p, dtype=dtype)


def _kernel(x_ref, o_ref):
    x = x_ref[...]  # (1, 8, 8, w32) i32
    o_ref[...] = x.reshape(64, x.shape[-1]).T[None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def frames_to_cubes_perm(frames, interpret: bool = False):
    """(T, H, W) uint8 -> (T/8 * H/8 * W/8, 512) uint8, sigma-permuted
    columns, cube rows in bitstream order (GOP-major, block-row, column).

    T may span several GOPs; each 8-frame GOP relayouts independently
    (matching frames_to_cubes' GOP-major cube order)."""
    t, h, w = frames.shape
    nbh, nbw, w32 = h // 8, w // 8, w // 4
    gops = t // 8
    x32 = jax.lax.bitcast_convert_type(
        frames.reshape(gops, 8, h, w32, 4), jnp.int32
    )
    vma = jax.typeof(frames).vma
    out = pl.pallas_call(
        _kernel,
        grid=(gops, nbh),
        in_specs=[pl.BlockSpec((1, 8, 8, w32), lambda g, i: (g, 0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2 * nbw, 64), lambda g, i: (g, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gops, nbh * 2 * nbw, 64), jnp.int32,
                                       vma=vma),
        interpret=interpret,
    )(x32)
    by = jax.lax.bitcast_convert_type(
        out.reshape(gops * nbh * nbw, 128), jnp.uint8
    )
    return by.reshape(-1, 512)
