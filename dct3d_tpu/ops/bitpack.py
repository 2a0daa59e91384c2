"""Device-side parallel bit packing of Exp-Golomb codewords.

The reference packs bits serially on the host (ExpGolombWriter.java:19-49,
ExpGolomb.c:32-64).  Here packing is data-parallel on the TPU (SURVEY.md §7
M3): given per-coefficient (code, width) pairs,

  1. bit offsets = exclusive prefix sum of widths  (one cumsum),
  2. every codeword spans at most MAX_SPAN_BYTES output bytes; for each span
     slot j, all codewords compute their contribution to byte
     (offset >> 3) + j with pure vector ops and scatter-add it.

Because codewords occupy disjoint bit ranges, add == or and no carries occur.
The output buffer has a static size (jit-friendly); the true bit length is
returned alongside.  Streaming carry across GOPs (the C encoder's partial-byte
carry, encoder.c:266-271) is handled by passing the carry as a pseudo-codeword
occupying the first `carry_bits` bits.

Width limit: with uint32 code numbers the max span is ceil((63 + 7) / 8) + 1,
but quantized 3D-DCT coefficients of 8-bit video are bounded (|c| <=
255 * sqrt(cube)), so widths stay < 32; MAX_SPAN_BYTES = 6 covers width <= 41
at any bit phase and is asserted in tests.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MAX_SPAN_BYTES = 6


def pack_bits(code, width, out_bytes: int):
    """Pack codewords into a byte buffer of static size.

    Args:
      code: (n,) uint32 code numbers (MSB-first payload of each field).
      width: (n,) int32 field widths in bits (may be 0 for no-op slots).
      out_bytes: static output buffer size in bytes.

    Returns:
      (buf, total_bits): buf (out_bytes,) uint8 with the MSB-first bit
      concatenation starting at bit 0; total_bits int32 scalar.
    """
    width = width.astype(jnp.int32)
    offsets = jnp.cumsum(width) - width  # exclusive scan
    total_bits = offsets[-1] + width[-1] if width.shape[0] else jnp.int32(0)
    end = offsets + width

    # uint32 arithmetic throughout: codeword widths here are < 32 bits
    # (|value| < 2**15 guaranteed — quantized 3D-DCT coefficients of 8-bit
    # video are bounded by 255*sqrt(cube) ~ 5.8k), and for every *valid*
    # (codeword, byte) pair the shift below is provably in (-8, width), so
    # clipping to [0, 31] only affects lanes that the mask zeroes anyway.
    code32 = code.astype(jnp.uint32)
    buf = jnp.zeros((out_bytes,), dtype=jnp.uint32)
    first_byte = offsets >> 3
    for j in range(MAX_SPAN_BYTES):
        byte_idx = first_byte + j
        # byte covers stream bits [8*byte_idx, 8*byte_idx + 8)
        sh = end - 8 * (byte_idx + 1)  # right-shift to align code to byte
        shr = jnp.clip(sh, 0, 31).astype(jnp.uint32)
        shl = jnp.clip(-sh, 0, 31).astype(jnp.uint32)
        contrib = ((code32 >> shr) << shl) & 0xFF
        valid = (8 * byte_idx < end) & (8 * (byte_idx + 1) > offsets)
        contrib = jnp.where(valid, contrib, 0)
        idx = jnp.where(valid, byte_idx, out_bytes)  # dropped when invalid
        buf = buf.at[idx].add(contrib, mode="drop")
    return buf.astype(jnp.uint8), total_bits.astype(jnp.int32)


def pack_bits_np(
    code: np.ndarray, width: np.ndarray, out_bytes: int | None = None
) -> tuple[np.ndarray, int]:
    """NumPy twin of pack_bits for the host oracle / fallback."""
    width = width.astype(np.int64)
    offsets = np.cumsum(width) - width
    total_bits = int(offsets[-1] + width[-1]) if width.size else 0
    if out_bytes is None:
        out_bytes = (total_bits + 7) // 8
    end = offsets + width
    code64 = code.astype(np.uint64)
    buf = np.zeros((out_bytes + 1,), dtype=np.uint32)
    first_byte = offsets >> 3
    for j in range(MAX_SPAN_BYTES):
        byte_idx = first_byte + j
        sh = end - 8 * (byte_idx + 1)
        shr = np.clip(sh, 0, 63).astype(np.uint64)
        shl = np.clip(-sh, 0, 63).astype(np.uint64)
        contrib = ((code64 >> shr) << shl).astype(np.uint32) & 0xFF
        valid = (8 * byte_idx < end) & (8 * (byte_idx + 1) > offsets)
        idx = np.where(valid, byte_idx, out_bytes)
        np.add.at(buf, idx, np.where(valid, contrib, 0))
    return buf[:out_bytes].astype(np.uint8), total_bits
