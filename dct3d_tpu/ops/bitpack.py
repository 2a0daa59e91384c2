"""Device-side parallel bit packing of Exp-Golomb codewords.

The reference packs bits serially on the host (ExpGolombWriter.java:19-49,
ExpGolomb.c:32-64).  Here packing is data-parallel on the TPU (SURVEY.md §7
M3).  TPU constraint discovered the hard way: XLA lowers big scatters,
searchsorted and multi-million-element gathers to (near-)serial loops, so the
obvious "scatter every codeword's bytes" and "searchsorted run boundaries"
formulations cost ~1.5 s per 1080p GOP.  This implementation instead routes
the irregular work through the MXU and a handful of small gathers:

  level 1 — groups of `group` (256 by default; measured fastest at 256-512
    on v5e) codewords.  Bit offsets inside a group are
    a row-wise cumsum.  Each codeword (field width <= 32 bits) contributes to
    exactly two 32-bit words of a zero-padded per-group buffer of W = group+2
    words, via shifts.  The per-word segment sums are computed EXACTLY as a
    one-hot matmul on the MXU: one-hot(word index) in bfloat16 x the four
    byte-planes of each contribution (bf16 holds 0..255 exactly), f32
    accumulation (sums <= group*255 << 2^24), recombined into uint32 words.

  level 2 — the global stream is the concatenation of per-group bit strings.
    Every group's buffer is already packed at its *global* bit phase
    (phase = group start bit % 32, group starts = one tiny cumsum), so output
    word w is the sum of at most three group buffers' words (a group with
    >= 33 bits spans >= 2 words, so only the owner group, its nonempty
    predecessor, and — for the single sub-32-bit partial tail group — one
    more can overlap any word; zero padding makes extra terms harmless).
    Per-word table addresses and validity limits are produced WITHOUT
    per-word gathers of group metadata: per-group (base, limit) values are
    monotone in the group index, so scattering them at each group's start
    word and running a cummax "smears" them across each owner run.  Only
    three table gathers (one per overlap term) remain — gathers/scatters
    are the expensive primitive on TPU, everything else here is cumsum/
    elementwise/MXU work.

  The carry byte for the next batch (the byte containing bit total_bits-1)
  is computed separately from three scalar gathers, NOT from the output
  buffer — so it stays correct even if out_bytes overflows, which lets the
  driver retry an overflowed batch with a bigger static buffer without
  breaking the bit-carry chain (see TransformContext.max_packed_bytes).

The output buffer has a static size (jit-friendly); the true bit length is
returned alongside.  Streaming carry across GOPs (the C encoder's
partial-byte carry, encoder.c:266-271) is handled by the caller passing the
carry as a pseudo-codeword occupying the first `carry_bits` bits.

Width limit: quantized 3D-DCT coefficients of 8-bit video are bounded by
255*sqrt(cube) (orthonormal basis), so code numbers < 2^15 and field widths
<= 29 < 32 for every supported block size; the device path requires <= 32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Max output bytes a single codeword may span in pack_bits_np (width<=41 at
# any bit phase); the device path instead requires width <= 32 (see above).
MAX_SPAN_BYTES = 6


def _default_impl() -> str:
    """Level-2 implementation.  Always the XLA gather formulation: the
    Pallas splice kernel (ops/splice.py) is rejected by Mosaic on real TPUs
    because bitstream word offsets are not VMEM-tile-aligned — see the
    STATUS note there for the measurement-driven decision record."""
    return "xla"


def max_codeword_bits(cube_size: int) -> int:
    """Worst-case Exp-Golomb field width for quantized 3D-DCT coefficients
    of 8-bit video: |c| <= 255*sqrt(cube) (orthonormal basis; divisors only
    shrink it), code number m+1 <= 2*|c|+2."""
    max_code = 2 * int(np.ceil(255.0 * np.sqrt(cube_size))) + 2
    return 2 * max_code.bit_length() - 1


def pack_bits(code, width, out_bytes: int, group: int = 256,
              impl: str | None = None, max_width: int = 32):
    """Pack codewords into a byte buffer of static size.

    Args:
      code: (n,) uint32 code numbers (MSB-first payload of each field).
      width: (n,) int32 field widths in bits, each <= max_width (0 = no-op).
      out_bytes: static output buffer size in bytes.
      group: codewords per level-1 group (input is zero-padded to a multiple).
      impl: level-2 assembly: "pallas" (TPU splice kernel),
        "pallas_interpret" (same kernel, interpreter), "xla" (gather
        formulation), None = auto.
      max_width: static bound on field widths (<= 32); a tighter bound from
        max_codeword_bits() shrinks the level-1 buffers (~15% less HBM
        traffic for 8x8x8 cubes).  Widths exceeding it corrupt the stream.

    Returns:
      (buf, total_bits, tail_byte): buf (out_bytes,) uint8 with the MSB-first
      bit concatenation starting at bit 0; total_bits int32 scalar; tail_byte
      uint32 scalar = the stream byte containing bit total_bits-1 (zero
      padded), valid even when total_bits > 8*out_bytes (overflow).
    """
    width = width.astype(jnp.int32)
    n = width.shape[0]
    if n == 0:
        return jnp.zeros((out_bytes,), jnp.uint8), jnp.int32(0), jnp.uint32(0)
    pad = (-n) % group
    code32 = code.astype(jnp.uint32)
    if pad:
        code32 = jnp.concatenate([code32, jnp.zeros((pad,), jnp.uint32)])
        width = jnp.concatenate([width, jnp.zeros((pad,), jnp.int32)])
    g_count = (n + pad) // group
    # Zero-padded words per group buffer (worst-case group bits + c1 spill).
    w_words = -(-group * min(max_width, 32) // 32) + 2
    code32 = code32.reshape(g_count, group)
    wid = width.reshape(g_count, group)

    # Group bit geometry (tiny arrays; one global cumsum of g_count).
    gbits = wid.sum(axis=1)
    gstart = jnp.cumsum(gbits) - gbits
    total_bits = gstart[-1] + gbits[-1]
    phase = (gstart & 31).astype(jnp.int32)

    # Per-codeword aligned contributions to its word and the next.
    loff = jnp.cumsum(wid, axis=1) - wid + phase[:, None]
    word0 = (loff >> 5).astype(jnp.int32)  # in [0, w_words-2]
    start_bit = (loff & 31).astype(jnp.int32)
    over = start_bit + wid - 32  # bits spilling into the next word
    shr = jnp.clip(over, 0, 31).astype(jnp.uint32)
    shl = jnp.clip(-over, 0, 31).astype(jnp.uint32)
    c0 = jnp.where(over > 0, code32 >> shr, code32 << shl)
    c0 = jnp.where(wid > 0, c0, 0)
    c1 = jnp.where(over > 0, code32 << (32 - shr), 0)

    # Level 1: exact per-(group, word) segment sums on the MXU.
    onehot = (
        word0[:, :, None] == jnp.arange(w_words, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.bfloat16)
    planes = jnp.stack(
        [
            (c0 >> 24) & 0xFF, (c0 >> 16) & 0xFF, (c0 >> 8) & 0xFF, c0 & 0xFF,
            (c1 >> 24) & 0xFF, (c1 >> 16) & 0xFF, (c1 >> 8) & 0xFF, c1 & 0xFF,
        ],
        axis=-1,
    ).astype(jnp.bfloat16)  # (g, group, 8)
    sums = jnp.einsum(
        "gcw,gcx->gwx", onehot, planes, preferred_element_type=jnp.float32
    ).astype(jnp.uint32)  # exact: <= group*255 < 2^24
    w0 = (sums[..., 0] << 24) + (sums[..., 1] << 16) + (sums[..., 2] << 8) + sums[..., 3]
    w1 = (sums[..., 4] << 24) + (sums[..., 5] << 16) + (sums[..., 6] << 8) + sums[..., 7]
    # c1 lands one word later than c0's word.
    buf_groups = w0 + jnp.concatenate(
        [jnp.zeros((g_count, 1), jnp.uint32), w1[:, :-1]], axis=1
    )
    # Lookup table with one leading zero word: clamped-to-0 reads are no-ops.
    table = jnp.concatenate([jnp.zeros((1,), jnp.uint32), buf_groups.reshape(-1)])
    t_max = g_count * w_words  # last valid table index

    # Level 2: per-group metadata for the <= 3 overlap terms.
    sw = (gstart >> 5).astype(jnp.int32)  # start word per group
    gidx = jnp.arange(g_count, dtype=jnp.int32)
    nonempty = jnp.where(gbits > 0, gidx, -1)
    last_ne = jax.lax.cummax(nonempty)
    prev_ne = jnp.concatenate([jnp.full((1,), -1, jnp.int32), last_ne[:-1]])
    neg = jnp.int32(-(1 << 30))  # sentinel: clips to table[0] == 0

    def group_meta(g):
        """(base, limit) per group g (may be -1): word w of group g lives at
        table[base + w + 1] and is valid while w < limit."""
        gc = jnp.clip(g, 0, g_count - 1)
        ok = g >= 0
        base = jnp.where(ok, gc * w_words - sw[gc], neg)
        limit = jnp.where(ok, sw[gc] + w_words, 0)
        return base, limit

    # Terms per output word w: the owner group (last group starting <= w),
    # its previous nonempty group, and that one's previous nonempty group.
    metas = [
        group_meta(gidx),
        group_meta(prev_ne),
        group_meta(jnp.where(prev_ne >= 0, prev_ne[jnp.clip(prev_ne, 0, g_count - 1)], -1)),
    ]

    nwords = (out_bytes + 3) // 4
    impl = impl or _default_impl()
    if impl in ("pallas", "pallas_interpret"):
        from .splice import splice

        words = splice(
            buf_groups, sw, (gstart + gbits).astype(jnp.int32),
            nwords=nwords, group=group,
            interpret=(impl == "pallas_interpret"),
        )
    else:
        # XLA fallback: smear per-group values across owner runs — all
        # scattered values are monotone nondecreasing in g (w_words > max
        # group word span), so scatter-max at group start words + cummax
        # yields the owner's value; three table gathers assemble the words.
        wi = jnp.arange(nwords, dtype=jnp.int32)
        words = jnp.zeros((nwords,), jnp.uint32)
        for base_g, limit_g in metas:
            base = jax.lax.cummax(
                jnp.full((nwords,), neg, jnp.int32).at[sw].max(base_g, mode="drop")
            )
            limit = jax.lax.cummax(
                jnp.zeros((nwords,), jnp.int32).at[sw].max(limit_g, mode="drop")
            )
            vals = table[jnp.clip(base + wi + 1, 0, t_max)]
            words = words + jnp.where(wi < limit, vals, 0)

    shifts = jnp.array([24, 16, 8, 0], jnp.uint32)
    buf = ((words[:, None] >> shifts[None, :]) & 0xFF).astype(jnp.uint8)

    # Tail byte (carry source), independent of the output buffer.
    tail_w = jnp.maximum(total_bits - 1, 0) >> 5
    g_tail = last_ne[-1]
    tail_word = jnp.uint32(0)
    g = g_tail
    for _ in range(3):
        base, limit = group_meta(g)
        idx = tail_w - jnp.where(g >= 0, sw[jnp.clip(g, 0, g_count - 1)], 0)
        ok = (g >= 0) & (idx >= 0) & (idx < w_words)
        tail_word = tail_word + jnp.where(
            ok, table[jnp.clip(base + tail_w + 1, 0, t_max)], 0
        )
        g = jnp.where(g >= 0, prev_ne[jnp.clip(g, 0, g_count - 1)], -1)
    byte_in_word = (jnp.maximum(total_bits - 1, 0) >> 3) & 3
    tail_byte = (tail_word >> (8 * (3 - byte_in_word)).astype(jnp.uint32)) & 0xFF

    return (
        buf.reshape(-1)[:out_bytes],
        total_bits.astype(jnp.int32),
        tail_byte.astype(jnp.uint32),
    )


def pack_bits_np(
    code: np.ndarray, width: np.ndarray, out_bytes: int | None = None
) -> tuple[np.ndarray, int]:
    """NumPy twin of pack_bits for the host oracle / fallback (scatter-based;
    np.add.at is fine on CPU and this path has no width<=32 restriction)."""
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
