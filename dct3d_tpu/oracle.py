"""Float64 NumPy oracle: a from-scratch, slow-but-exact model of the
reference codec's math, used as the parity surface for tests and baselines.

This is NOT the production path — it exists because the reference ships no
tests (SURVEY.md §4) and no longer runnable here (Java/OpenCL), so the
framework needs an independent, double-precision executable spec of:
  frames -> cubes -> 3D DCT -> quantize -> zigzag -> Exp-Golomb -> zlib
to assert (a) quantized-integer parity and (b) byte parity of the entropy
stream (SURVEY.md §4 items 1-3).

It reuses only layout/format *constants* (zigzag tables, basis, divisors) from
the ops modules — all compute here is plain float64 NumPy + Python bit I/O.
"""

from __future__ import annotations

import zlib

import numpy as np

from .config import CodecConfig
from .ops import dct, expgolomb, quant, zigzag


def _round_half_away(x: np.ndarray, bias: float = 0.5) -> np.ndarray:
    """q = sign(x)*floor(|x| + bias).  bias=0.5 is C round()/roundf()
    semantics (half away from zero), the behavior of the accelerated
    reference (encoder.c:53).  Java's Math.round is half-up and differs
    only at exact negative .5 ties (SURVEY.md §7 quirks)."""
    return np.trunc(x + np.copysign(bias, x))


def _cubes(frames: np.ndarray, cfg: CodecConfig) -> np.ndarray:
    t, h, w = frames.shape
    bd, bh, bw = cfg.block_d, cfg.block_h, cfg.block_w
    x = frames.reshape(t // bd, bd, h // bh, bh, w // bw, bw)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(-1, bd * bh * bw).astype(np.float64)


def _uncubes(cubes: np.ndarray, cfg: CodecConfig, h: int, w: int) -> np.ndarray:
    bd, bh, bw = cfg.block_d, cfg.block_h, cfg.block_w
    nbh, nbw = h // bh, w // bw
    gops = cubes.shape[0] // (nbh * nbw)
    x = cubes.reshape(gops, nbh, nbw, bd, bh, bw)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(gops * bd, h, w)


def quantized_coefficients(frames: np.ndarray, cfg: CodecConfig) -> np.ndarray:
    """(num_cubes, cube) int32 quantized coefficients in zigzag order."""
    cubes = _cubes(frames, cfg)
    m3d = dct._dct3d_dense(cfg.block_w, cfg.block_h, cfg.block_d)
    coeff = cubes @ m3d.T
    div = quant.quant_divisors(
        cfg.block_w, cfg.block_h, cfg.block_d, cfg.quant_strength
    )
    q = _round_half_away(coeff / div[None, :], cfg.quant_bias).astype(np.int32)
    perm = zigzag.zigzag_flat_indices(cfg.block_w, cfg.block_h, cfg.block_d)
    return q[:, perm]


def expgolomb_bytes(coeffs_zigzag: np.ndarray) -> tuple[bytes, int]:
    """Serial Exp-Golomb pack of zigzag-ordered coefficients.

    Returns (packed bytes incl. zero-padded partial byte, bit length)."""
    w = expgolomb.SerialWriter()
    for v in coeffs_zigzag.reshape(-1).tolist():
        w.write(int(v))
    return w.getvalue(), w.bit_length


def encode(frames: np.ndarray, cfg: CodecConfig | None = None) -> bytes:
    """Full oracle encode: frames (T, H, W) uint8 -> zlib bitstream.

    Matches the Java encoder's one-shot structure (Encoder.java:113-125):
    one DEFLATE stream over the whole Exp-Golomb buffer including the final
    partial byte."""
    cfg = cfg or CodecConfig()
    t = frames.shape[0] - frames.shape[0] % cfg.gop_size
    frames = frames[:t]
    q = quantized_coefficients(frames, cfg)
    payload, nbits = expgolomb_bytes(q)
    if nbits % 8 == 0:
        # The reference always deflates bufferPosition+1 bytes, i.e. one byte
        # past the last complete one (Encoder.java:117, encoder.c:270).
        payload += b"\x00"
    return zlib.compress(payload, cfg.zlib_level)


def decode(
    data: bytes, width: int, height: int, frames: int, cfg: CodecConfig | None = None
) -> np.ndarray:
    """Full oracle decode: bitstream -> (T, H, W) uint8 frames."""
    cfg = cfg or CodecConfig()
    t = frames - frames % cfg.gop_size
    payload = zlib.decompress(data)
    reader = expgolomb.SerialReader(payload)
    n = width * height * t
    vals = np.fromiter((reader.read() for _ in range(n)), np.int32, n)
    ncubes = n // cfg.cube_size
    vals = vals.reshape(ncubes, cfg.cube_size).astype(np.float64)

    div = quant.quant_divisors(
        cfg.block_w, cfg.block_h, cfg.block_d, cfg.quant_strength
    )
    perm = zigzag.zigzag_flat_indices(cfg.block_w, cfg.block_h, cfg.block_d)
    m3d = dct._dct3d_dense(cfg.block_w, cfg.block_h, cfg.block_d)
    dequant = vals * div[perm][None, :]
    pixels = dequant @ m3d[perm]  # x[n] = sum_i v[i] * M[perm[i], n]
    pixels = np.clip(pixels, 0.0, 255.0)
    return _uncubes(pixels, cfg, height, width).astype(np.uint8)
