"""Signed Exp-Golomb code: vectorized codeword math + serial reference codec.

Bit format (reference: ExpGolombWriter.java:19-49, ExpGolomb.c:32-64):
  signed->unsigned mapping  m = 2v-1 if v > 0 else -2v
  code number               c = m + 1          (so c >= 1)
  emitted bits              (bitlen(c) - 1) zero bits, then c in bitlen(c)
                            bits, MSB first
which is equivalent to: c written MSB-first in a field of width
``2*bitlen(c) - 1`` bits.  The stream is a plain MSB-first bit concatenation.

The vectorized functions below compute (code, width) pairs for whole
coefficient batches; ops/bitpack.py turns those into packed bytes on device.
The serial Python writer/reader here is the byte-exactness oracle for tests
(the production host path is the C codec in native/, and the production
device path never materializes bits serially at all).
"""

from __future__ import annotations

import numpy as np

try:  # jax is optional at import time so the numpy oracle works standalone
    import jax.numpy as jnp
    from jax import lax
except ImportError:  # pragma: no cover
    jnp = None
    lax = None


# ----------------------------------------------------------------------------
# Vectorized codeword math (JAX, device-side)
# ----------------------------------------------------------------------------


def codewords(values):
    """values (int32) -> (code uint32, width int32).

    code is the Exp-Golomb code number; width = 2*bitlen(code) - 1 is the
    total emitted bit count including the leading zeros.  The code number's
    MSB-first representation in `width` bits IS the emitted bit pattern
    (the top width - bitlen bits are the zeros).
    """
    v = values.astype(jnp.int32)
    mapped = jnp.where(v > 0, 2 * v - 1, -2 * v)
    code = (mapped + 1).astype(jnp.uint32)
    nbits = 32 - lax.clz(code).astype(jnp.int32)
    width = 2 * nbits - 1
    return code, width


def codewords_np(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """NumPy twin of codewords() for the host oracle."""
    v = values.astype(np.int64)
    mapped = np.where(v > 0, 2 * v - 1, -2 * v)
    code = (mapped + 1).astype(np.uint64)
    nbits = np.zeros(code.shape, dtype=np.int64)
    c = code.copy()
    while np.any(c):
        nbits += c != 0
        c >>= 1
    width = 2 * nbits - 1
    return code.astype(np.uint32), width.astype(np.int32)


def decode_mapped(code):
    """Inverse of the signed mapping: code number -> signed value (JAX)."""
    m = code.astype(jnp.int32) - 1
    return jnp.where(m % 2 != 0, (m + 1) // 2, -(m // 2))


def decode_mapped_np(code: np.ndarray) -> np.ndarray:
    m = code.astype(np.int64) - 1
    return np.where(m % 2 != 0, (m + 1) // 2, -(m // 2)).astype(np.int32)


# ----------------------------------------------------------------------------
# Serial bit-exact reference codec (host oracle; mirrors the reference format)
# ----------------------------------------------------------------------------


class SerialWriter:
    """Bit-serial MSB-first writer; format oracle for tests.

    Independent re-derivation of the stream format defined by
    ExpGolombWriter.java:19-49 (state = current byte index + bit position).
    """

    def __init__(self) -> None:
        self._bits: list[int] = []

    def write(self, value: int) -> None:
        mapped = 2 * value - 1 if value > 0 else -2 * value
        code = mapped + 1
        nbits = code.bit_length()
        width = 2 * nbits - 1
        for i in range(width - 1, -1, -1):
            self._bits.append((code >> i) & 1)

    @property
    def bit_length(self) -> int:
        return len(self._bits)

    def getvalue(self) -> bytes:
        """Packed bytes; trailing partial byte zero-padded (as the reference
        writes bufferPosition + 1 bytes, Encoder.java:117, encoder.c:270)."""
        out = bytearray((len(self._bits) + 7) // 8)
        for i, b in enumerate(self._bits):
            if b:
                out[i >> 3] |= 0x80 >> (i & 7)
        return bytes(out)


class SerialReader:
    """Bit-serial MSB-first reader (format of ExpGolombReader.java:19-63)."""

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0  # bit position

    @property
    def bit_position(self) -> int:
        return self._pos

    def _bit(self) -> int:
        byte = self._data[self._pos >> 3]
        bit = (byte >> (7 - (self._pos & 7))) & 1
        self._pos += 1
        return bit

    def read(self) -> int:
        zeros = 0
        while self._bit() == 0:
            zeros += 1
        code = 1
        for _ in range(zeros):
            code = (code << 1) | self._bit()
        m = code - 1
        return (m + 1) // 2 if m % 2 != 0 else -(m // 2)
