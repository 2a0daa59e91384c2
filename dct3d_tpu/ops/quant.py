"""Analytic quantization function.

The reference divides each coefficient by ``max(1, q * (i + j + k))`` where
(i, j, k) are the intra-cube coordinates and q = 5, then rounds
(reference: Encoder.java:75-89, encoder.c:47-58); the decoder multiplies back
(Decoder.java:82-96, decoder.c:48-59).  The DC coefficient passes unscaled via
the ``max(1, .)`` floor.

On TPU the divisor never exists as a runtime op: its reciprocal is folded into
the encode matrix and the divisor itself into the decode matrix (ops/dct.py),
so quantization costs zero FLOPs beyond the transform matmul.

Note: because the quantized values are integers and the divisors are integers,
the reference's dequantization ``round(v * divisor)`` is exactly ``v * divisor``
— the round is a no-op we do not reproduce at runtime.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def quant_divisors(
    width: int, height: int, depth: int, strength: int
) -> np.ndarray:
    """float64 divisor cube, flat layout [z][y][x] (x fastest).

    divisor[z, y, x] = max(1, strength * (x + y + z)), per Encoder.java:82.
    """
    x = np.arange(width)[None, None, :]
    y = np.arange(height)[None, :, None]
    z = np.arange(depth)[:, None, None]
    d = np.maximum(1, strength * (x + y + z)).astype(np.float64)
    return np.broadcast_to(d, (depth, height, width)).reshape(-1)
