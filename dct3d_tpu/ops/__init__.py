"""Compute ops: DCT matrices, quantization, zigzag, Exp-Golomb, bit packing."""
