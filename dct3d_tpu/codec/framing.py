"""Frame-major <-> cube-major repacking.

The reference repacks frame-major bytes into cube-contiguous layout at the I/O
boundaries (readCubes, encoder.c:10-45; writeCubes, decoder.c:10-46): cubes
are enumerated block-row-major over the frame (y blocks outer, x blocks
inner), and within a cube the layout is [frame][row][col].  The Java encoder
uses the same traversal for quantization/entropy order (Encoder.java:75-89).

Here the repack is a reshape + transpose executed on device (no host loops);
XLA lowers it to a single relayout copy fused with the adjacent convert.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import CodecConfig


def frames_to_cubes(frames, cfg: CodecConfig):
    """(T, H, W) -> (num_cubes, cube_size) in bitstream cube order.

    T must be a multiple of the GOP size.  Cube order: GOP-major, then block
    row, then block column (matches encoder.c:29-33 per GOP and the Java
    whole-video loop Encoder.java:75-77).  Intra-cube: [frame][row][col].
    """
    t, h, w = frames.shape
    bd, bh, bw = cfg.block_d, cfg.block_h, cfg.block_w
    assert t % bd == 0, f"frame count {t} not a multiple of GOP {bd}"
    cfg.validate_geometry(w, h)
    x = frames.reshape(t // bd, bd, h // bh, bh, w // bw, bw)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (gop, by, bx, k, i, j)
    return x.reshape(-1, bd * bh * bw)


def cubes_to_frames(cubes, cfg: CodecConfig, height: int, width: int):
    """Inverse of frames_to_cubes: (num_cubes, cube_size) -> (T, H, W)."""
    bd, bh, bw = cfg.block_d, cfg.block_h, cfg.block_w
    nbh, nbw = height // bh, width // bw
    gops = cubes.shape[0] // (nbh * nbw)
    x = cubes.reshape(gops, nbh, nbw, bd, bh, bw)
    x = x.transpose(0, 3, 1, 4, 2, 5)  # (gop, k, by, i, bx, j)
    return x.reshape(gops * bd, height, width)
