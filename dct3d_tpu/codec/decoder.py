"""Streaming GOP decoder driver.

Mirrors the C decoder's incremental refill loop (decode(), decoder.c:85-314):
compressed bytes stream in, are inflated, Exp-Golomb-decoded until a GOP
batch of coefficients is available, then inverse-transformed on the
accelerator and emitted as frames.  Geometry (width/height/frame count) is
supplied out of band exactly like the reference (no container header,
Decoder.java:17-28, main.c:27-44).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import jax
import numpy as np

from ..config import CodecConfig
from . import entropy
from .transform import TransformContext, decode_step


class StreamingDecoder:
    """Feed compressed bytes, pull decoded frame batches."""

    def __init__(
        self,
        width: int,
        height: int,
        cfg: CodecConfig | None = None,
        ctx: TransformContext | None = None,
        gops_per_batch: int = 1,
    ) -> None:
        self.cfg = cfg or CodecConfig()
        self.cfg.validate_geometry(width, height)
        self.width = width
        self.height = height
        self.ctx = ctx or TransformContext(self.cfg)
        self.source = entropy.InflateSource()
        self.gops_per_batch = gops_per_batch
        self._coeffs_per_gop = width * height * self.cfg.gop_size

    def feed(self, data: bytes) -> None:
        self.source.feed(data)

    def feed_eof(self) -> None:
        self.source.feed_eof()

    def try_decode(self) -> np.ndarray | None:
        """Decode up to gops_per_batch GOPs if buffered; (T, H, W) uint8."""
        n = self._coeffs_per_gop * self.gops_per_batch
        vals = self.source.try_read(n)
        if vals is None and self.gops_per_batch > 1:
            # Tail: fall back to single GOPs.
            vals = self.source.try_read(self._coeffs_per_gop)
        if vals is None:
            return None
        coeffs = vals.reshape(-1, self.cfg.cube_size)
        frames = decode_step(
            jax.numpy.asarray(coeffs),
            self.ctx.dec_m,
            cfg=self.cfg,
            height=self.height,
            width=self.width,
        )
        return np.asarray(frames)


def decode_video(
    data: bytes,
    width: int,
    height: int,
    frames: int,
    cfg: CodecConfig | None = None,
    ctx: TransformContext | None = None,
    gops_per_batch: int = 4,
) -> np.ndarray:
    """One-call decode of a complete bitstream -> (T, H, W) uint8.

    `frames` is truncated to a GOP multiple (Decoder.java:34-36)."""
    cfg = cfg or CodecConfig()
    t = frames - frames % cfg.gop_size
    dec = StreamingDecoder(width, height, cfg, ctx, gops_per_batch=1)
    dec.feed(data)
    dec.feed_eof()
    n_gops = t // cfg.gop_size
    coeffs_per_gop = width * height * cfg.gop_size
    # Bulk path: read all coefficients at once, decode in large device batches.
    vals = dec.source.try_read(coeffs_per_gop * n_gops)
    if vals is None:
        raise EOFError("bitstream too short for requested frame count")
    out = np.empty((t, height, width), dtype=np.uint8)
    step_gops = max(1, gops_per_batch)
    fpg = cfg.gop_size
    for g0 in range(0, n_gops, step_gops):
        g1 = min(n_gops, g0 + step_gops)
        coeffs = vals[g0 * coeffs_per_gop : g1 * coeffs_per_gop].reshape(
            -1, cfg.cube_size
        )
        frames_dev = decode_step(
            jax.numpy.asarray(coeffs),
            (ctx or dec.ctx).dec_m,
            cfg=cfg,
            height=height,
            width=width,
        )
        out[g0 * fpg : g1 * fpg] = np.asarray(frames_dev)
    return out


def decode_stream(
    chunks: Iterable[bytes],
    width: int,
    height: int,
    frames: int,
    cfg: CodecConfig | None = None,
) -> Iterator[np.ndarray]:
    """Generator: inflate+decode an iterable of compressed chunks into frame
    batches, stopping after `frames` frames (GOP-truncated)."""
    cfg = cfg or CodecConfig()
    t = frames - frames % cfg.gop_size
    dec = StreamingDecoder(width, height, cfg)
    emitted = 0
    it = iter(chunks)
    exhausted = False
    while emitted < t:
        batch = dec.try_decode()
        if batch is None:
            if exhausted:
                raise EOFError("bitstream too short for requested frame count")
            try:
                dec.feed(next(it))
            except StopIteration:
                dec.feed_eof()
                exhausted = True
            continue
        emitted += batch.shape[0]
        yield batch
