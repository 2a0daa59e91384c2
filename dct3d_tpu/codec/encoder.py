"""Streaming GOP encoder driver.

Mirrors the C encoder's structure (encode(), encoder.c:88-293): the video
streams through in fixed GOP batches, each batch is transformed on the
accelerator, entropy-coded, and deflated into one continuous zlib stream;
bit state carries across batches.  Differences, by design (SURVEY.md §7):

  * the transform + quantization + zigzag is one jitted MXU matmul
    (codec/transform.py) instead of two OpenCL reduction kernels,
  * Exp-Golomb packing happens on the device as a vectorized prefix-sum
    scatter (ops/bitpack.py) instead of a serial host bit loop,
  * device compute for batch k+1 is dispatched asynchronously while the host
    deflates batch k (JAX async dispatch gives the overlap the reference's
    blocking clEnqueueReadBuffer forfeits, encoder.c:254),
  * any number of GOPs can be batched per device step.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import jax
import numpy as np

from ..config import CodecConfig
from . import entropy
from .transform import TransformContext, encode_step


class StreamingEncoder:
    """Push frames in, get compressed bytes out.

    Usage:
        enc = StreamingEncoder(width, height, cfg)
        for batch in frame_batches:        # (T, H, W) uint8, T % gop == 0
            out.write(enc.push(batch))
        out.write(enc.finish())
    """

    def __init__(
        self,
        width: int,
        height: int,
        cfg: CodecConfig | None = None,
        ctx: TransformContext | None = None,
        device_pack: bool = True,
    ) -> None:
        self.cfg = cfg or CodecConfig()
        self.cfg.validate_geometry(width, height)
        self.width = width
        self.height = height
        self.ctx = ctx or TransformContext(self.cfg)
        self.sink = entropy.DeflateSink(self.cfg.zlib_level)
        self.device_pack = device_pack
        self.frames_encoded = 0
        self._pending = None  # in-flight device result for async overlap

    # -- internal ------------------------------------------------------------

    def _drain(self) -> bytes:
        if self._pending is None:
            return b""
        packed_dev, bits_dev = self._pending
        self._pending = None
        total_bits = int(bits_dev)
        nbytes = total_bits // 8 + 1
        packed = np.asarray(jax.device_get(packed_dev[:nbytes]))
        if nbytes > packed_dev.shape[0]:  # pragma: no cover
            raise OverflowError("bitpack buffer overflow; raise max_bytes")
        return self.sink.push_packed(packed, total_bits)

    # -- public --------------------------------------------------------------

    def push(self, frames: np.ndarray) -> bytes:
        """Encode a (T, H, W) uint8 batch; T must be a GOP multiple.

        Returns compressed bytes ready to append to the output stream (may
        be empty — DEFLATE buffers internally).
        """
        t = frames.shape[0]
        if t % self.cfg.gop_size:
            raise ValueError(
                f"batch of {t} frames is not a multiple of GOP "
                f"{self.cfg.gop_size}; truncate (reference behavior, "
                "Encoder.java:39-40) or pad upstream"
            )
        if frames.shape[1:] != (self.height, self.width):
            raise ValueError("frame geometry mismatch")
        out = b""
        if self.device_pack:
            # The carry must be merged *before* dispatching the next batch,
            # so drain the in-flight one first (its bits define the carry).
            out = self._drain()
            gop = encode_step(
                jax.numpy.asarray(frames),
                self.ctx.enc_t,
                jax.numpy.uint32(self.sink.carry_code),
                jax.numpy.int32(self.sink.carry_bits),
                max_bytes=self.ctx.max_packed_bytes(frames.size),
                cfg=self.cfg,
            )
            # Leave the result in flight; host zlib of the previous batch
            # already overlapped with this dispatch.
            self._pending = (gop.packed, gop.total_bits)
        else:
            from .transform import quantize_step

            q = np.asarray(
                quantize_step(jax.numpy.asarray(frames), self.ctx.enc_t, cfg=self.cfg)
            )
            out = self.sink.push_values(q.reshape(-1))
        self.frames_encoded += t
        return out

    def finish(self) -> bytes:
        """Flush carry + DEFLATE tail. The stream is complete after this."""
        return self._drain() + self.sink.finish()


def encode_video(
    frames: np.ndarray,
    cfg: CodecConfig | None = None,
    ctx: TransformContext | None = None,
    gops_per_batch: int = 1,
) -> bytes:
    """One-call encode of an in-memory (T, H, W) uint8 video.

    Frame count is truncated to a GOP multiple (Encoder.java:39-40)."""
    cfg = cfg or CodecConfig()
    t = frames.shape[0] - frames.shape[0] % cfg.gop_size
    frames = frames[:t]
    enc = StreamingEncoder(frames.shape[2], frames.shape[1], cfg, ctx)
    step = cfg.gop_size * gops_per_batch
    chunks = []
    for i in range(0, t, step):
        chunks.append(enc.push(frames[i : i + min(step, t - i)]))
    chunks.append(enc.finish())
    return b"".join(chunks)


def encode_stream(
    batches: Iterable[np.ndarray],
    width: int,
    height: int,
    cfg: CodecConfig | None = None,
) -> Iterator[bytes]:
    """Generator: encode an iterable of frame batches into stream chunks."""
    enc = StreamingEncoder(width, height, cfg)
    for batch in batches:
        yield enc.push(batch)
    yield enc.finish()
