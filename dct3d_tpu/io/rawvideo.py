"""Raw video file I/O.

Format (reference, SURVEY.md §1 data formats): headerless sequences of
row-major frames — 1 byte/pixel grayscale for the codec (Encoder.java:47-56,
encoder.c:10-45), 3 bytes/pixel interleaved RGB for the capture/playback
tools (CaptureScreen.java:119-147, RenderVideo.java:57-76).  All geometry is
supplied out of band.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np


def frame_count(path: str, width: int, height: int, channels: int = 1) -> int:
    return os.path.getsize(path) // (width * height * channels)


def read_video(
    path: str,
    width: int,
    height: int,
    frames: int | None = None,
    channels: int = 1,
) -> np.ndarray:
    """Whole file -> (T, H, W) or (T, H, W, C) uint8."""
    fsize = width * height * channels
    total = frame_count(path, width, height, channels)
    t = total if frames is None else min(frames, total)
    with open(path, "rb") as f:
        buf = np.fromfile(f, dtype=np.uint8, count=t * fsize)
    if channels == 1:
        return buf.reshape(t, height, width)
    return buf.reshape(t, height, width, channels)


def write_video(path: str, frames: np.ndarray) -> None:
    np.ascontiguousarray(frames, dtype=np.uint8).tofile(path)


def iter_frame_batches(
    path: str,
    width: int,
    height: int,
    batch_frames: int,
    max_frames: int | None = None,
    channels: int = 1,
    align: int | None = None,
    start: int = 0,
) -> Iterator[np.ndarray]:
    """Stream a raw file in frame batches (the C codec's chunked read,
    encoder.c:203-278).

    The total is trimmed to a multiple of `align` (default: batch_frames) —
    pass the GOP size to keep a GOP-aligned partial tail batch instead of
    dropping it, matching the reference's truncate-to-GOP behavior
    (Encoder.java:39-40).  `start` skips that many leading frames
    (checkpoint resume).
    """
    fsize = width * height * channels
    total = frame_count(path, width, height, channels)
    if max_frames is not None:
        total = min(total, max_frames)
    total -= total % (align or batch_frames)
    with open(path, "rb") as f:
        f.seek(start * fsize)
        done = start
        while done < total:
            n = min(batch_frames, total - done)
            buf = np.fromfile(f, dtype=np.uint8, count=n * fsize)
            done += n
            shape = (n, height, width) if channels == 1 else (n, height, width, channels)
            yield buf.reshape(shape)
