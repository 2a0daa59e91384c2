"""Headless rendering / inspection of raw video.

The reference plays raw RGB in a Swing window (RenderVideo.java:14-122);
a TPU host has no display, so this renders frames to PNG (via matplotlib if
present, else a minimal built-in PNG writer) and prints stream statistics —
the observability the reference lacks (SURVEY.md §5 metrics).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from . import rawvideo


def _write_png(path: str, img: np.ndarray) -> None:
    """Minimal PNG writer for grayscale or RGB uint8 images (no deps)."""
    if img.ndim == 2:
        color_type, nch = 0, 1
        raw = img[:, :, None]
    else:
        color_type, nch = 2, 3
        raw = img
    h, w = raw.shape[:2]
    scanlines = b"".join(
        b"\x00" + raw[y].astype(np.uint8).tobytes() for y in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def render_frames(
    path: str,
    width: int,
    height: int,
    out_prefix: str,
    frames: list[int] | None = None,
    channels: int = 1,
) -> list[str]:
    """Export selected frames of a raw video to PNG files."""
    video = rawvideo.read_video(path, width, height, channels=channels)
    sel = frames or [0, video.shape[0] // 2, video.shape[0] - 1]
    outs = []
    for idx in sel:
        idx = max(0, min(video.shape[0] - 1, idx))
        out = f"{out_prefix}_f{idx:05d}.png"
        _write_png(out, video[idx])
        outs.append(out)
    return outs


def video_stats(path: str, width: int, height: int, channels: int = 1) -> dict:
    video = rawvideo.read_video(path, width, height, channels=channels)
    return {
        "frames": int(video.shape[0]),
        "width": width,
        "height": height,
        "channels": channels,
        "mean": float(video.mean()),
        "std": float(video.std()),
        "min": int(video.min()),
        "max": int(video.max()),
    }
