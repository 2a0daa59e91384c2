"""Format-sniffing one-call decode: the library twin of `cli.py decode`.

The framework writes several on-disk forms (docs/FORMAT.md): the raw
reference-compatible zlib stream, D3MH containers of temporal / RGB /
turbo / turbo-RGB members, optionally with index members.  ``decode_auto``
routes by content exactly like the CLI so library users don't have to.
"""

from __future__ import annotations

import numpy as np

from ..config import CodecConfig
from ..parallel.multihost import MEMBER_MAGIC


def decode_auto(
    data: bytes,
    width: int,
    height: int,
    frames: int | None = None,
    cfg: CodecConfig | None = None,
) -> np.ndarray:
    """Decode any framework output -> (T, H, W) or (T, H, W, 3) uint8.

    ``frames`` is required only for the headerless raw stream (exactly the
    CLI's rule); containers are self-describing and ``frames`` then just
    truncates the result.
    """
    from ..parallel.multihost import decode_multihost_container, split_members
    from .decoder import decode_video
    from .rgb_codec import decode_rgb_video
    from .turbo import (
        decode_turbo_container, decode_turbo_rgb_video,
        is_turbo_container, is_turbo_rgb_container,
    )

    cfg = cfg or CodecConfig()
    if data[:4] != MEMBER_MAGIC:
        if frames is None:
            raise ValueError(
                "raw streams are headerless (Decoder.java:18): pass the "
                "frame count, or encode with --index for a self-describing "
                "container"
            )
        return decode_video(data, width, height, frames, cfg)
    members = split_members(data)
    if is_turbo_container(members):
        out = decode_turbo_container(data, width, height, cfg)
    elif is_turbo_rgb_container(members):
        out = decode_turbo_rgb_video(data, width, height, cfg)
    else:
        from ..parallel.multihost import container_kind

        kind = container_kind(members)
        if kind == "rgb":
            out = decode_rgb_video(data, width, height, cfg)
        elif kind == "temporal":
            out = decode_multihost_container(data, width, height, cfg)
        else:
            raise ValueError(
                f"unrecognized member type tags {[m[2] for m in members]}"
            )
    return out if frames is None else out[:frames]


def decode_auto_range(
    data: bytes,
    width: int,
    height: int,
    start: int,
    stop: int,
    cfg: CodecConfig | None = None,
    positions: list[int] | None = None,
) -> np.ndarray:
    """Random-access twin of decode_auto: frames [start, stop) from any
    framework output, routed by content exactly like ``cli.py decode
    --range`` — only the covering GOPs/members run (see
    decoder.decode_frame_range).  Raw headerless streams need no frame
    count here: the range bounds the work, EOFError past the end.

    Legacy all-zero-tag 3-member RGB containers are indistinguishable
    from 3-span temporal containers without the CLI's --rgb flag; they
    decode as concatenated temporal spans here, same as decode_auto.
    """
    from ..parallel.multihost import decode_container_range, split_members
    from .decoder import decode_frame_range
    from .rgb_codec import decode_rgb_range
    from .turbo import (
        decode_turbo_range, decode_turbo_rgb_range,
        is_turbo_container, is_turbo_rgb_container,
    )

    cfg = cfg or CodecConfig()
    if data[:4] != MEMBER_MAGIC:
        # `positions` (e.g. an .idx sidecar next to a raw parity stream)
        # makes the prefix skip scan-free; containers carry their own.
        return decode_frame_range(data, width, height, start, stop, cfg,
                                  positions=positions)
    members = split_members(data)
    if is_turbo_container(members):
        return decode_turbo_range(data, width, height, start, stop, cfg)
    if is_turbo_rgb_container(members):
        return decode_turbo_rgb_range(data, width, height, start, stop, cfg)
    from ..parallel.multihost import container_kind

    kind = container_kind(members)
    if kind == "rgb":
        return decode_rgb_range(data, width, height, start, stop, cfg)
    if kind == "temporal":
        return decode_container_range(data, width, height, start, stop, cfg)
    raise ValueError(
        f"unrecognized member type tags {[m[2] for m in members]}"
    )
