"""Color (interleaved RGB) convenience codec.

The reference handles color by hand: CaptureScreen emits interleaved RGB
(CaptureScreen.java:135-147), RGBUtils splits it into three planar files
(RGBUtils.java:39-90), each channel runs through the grayscale codec
separately, and RGBUtils.mix reassembles (README.md:22-27).  This module
automates that chain: the three channel planes are encoded as three members
of the D3MH container (R, G, B order), so one file carries a color clip and
decodes on any host without the split/mix shuffle.  The per-channel payload
is the unmodified grayscale bitstream.
"""

from __future__ import annotations

import numpy as np

from ..config import CodecConfig
from .decoder import decode_video
from .encoder import encode_video
from .transform import TransformContext


def encode_rgb_video(
    frames: np.ndarray,
    cfg: CodecConfig | None = None,
    ctx: TransformContext | None = None,
    index: bool = False,
    mesh=None,
) -> bytes:
    """(T, H, W, 3) uint8 interleaved RGB -> D3MH container (3 members,
    tagged MEMBER_RED/GREEN/BLUE so decode auto-routes without a flag).

    index=True follows each channel member with its seekable per-GOP bit
    index member (docs/FORMAT.md), enabling scan-free GOP-parallel entropy
    decode per channel.

    mesh: optional (gop, tile) device mesh — each channel stream is then
    produced by ShardedEncoder, BYTE-IDENTICAL to the single-device member
    (sharding.py invariant), so the container needs no mesh flag to decode.
    Frames truncate to whole mesh steps (gop_size * mesh.gop)."""
    from ..parallel.multihost import (
        MEMBER_BLUE, MEMBER_GREEN, MEMBER_RED, _member, make_index_member,
    )
    from .encoder import StreamingEncoder

    cfg = cfg or CodecConfig()
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError("expected (T, H, W, 3) interleaved RGB")
    align = cfg.gop_size if mesh is None else cfg.gop_size * mesh.shape["gop"]
    t = frames.shape[0] - frames.shape[0] % align
    if t == 0:
        raise ValueError(f"input shorter than one {align}-frame step")
    out = []
    for c, mtype in enumerate((MEMBER_RED, MEMBER_GREEN, MEMBER_BLUE)):
        plane = np.ascontiguousarray(frames[:t, :, :, c])
        if mesh is not None:
            from ..parallel.sharding import ShardedEncoder

            enc = ShardedEncoder(
                plane.shape[2], plane.shape[1], mesh, cfg, ctx
            )
        elif index:
            enc = StreamingEncoder(plane.shape[2], plane.shape[1], cfg, ctx)
        else:
            out.append(_member(encode_video(plane, cfg, ctx), t, mtype))
            continue
        data = enc.push(plane) + enc.finish()
        out.append(_member(data, t, mtype))
        if index:
            out.append(make_index_member(
                enc.gop_bit_ends,
                sync_offsets=getattr(enc, "gop_sync_offsets", None),
            ))
    return b"".join(out)


def _collect_channels(members):
    """Channel members with their index members attached (type 4 describes
    the member preceding it); validates the 3-channel shape and tags."""
    from ..parallel.multihost import (
        IndexInfo, MEMBER_INDEX, container_kind, parse_index,
        parse_index_syncs,
    )

    channels: list[tuple[int, bytes, "IndexInfo"]] = []
    for frames, payload, mtype in members:
        if mtype == MEMBER_INDEX and channels:
            f, p, _ = channels[-1]
            channels[-1] = (f, p, IndexInfo(
                parse_index(payload), parse_index_syncs(payload)
            ))
        elif mtype != MEMBER_INDEX:
            channels.append((frames, payload, IndexInfo(None, None)))
    if len(channels) != 3:
        raise ValueError(f"expected 3 channel members, found {len(channels)}")
    # kind == 'temporal' (all-zero tags): legacy (round-1) RGB container
    # predating type tags — caller asked for RGB and it has exactly 3
    # members, so honor it.
    if container_kind(members) == "unknown":
        raise ValueError(
            f"unexpected member type tags {[m[2] for m in members]}; "
            "not an RGB container"
        )
    return channels


def decode_rgb_video(
    data: bytes,
    width: int,
    height: int,
    cfg: CodecConfig | None = None,
    ctx: TransformContext | None = None,
) -> np.ndarray:
    """D3MH container (3 members) -> (T, H, W, 3) uint8 interleaved RGB."""
    from ..parallel.multihost import gop_positions, split_members

    cfg = cfg or CodecConfig()
    channels = _collect_channels(split_members(data))
    planes = [
        decode_video(
            payload, width, height, frames, cfg, ctx,
            positions=None if idx.ends is None else gop_positions(
                idx.ends, frames // cfg.gop_size, cfg.gop_size, frames
            ),
            sync_offsets=idx.syncs,
        )
        for frames, payload, idx in channels
    ]
    return np.stack(planes, axis=-1)


def decode_rgb_range(
    data: bytes,
    width: int,
    height: int,
    start: int,
    stop: int,
    cfg: CodecConfig | None = None,
    ctx: TransformContext | None = None,
) -> np.ndarray:
    """Random-access decode of frames [start, stop) from an RGB container
    -> (stop-start, H, W, 3): each channel member decodes only its
    covering GOPs (codec.decoder.decode_frame_range; scan-free when the
    channel carries an index member)."""
    from .decoder import decode_frame_range
    from ..parallel.multihost import gop_positions, split_members

    cfg = cfg or CodecConfig()
    if not (0 <= start < stop):
        raise ValueError(f"bad frame range [{start}, {stop})")
    channels = _collect_channels(split_members(data))
    total = min(f for f, _, _ in channels)
    if stop > total:
        raise EOFError(
            f"container holds {total} frames, range [{start}, {stop}) "
            "reaches past the end"
        )
    planes = [
        decode_frame_range(
            payload, width, height, start, stop, cfg, ctx,
            positions=None if idx.ends is None else gop_positions(
                idx.ends, frames // cfg.gop_size, cfg.gop_size, frames
            ),
            sync_offsets=idx.syncs,
        )
        for frames, payload, idx in channels
    ]
    return np.stack(planes, axis=-1)
