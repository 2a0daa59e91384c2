"""Turbo (planar) profile: DEFLATE-only entropy, no Exp-Golomb anywhere.

The reference's entropy stack (Exp-Golomb + zlib) is inherently bit-serial
on the host side; the repo's device bit-packer makes ENCODE parallel, but
host decode still walks codewords.  The turbo profile is the TPU-native
alternative: the wire carries exactly the codec's device transport format —
a packed-nibble plane of quantized zigzag coefficients plus a sparse
exception list — DEFLATE-compressed per GOP.  Consequences:

  * encode: the device step is transform + nibble pack + MXU exception
    compaction (ops/exceptions.py) — the whole Exp-Golomb bit-pack stage
    (~60% of the reference-profile step) disappears;
  * decode: the host does nothing but inflate (GOP-parallel across
    members); planes feed decode_step_planar4 directly;
  * pixels are IDENTICAL to the reference profile (same quantized
    integers, same inverse transform) — only the container differs;
  * rate: ~3% more bytes than Exp-Golomb+zlib at quant 5 on the bench
    content (0.3225 vs 0.3123 bpp; measurements in PERFORMANCE.md) —
    DEFLATE eats most of the nibble plane's redundancy.  The gap widens
    at low quant (wider coefficients; `sweep --turbo` reports both).

Wire format (docs/FORMAT.md): one D3MH member (type 5) per GOP; payload =
three length-prefixed zlib streams (nibble plane, exception-index deltas
int32, exception values int16).

The reference cannot read this container — it is an explicit extension
profile (`encode --turbo`), not the default.
"""

from __future__ import annotations

import collections
import functools
import struct
import zlib
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CodecConfig
from ..ops import exceptions
from ..parallel.multihost import MEMBER_INDEX, _member, split_members
from .transform import TransformContext, _frames_to_q
from .decoder import _dispatch_planar4, _undelta

MEMBER_TURBO = 5
#: turbo RGB channel members (red, green, blue), one per GOP per channel
MEMBER_TURBO_RGB = (6, 7, 8)


def _plane_and_tables(q, slots: int):
    """Shared back half of every turbo encode path: coefficients ->
    (nibble plane, exception tables).  One body so the single-device and
    sharded encoders cannot drift apart (their byte-identity is pinned)."""
    v2 = q.reshape(-1, 2)
    plane = ((v2[:, 0] & 0xF) | ((v2[:, 1] & 0xF) << 4)).astype(jnp.uint8)
    lidx, vals, counts, overflow = exceptions.compact_exceptions(
        q.reshape(-1), slots=slots
    )
    return plane, lidx, vals, counts, overflow


@functools.partial(jax.jit, static_argnames=("cfg", "slots"))
def encode_step_turbo(frames, enc_t, *, cfg, slots):
    """(T, H, W) uint8 -> (nibble plane, exception tables).

    plane: (n/2,) uint8, two zigzag coefficients per byte (low nibble =
    even index) — byte-identical to the decode transport format.
    """
    return _plane_and_tables(_frames_to_q(frames, enc_t, cfg), slots)


def _member_payload(plane: np.ndarray, idx: np.ndarray, val: np.ndarray,
                    level: int) -> bytes:
    """Three length-prefixed zlib streams; exception indices as deltas
    (sorted ascending, so deltas are small and compress ~7x better)."""
    didx = np.diff(idx, prepend=np.int64(0)).astype(np.int32)
    parts = [
        zlib.compress(plane.tobytes(), level),
        zlib.compress(didx.tobytes(), level),
        zlib.compress(val.astype(np.int16).tobytes(), level),
    ]
    head = struct.pack("<III", *(len(p) for p in parts))
    return head + b"".join(parts)


def _parse_payload(payload: bytes):
    a, b, c = struct.unpack_from("<III", payload, 0)
    o = 12
    plane = np.frombuffer(zlib.decompress(payload[o : o + a]), np.uint8)
    didx = np.frombuffer(zlib.decompress(payload[o + a : o + a + b]),
                         np.int32)
    val = np.frombuffer(
        zlib.decompress(payload[o + a + b : o + a + b + c]), np.int16
    )
    return plane, np.cumsum(didx.astype(np.int64)), val.astype(np.int32)


class TurboEncoder:
    """Push frames, get turbo container bytes (one type-5 member per GOP).

    Same pipelining shape as StreamingEncoder: per-GOP device dispatch, a
    drainer thread overlapping D2H + DEFLATE with compute, and a
    slots-budget overflow retry (exception-dense groups re-encode with the
    cannot-overflow table shape).
    """

    def __init__(
        self,
        width: int,
        height: int,
        cfg: CodecConfig | None = None,
        ctx: TransformContext | None = None,
        slots: int = exceptions.DEFAULT_SLOTS,
        max_inflight: int = 6,
        member_type: int = MEMBER_TURBO,
    ) -> None:
        from .entropy import resolve_workers

        self.member_type = member_type
        self.cfg = cfg or CodecConfig()
        self.cfg.validate_geometry(width, height)
        self.width = width
        self.height = height
        self.ctx = ctx or TransformContext(self.cfg)
        self.slots = slots
        self.frames_encoded = 0
        self.max_inflight = max_inflight
        # Unlike the reference stream's single zlib state, turbo members are
        # independent — the drain stage (D2H + DEFLATE) fans out across
        # cores; output order is preserved by the futures deque regardless
        # of completion order.
        self._drainer = ThreadPoolExecutor(
            max_workers=resolve_workers(self.cfg.deflate_workers)
        )
        self._out: collections.deque = collections.deque()

    def _drain_gop(self, frames_dev, t) -> bytes:
        plane, lidx, vals, counts, overflow = encode_step_turbo(
            frames_dev, self.ctx.enc_t, cfg=self.cfg, slots=self.slots
        )
        if bool(overflow):
            plane, lidx, vals, counts, _ = encode_step_turbo(
                frames_dev, self.ctx.enc_t, cfg=self.cfg, slots=256
            )
        idx, val = exceptions.expand_exceptions_np(
            np.asarray(lidx), np.asarray(vals), np.asarray(counts)
        )
        payload = _member_payload(
            np.asarray(plane), idx, val, self.cfg.zlib_level
        )
        return _member(payload, t, self.member_type)

    def push(self, frames: np.ndarray) -> bytes:
        t = frames.shape[0]
        if t % self.cfg.gop_size:
            raise ValueError(
                f"batch of {t} frames is not a multiple of GOP "
                f"{self.cfg.gop_size}"
            )
        if frames.shape[1:] != (self.height, self.width):
            raise ValueError("frame geometry mismatch")
        gop = self.cfg.gop_size
        for i in range(0, t, gop):
            batch = frames[i : i + gop]
            if self.cfg.transport_delta:
                delta = np.empty_like(batch)
                delta[0] = batch[0]
                np.subtract(batch[1:], batch[:-1], out=delta[1:])
                batch = delta
            frames_dev = jnp.asarray(batch)
            self._out.append(
                self._drainer.submit(self._drain_gop, frames_dev, gop)
            )
            if len(self._out) > self.max_inflight:
                self._out[0].result()
        self.frames_encoded += t
        out = []
        while self._out and self._out[0].done():
            out.append(self._out.popleft().result())
        return b"".join(out)

    def drain(self) -> bytes:
        """Block for every in-flight member and return its bytes (the
        checkpointing encoder calls this before fsync so its durability
        bound is real, not max_inflight members behind)."""
        out = []
        while self._out:
            out.append(self._out.popleft().result())
        return b"".join(out)

    def finish(self) -> bytes:
        out = self.drain()
        self._drainer.shutdown(wait=True)
        return out


def encode_turbo_video(
    frames: np.ndarray,
    cfg: CodecConfig | None = None,
    ctx: TransformContext | None = None,
) -> bytes:
    cfg = cfg or CodecConfig()
    t = frames.shape[0] - frames.shape[0] % cfg.gop_size
    enc = TurboEncoder(frames.shape[2], frames.shape[1], cfg, ctx)
    data = enc.push(frames[:t])
    return data + enc.finish()


class TurboShardedEncoder:
    """Turbo encode over a (gop, tile) device mesh; output byte-identical
    to the single-device TurboEncoder.

    Far simpler than the reference profile's sharded packer: turbo has no
    bit phases — shard rank order IS global value order (GOP-major, then
    block-row tiles), so the gathered plane slices per GOP directly, and
    the gathered (group, slot) exception tables are already globally
    ordered (groups are value-order contiguous).  No cross-shard
    collectives at all except the overflow psum.
    """

    def __init__(self, width, height, mesh, cfg=None, ctx=None,
                 slots: int = exceptions.DEFAULT_SLOTS):
        from jax.sharding import NamedSharding, PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map

        from ..parallel.mesh import GOP_AXIS, TILE_AXIS

        self.cfg = cfg or CodecConfig()
        self.cfg.validate_geometry(width, height)
        self.width = width
        self.height = height
        self.mesh = mesh
        self.ctx = ctx or TransformContext(self.cfg)
        self.slots = slots
        n_gop, n_tile = mesh.shape[GOP_AXIS], mesh.shape[TILE_AXIS]
        if height % (self.cfg.block_h * n_tile):
            raise ValueError(
                f"height {height} must split into {n_tile} tiles of whole "
                f"{self.cfg.block_h}-pixel block rows"
            )
        self._mesh_shape = (n_gop, n_tile)
        self._sharding = NamedSharding(mesh, P(GOP_AXIS, TILE_AXIS, None))
        # push() ships RAW frames to the shards (like the reference-profile
        # ShardedEncoder; the CLI notes that --transport-delta is a
        # single-device upload optimization), so the shard body must not
        # run _frames_to_q's un-delta scan.
        import dataclasses as _dc

        cfg_ = _dc.replace(self.cfg, transport_delta=False)

        def _shard(frames, enc_t, *, slots):
            import jax as _jax

            plane, lidx, vals, counts, ovf = _plane_and_tables(
                _frames_to_q(frames, enc_t, cfg_), slots
            )
            any_ovf = _jax.lax.psum(
                ovf.astype(jnp.int32), (GOP_AXIS, TILE_AXIS)
            ) > 0
            return plane[None], lidx[None], vals[None], counts[None], \
                any_ovf[None]

        def build(slots):
            fn = shard_map(
                functools.partial(_shard, slots=slots),
                mesh=mesh,
                in_specs=(P(GOP_AXIS, TILE_AXIS, None), P()),
                out_specs=(P((GOP_AXIS, TILE_AXIS)),) * 4 + (P(),),
            )
            return jax.jit(fn)

        from .entropy import resolve_workers

        self._build = build
        self._step = {slots: build(slots)}
        self._pool = ThreadPoolExecutor(
            max_workers=resolve_workers(self.cfg.deflate_workers)
        )
        self.frames_encoded = 0

    def push(self, frames: np.ndarray) -> bytes:
        n_gop, n_tile = self._mesh_shape
        step_t = self.cfg.gop_size * n_gop
        t, h, w = frames.shape
        if t % step_t or (h, w) != (self.height, self.width):
            raise ValueError(
                f"push expects T % {step_t} == 0 and geometry "
                f"{self.height}x{self.width}"
            )
        out = []
        for i in range(0, t, step_t):
            fd = jax.device_put(frames[i : i + step_t], self._sharding)
            plane, lidx, vals, counts, ovf = self._step[self.slots](
                fd, self.ctx.enc_t
            )
            if bool(np.asarray(ovf)):
                worst = self._step.setdefault(256, self._build(256))
                plane, lidx, vals, counts, _ = worst(fd, self.ctx.enc_t)
            # Gathered arrays are in global value order; slice per GOP and
            # emit members identical to the single-device encoder's.
            plane_h = np.asarray(jax.device_get(plane)).reshape(-1)
            idx, val = exceptions.expand_exceptions_np(
                np.asarray(lidx).reshape(-1, np.asarray(lidx).shape[-1]),
                np.asarray(vals).reshape(-1, np.asarray(vals).shape[-1]),
                np.asarray(counts).reshape(-1),
            )
            npg = self.width * self.height * self.cfg.gop_size
            level = self.cfg.zlib_level
            futs = []
            for g in range(n_gop):
                lo, hi = np.searchsorted(idx, [g * npg, (g + 1) * npg])
                futs.append(self._pool.submit(
                    _member_payload,
                    plane_h[g * npg // 2 : (g + 1) * npg // 2],
                    idx[lo:hi] - g * npg, val[lo:hi], level,
                ))
            out.extend(
                _member(f.result(), self.cfg.gop_size, MEMBER_TURBO)
                for f in futs
            )
            self.frames_encoded += step_t
        return b"".join(out)

    def finish(self) -> bytes:
        self._pool.shutdown(wait=True)
        return b""


def is_turbo_container(members: Iterable[tuple[int, bytes, int]]) -> bool:
    types = {m[2] for m in members}
    return MEMBER_TURBO in types and types <= {MEMBER_TURBO, MEMBER_INDEX}


def is_turbo_rgb_container(members: Iterable[tuple[int, bytes, int]]) -> bool:
    types = {m[2] for m in members}
    return bool(types & set(MEMBER_TURBO_RGB)) and \
        types <= set(MEMBER_TURBO_RGB)


def encode_turbo_rgb_video(
    frames: np.ndarray,
    cfg: CodecConfig | None = None,
    ctx: TransformContext | None = None,
) -> bytes:
    """(T, H, W, 3) interleaved RGB -> turbo container: per channel, one
    type-6/7/8 member per GOP (channel-major member order, like the
    reference-profile RGB container)."""
    cfg = cfg or CodecConfig()
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError("expected (T, H, W, 3) interleaved RGB")
    ctx = ctx or TransformContext(cfg)
    t = frames.shape[0] - frames.shape[0] % cfg.gop_size
    out = []
    for c, mtype in enumerate(MEMBER_TURBO_RGB):
        enc = TurboEncoder(frames.shape[2], frames.shape[1], cfg, ctx,
                           member_type=mtype)
        plane = np.ascontiguousarray(frames[:t, :, :, c])
        out.append(enc.push(plane) + enc.finish())
    return b"".join(out)


def decode_turbo_rgb_video(
    data: bytes,
    width: int,
    height: int,
    cfg: CodecConfig | None = None,
    ctx: TransformContext | None = None,
) -> np.ndarray:
    """One split, one inflate pool shared by all three channels."""
    import os

    cfg = cfg or CodecConfig()
    ctx = ctx or TransformContext(cfg)
    members = split_members(data)
    by_type = {
        t: [m for m in members if m[2] == t] for t in MEMBER_TURBO_RGB
    }
    if not all(by_type.values()):
        raise ValueError("not a turbo-rgb container (missing channels)")
    with ThreadPoolExecutor(max(1, (os.cpu_count() or 2))) as pool:
        planes = [
            _decode_members(by_type[t], pool, width, height, cfg, ctx)
            for t in MEMBER_TURBO_RGB
        ]
    return np.stack(planes, axis=-1)


def decode_turbo_container(
    data: bytes,
    width: int,
    height: int,
    cfg: CodecConfig | None = None,
    ctx: TransformContext | None = None,
    inflate_workers: int | None = None,
    member_type: int = MEMBER_TURBO,
) -> np.ndarray:
    """Turbo container -> (T, H, W) uint8; pixels identical to the
    reference profile's decode of the same source.

    The host entropy stage is pure inflate, GOP-parallel on a pool; device
    inverse transforms overlap via the same async window as decode_video.
    """
    import os

    cfg = cfg or CodecConfig()
    ctx = ctx or TransformContext(cfg)
    members = [m for m in split_members(data) if m[2] == member_type]
    if not members:
        raise ValueError(
            f"not a turbo container (no type-{member_type} members)"
        )
    with ThreadPoolExecutor(
        inflate_workers or max(1, min(len(members), (os.cpu_count() or 2)))
    ) as pool:
        return _decode_members(members, pool, width, height, cfg, ctx)


def _decode_members(members, pool, width, height, cfg, ctx) -> np.ndarray:
    """Inflate members on `pool`, dispatch inverse transforms, assemble."""
    out = np.empty(
        (sum(m[0] for m in members), height, width), np.uint8
    )
    pending: collections.deque = collections.deque()

    def drain_one() -> None:
        a0, t, fd = pending.popleft()
        out[a0 : a0 + t] = _undelta(np.asarray(fd), cfg)

    a0 = 0
    for (t, _, _), planar in zip(
        members, pool.map(lambda m: _parse_payload(m[1]), members)
    ):
        fd = _dispatch_planar4(planar, ctx, cfg, height, width)
        fd.copy_to_host_async()
        pending.append((a0, t, fd))
        a0 += t
        if len(pending) >= 3:
            drain_one()
    while pending:
        drain_one()
    return out
