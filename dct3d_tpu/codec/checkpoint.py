"""Checkpointable / resumable encoding.

The reference has no resume story (SURVEY.md §5): its Java encoder is
one-shot in RAM and its C encoder spans ONE zlib stream over the whole file,
so a crash loses everything.  GOP independence makes every N-GOP boundary a
natural restart point *if* the entropy+DEFLATE state is reset there — which
is exactly the multi-host member container (parallel/multihost.py): the
checkpointed stream is a sequence of self-contained members
``D3MH | frames | length | zlib-payload``, each decodable in isolation.

CheckpointingEncoder appends complete members to the output file and fsyncs;
``resume_info`` inspects a (possibly truncated) file, reports how many
frames are safely on disk, and truncates a torn tail member so encoding can
continue from the next GOP.  Decode via
``parallel.multihost.decode_multihost_container`` (same format).
"""

from __future__ import annotations

import dataclasses
import json
import os
import struct

import numpy as np

from ..config import CodecConfig
from ..parallel.multihost import MEMBER_MAGIC, split_members
from .encoder import StreamingEncoder
from .transform import TransformContext


def resume_info(path: str) -> tuple[int, int]:
    """(frames_safe, bytes_safe) of the longest complete-member prefix.

    Returns (0, 0) for a missing/empty file.  A torn trailing member (crash
    mid-write) is excluded.
    """
    if not os.path.exists(path):
        return 0, 0
    data = open(path, "rb").read()
    frames = 0
    pos = 0
    while pos + 16 <= len(data) and data[pos : pos + 4] == MEMBER_MAGIC:
        tagged, length = struct.unpack_from("<IQ", data, pos + 4)
        if pos + 16 + length > len(data):
            break  # torn member
        frames += tagged & 0xFFFFFF  # top byte is the member type tag
        pos += 16 + length
    return frames, pos


class CheckpointingEncoder:
    """Encode into a member container with durable progress every
    ``checkpoint_gops`` GOPs.  Construction resumes automatically from the
    longest complete prefix of ``path``."""

    def __init__(
        self,
        path: str,
        width: int,
        height: int,
        cfg: CodecConfig | None = None,
        ctx: TransformContext | None = None,
        checkpoint_gops: int = 8,
        index: bool = False,
        turbo: bool = False,
        mesh=None,
    ) -> None:
        #: optional (gop, tile) device mesh: members are produced by the
        #: sharded encoders instead, BYTE-IDENTICAL to the single-device
        #: members (parallel/sharding.py invariant) — so the .meta sidecar
        #: does not pin the mesh.  REFERENCE profile: a resume may change
        #: or drop the mesh when the boundaries line up — checkpoint_gops
        #: must be whole mesh steps and the resume point a whole number of
        #: steps (both validated below with explicit errors).  TURBO
        #: profile: members are independent per GOP, so neither constraint
        #: applies — _push_turbo splits whole steps / GOP tails itself.
        self.mesh = mesh
        self.cfg = cfg or CodecConfig()
        # Alignment rules apply to the REFERENCE profile only: its members
        # span checkpoint_gops GOPs of one continuous stream, so member
        # boundaries must land on whole mesh steps.  Turbo members are one
        # independent stream per GOP (checkpoint_gops merely sets fsync
        # cadence), so any GOP-multiple boundary is fine there.
        if mesh is not None and not turbo and checkpoint_gops % mesh.shape["gop"]:
            raise ValueError(
                f"checkpoint_gops={checkpoint_gops} is not a multiple of "
                f"the mesh gop axis ({mesh.shape['gop']}): members would "
                "flush at different boundaries than a single-device encode "
                "(breaking container byte-identity); pick a multiple or a "
                "smaller gop axis"
            )
        self.path = path
        self.width = width
        self.height = height
        self.ctx = ctx or TransformContext(self.cfg)
        self.checkpoint_gops = checkpoint_gops
        #: follow each member with its seekable per-GOP index member
        #: (docs/FORMAT.md) for scan-free GOP-parallel decode; a torn index
        #: member truncates away on resume, leaving its stream member valid.
        self.index = index
        #: turbo profile: members come out of TurboEncoder one per GOP
        #: (already independently decodable); checkpointing reduces to
        #: fsyncing every checkpoint_gops members.
        self.turbo = turbo
        self.frames_done, safe_bytes = resume_info(path)
        if mesh is not None and not turbo:
            step = self.cfg.gop_size * mesh.shape["gop"]
            if self.frames_done % step:
                raise ValueError(
                    f"cannot resume at frame {self.frames_done} on a "
                    f"{mesh.shape['gop']}-gop mesh (not a whole "
                    f"{step}-frame mesh step); resume without --mesh or "
                    "with a gop axis that divides the resume point"
                )
        # The headerless member format can't self-describe codec parameters;
        # a sidecar pins them so a resume with different flags fails loudly
        # instead of appending members that decode to garbage.
        meta = {
            "cfg": dataclasses.asdict(self.cfg),
            "width": width,
            "height": height,
        }
        if turbo:
            meta["profile"] = "turbo"
        meta_path = path + ".meta"
        if self.frames_done and os.path.exists(meta_path):
            with open(meta_path) as f:
                have = json.load(f)
            if self._semantic(have) != self._semantic(meta):
                raise ValueError(
                    f"resume parameters differ from {meta_path}; re-encode "
                    "from scratch or restore the original flags "
                    f"(was {have}, now {meta})"
                )
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        mode = "r+b" if os.path.exists(path) else "w+b"
        self._f = open(path, mode)
        self._f.truncate(safe_bytes)  # drop any torn tail member
        self._f.seek(safe_bytes)
        self._enc: StreamingEncoder | None = None
        self._member_frames = 0
        self._member_chunks: list[bytes] = []
        self._turbo_enc = None
        self._turbo_tail = None
        self._since_sync = 0

    @staticmethod
    def _semantic(meta: dict) -> dict:
        """The subset of meta a resume must match.  Compression-effort
        knobs are excluded: members are self-contained streams (zlib and
        zstd are both self-describing, and turbo sniffs per stream), so a
        mid-container level/worker change decodes fine — pinning them
        would turn a default bump in a new build into a spurious refusal
        to resume old files."""
        out = dict(meta)
        out["cfg"] = {
            k: v for k, v in meta.get("cfg", {}).items()
            if k not in ("zlib_level", "deflate_workers", "turbo_zstd_level")
        }
        return out

    def _flush_member(self) -> None:
        if self._enc is None:
            return
        from ..parallel.multihost import _member, make_index_member

        self._member_chunks.append(self._enc.finish())
        payload = b"".join(self._member_chunks)
        self._f.write(_member(payload, self._member_frames))
        if self.index:
            self._f.write(make_index_member(self._enc.gop_bit_ends))
        self._f.flush()
        os.fsync(self._f.fileno())
        self.frames_done += self._member_frames
        self._enc = None
        self._member_frames = 0
        self._member_chunks = []

    def _sync(self) -> None:
        self._f.flush()
        os.fsync(self._f.fileno())
        self._since_sync = 0

    def _push_turbo(self, frames: np.ndarray) -> None:
        from .turbo import TurboEncoder, TurboShardedEncoder

        gop = self.cfg.gop_size
        if self.mesh is not None:
            # Turbo members are one independent stream per GOP, so a batch
            # that doesn't fill whole mesh steps (a resume point from a
            # single-device run, or a stream tail) legally splits: whole
            # steps ride the sharded encoder, the GOP tail a single-device
            # encoder — members land on disk in frame order either way and
            # the container stays byte-identical.
            step = gop * self.mesh.shape["gop"]
            whole = frames.shape[0] - frames.shape[0] % step
            if whole:
                if self._turbo_enc is None:  # lazy: tail-only pushes
                    self._turbo_enc = TurboShardedEncoder(
                        self.width, self.height, self.mesh, self.cfg,
                        self.ctx,
                    )
                self._f.write(self._turbo_enc.push(frames[:whole]))
            if whole < frames.shape[0]:
                if self._turbo_tail is None:
                    self._turbo_tail = TurboEncoder(
                        self.width, self.height, self.cfg, self.ctx
                    )
                self._f.write(
                    self._turbo_tail.push(frames[whole:])
                    + self._turbo_tail.drain()
                )
        else:
            if self._turbo_enc is None:
                self._turbo_enc = TurboEncoder(
                    self.width, self.height, self.cfg, self.ctx
                )
            self._f.write(self._turbo_enc.push(frames))
        self.frames_done += frames.shape[0]
        self._since_sync += frames.shape[0] // gop
        if self._since_sync >= self.checkpoint_gops:
            # Force in-flight members out before fsync, else the durability
            # bound silently grows by the encoder's pipeline depth.
            if self._turbo_enc is not None:
                self._f.write(self._turbo_enc.drain())
            self._sync()

    def push(self, frames: np.ndarray) -> None:
        """Encode a (T, H, W) uint8 batch (T a multiple of the GOP — or,
        on a mesh, of gop_size * mesh.gop).  The caller feeds frames
        starting at ``frames_done`` after a resume."""
        if self.turbo:
            return self._push_turbo(frames)
        gop = self.cfg.gop_size
        step = gop if self.mesh is None else gop * self.mesh.shape["gop"]
        if frames.shape[0] % step:
            raise ValueError(
                f"push expects a multiple of {step} frames "
                f"(gop_size x mesh gop axis), got {frames.shape[0]}"
            )
        for i in range(0, frames.shape[0], step):
            if self._enc is None:
                if self.mesh is not None:
                    from ..parallel.sharding import ShardedEncoder

                    self._enc = ShardedEncoder(
                        self.width, self.height, self.mesh, self.cfg,
                        self.ctx,
                    )
                else:
                    self._enc = StreamingEncoder(
                        self.width, self.height, self.cfg, self.ctx
                    )
            self._member_chunks.append(self._enc.push(frames[i : i + step]))
            self._member_frames += step
            if self._member_frames >= self.checkpoint_gops * gop:
                self._flush_member()

    def close(self) -> None:
        if self.turbo:
            if self._turbo_enc is not None:
                self._f.write(self._turbo_enc.finish())
            if self._turbo_tail is not None:
                self._f.write(self._turbo_tail.finish())
            self._sync()
        else:
            self._flush_member()
        self._f.close()

    def __enter__(self) -> "CheckpointingEncoder":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
