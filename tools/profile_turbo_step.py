"""Serialized (chained fori_loop) stage bisect of the turbo encode step.

encode_step_turbo = transform (shared _frames_to_q at the pair-permuted
matrix) + elementwise nibble pack + Pallas plane_to_wire relayout +
compact_exceptions (Pallas VPU compaction).  The bench's turbo_compute
train dispatches independently, which overlaps on device (CLAUDE.md), so
this is the trustworthy per-stage table.

Run: python tools/profile_turbo_step.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.codec.transform import TransformContext, _frames_to_q
from dct3d_tpu.codec.turbo import encode_step_turbo
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.ops import exceptions, relayout
from dct3d_tpu.ops.bitpack import _tpu_backend
from dct3d_tpu.utils import enable_compilation_cache

W, H = 1920, 1080
K1, K2 = 2, 12


def main() -> None:
    enable_compilation_cache()
    cfg = CodecConfig()
    ctx = TransformContext(cfg)
    rng = np.random.default_rng(12345)
    frames = np.empty((cfg.gop_size, H, W), np.uint8)
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    for k in range(cfg.gop_size):
        frames[k] = ((x[None, :] + y + k) & 0xFF).astype(np.uint8)
    frames ^= rng.integers(0, 16, size=frames.shape, dtype=np.uint8)
    fj = jnp.asarray(frames)
    cube = cfg.cube_size
    half = cube // 2

    def stage(name):
        def fn(f):
            qp = _frames_to_q(f, ctx.enc_t_pair, cfg)
            if name == "transform":
                return qp.sum()
            qe, qo = qp[:, :half], qp[:, half:]
            plane = ((qe & 0xF) | ((qo & 0xF) << 4)).astype(jnp.uint8)
            if name == "nibble":
                return plane.sum(dtype=jnp.int32)
            wirep = relayout.plane_to_wire(plane, use_pallas=_tpu_backend())
            if name == "wire":
                return wirep.sum(dtype=jnp.int32)
            dc = qe[:, 0].astype(jnp.int16)
            lidx, vals, counts, overflow = exceptions.compact_exceptions(
                qp.reshape(-1), slots=exceptions.DEFAULT_SLOTS,
                dc_stride=cube,
            )
            return (wirep.reshape(-1)[0].astype(jnp.int32)
                    + dc.sum(dtype=jnp.int32)
                    + lidx.sum(dtype=jnp.int32) + vals.sum(dtype=jnp.int32)
                    + counts.sum() + overflow.astype(jnp.int32))

        return fn

    def chained(fn):
        @jax.jit
        def prog(f, k):
            def body(i, carry):
                out = fn(f ^ (carry & 1).astype(jnp.uint8))
                return jnp.asarray(out).reshape(-1)[0].astype(jnp.int32)

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        def run(k):
            jax.device_get(prog(fj, k))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.device_get(prog(fj, k))
                best = min(best, time.perf_counter() - t0)
            return best

        return (run(K2) - run(K1)) / (K2 - K1)

    prev = 0.0
    for name in ("transform", "nibble", "wire", "full"):
        s = chained(name and stage(name))
        print(f"{name:10s} {s*1e3:6.2f} ms (+{(s-prev)*1e3:6.2f})  "
              f"{cfg.gop_size/s:7.1f} fps", flush=True)
        prev = s

    # the shipped jitted step for reference (chained the same way)
    def shipped(f):
        plane, dc, lidx, vals, counts, overflow = encode_step_turbo(
            f, ctx.enc_t_pair, cfg=cfg, slots=exceptions.DEFAULT_SLOTS,
            wire=True,
        )
        return (plane.reshape(-1)[0].astype(jnp.int32)
                + counts.sum() + overflow.astype(jnp.int32))

    s = chained(shipped)
    print(f"{'shipped':10s} {s*1e3:6.2f} ms            "
          f"{cfg.gop_size/s:7.1f} fps", flush=True)


if __name__ == "__main__":
    main()
