"""Slope-timed stage breakdown of the turbo encode step on the real TPU.

Stages (cumulative prefixes, consecutive differences isolate a stage):
  transform   frames -> quantized zigzag coefficients (shared front half)
  plane       + nibble pack
  full        + MXU exception compaction (the shipped encode_step_turbo)

Run in ONE process; compare against the reference profile's ~7 ms/GOP.
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
from dct3d_tpu.ops.exceptions import DEFAULT_SLOTS
from dct3d_tpu.utils import enable_compilation_cache

W, H, K2, K10 = 1920, 1080, 2, 12


def train(fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1])
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K2):
            out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1])
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(K10):
            out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1])
        t10 = time.perf_counter() - t0
        slopes.append((t10 - t2) / (K10 - K2))
    return sorted(slopes)[1]


def main() -> None:
    enable_compilation_cache()
    cfg = CodecConfig()
    ctx = TransformContext(cfg)
    rng = np.random.default_rng(1)
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    frames = np.empty((cfg.gop_size, H, W), np.uint8)
    for k in range(cfg.gop_size):
        frames[k] = ((x[None, :] + y + k) & 0xFF).astype(np.uint8)
    frames ^= rng.integers(0, 16, size=frames.shape, dtype=np.uint8)
    fj = jnp.asarray(frames)

    @jax.jit
    def stage_transform(f):
        return _frames_to_q(f, ctx.enc_t_pair, cfg).sum()

    @jax.jit
    def stage_plane(f):
        qp = _frames_to_q(f, ctx.enc_t_pair, cfg)
        half = qp.shape[-1] // 2
        qe, qo = qp[:, :half], qp[:, half:]
        plane = ((qe & 0xF) | ((qo & 0xF) << 4)).astype(jnp.uint8)
        return plane.sum(dtype=jnp.uint32)

    def stage_full(f):
        return encode_step_turbo(f, ctx.enc_t_pair, cfg=cfg,
                                 slots=DEFAULT_SLOTS)

    prev = 0.0
    for name, fn in [("transform", stage_transform),
                     ("plane", stage_plane), ("full", stage_full)]:
        s = train(fn, fj)
        print(f"{name:10s} {s*1e3:8.2f} ms  (+{(s-prev)*1e3:7.2f})"
              f"  {cfg.gop_size/s:8.1f} fps", flush=True)
        prev = s


if __name__ == "__main__":
    main()
