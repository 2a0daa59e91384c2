"""A/B: flat-path decode step, DC-through-exceptions vs DC-as-column splice.

The reference-profile decode ships a flat nibble plane + exception list;
DC rides the exceptions (~32K of ~41K entries at 1080p, padded to a 64K
scatter bucket).  The round-5 splice derives the dense DC host-side
(decoder._split_dc_flat) and splices it as the even plane's column 0 on
device, shrinking the scatter to the ~8K true outliers.

Slope-times both in-program (fori_loop, pack forced live) AND as chained
dispatch trains, one process (CLAUDE.md relay rules).

Run: python tools/ab_flat_dc.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from dct3d_tpu import oracle
from dct3d_tpu.codec import entropy
from dct3d_tpu.codec.decoder import _pad_exceptions, _split_dc_flat
from dct3d_tpu.codec.transform import TransformContext, decode_step_planar4
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.utils import enable_compilation_cache

W, H = 1920, 1080


def main() -> None:
    enable_compilation_cache()
    cfg = CodecConfig()
    ctx = TransformContext(cfg)
    rng = np.random.default_rng(1)
    frames = np.empty((cfg.gop_size, H, W), np.uint8)
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    for k in range(cfg.gop_size):
        frames[k] = ((x[None, :] + y + k) & 0xFF).astype(np.uint8)
    frames ^= rng.integers(0, 16, size=frames.shape, dtype=np.uint8)
    q = oracle.quantized_coefficients(frames, cfg).reshape(-1).astype(np.int32)
    payload, _ = entropy.encode_values(q)
    plane, ei, ev, _ = entropy.decode_values_planar4(
        np.frombuffer(payload + b"\x00", np.uint8), q.size
    )
    print(f"exceptions merged: {ei.size}", flush=True)

    # merged operands (round-4 route)
    mi, mv = _pad_exceptions(plane.size * 2, ei, ev)
    # split operands (production round-5 route)
    dc, ei2, ev2 = _split_dc_flat(plane, ei.astype(np.int64), ev,
                                  cfg.cube_size)
    si, sv = _pad_exceptions(plane.size * 2, ei2, ev2)
    print(f"exceptions split: {ei2.size} (buckets {mi.size} -> {si.size})",
          flush=True)

    pd = jnp.asarray(plane)
    args_m = (pd, jnp.asarray(mi), jnp.asarray(mv))
    args_s = (pd, jnp.asarray(si), jnp.asarray(sv))
    dcj = jnp.asarray(dc)

    def step_m(p, i, v):
        return decode_step_planar4(p, i, v, ctx.dec_me, ctx.dec_mo,
                                   cfg=cfg, height=H, width=W)

    def step_s(p, i, v):
        return decode_step_planar4(p, i, v, ctx.dec_me, ctx.dec_mo,
                                   cfg=cfg, height=H, width=W, dc=dcj)

    # identity first
    fm = np.asarray(step_m(*args_m))
    fs = np.asarray(step_s(*args_s))
    assert np.array_equal(fm, fs), "split route changed pixels!"
    print("identity: OK (pixels byte-equal on device)", flush=True)

    def train(step, args, k):
        fd = None
        t0 = time.perf_counter()
        for _ in range(k):
            fd = step(*args)
        jax.device_get(fd[0, 0, 0])
        return time.perf_counter() - t0

    for name, step, args in (("merged", step_m, args_m),
                             ("split ", step_s, args_s)):
        train(step, args, 1)
        slopes = [
            (train(step, args, 12) - train(step, args, 2)) / 10
            for _ in range(3)
        ]
        best = min(slopes)
        print(f"{name}: {best*1e3:.2f} ms/GOP dispatch-train "
              f"({8/best:.0f} fps) slopes "
              f"{[f'{s*1e3:.2f}' for s in slopes]}", flush=True)


if __name__ == "__main__":
    main()
