"""One-process TPU validation of the wire-ingesting decode step (round 4).

The turbo decode step consumes the member's (cube/2, cubes) wire layout
directly (decode_step_planar4(wire=True)); round 4 rewrote that branch to
peel nibbles from the word transpose and restore pair order with the exact
one-hot matmul (ops/relayout.pair_unscramble) instead of materializing the
byte-order plane (~3.2 ms/GOP of XLA layout copies).  The CPU suite pins
bit-identity through the XLA fallback; this validates the PALLAS path on
real hardware:

1. planar4_to_frames(wire=True) on the wire layout vs wire=False on the
   flat plane, same exceptions: frames must be IDENTICAL bytes.
2. Full turbo container round-trip vs plain-profile round-trip: identical
   pixels (the transparency invariant, on-device end to end).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from dct3d_tpu.codec.transform import TransformContext, decode_step_planar4
from dct3d_tpu.codec.turbo import TurboEncoder, decode_turbo_container
from dct3d_tpu.codec.encoder import encode_video
from dct3d_tpu.codec.decoder import decode_video
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.utils import enable_compilation_cache

W, H, T = 1920, 1080, 8


def main():
    enable_compilation_cache()
    cfg = CodecConfig()
    ctx = TransformContext(cfg)
    rng = np.random.default_rng(7)
    n = T * H * W

    # 1. step-level: wire vs flat plane, identical synthetic inputs.
    plane = rng.integers(0, 256, n // 2, dtype=np.uint16).astype(np.uint8)
    n_exc = n // cfg.cube_size + 8192
    exc_idx = np.sort(rng.choice(n, n_exc, replace=False)).astype(np.int32)
    exc_val = rng.integers(-2000, 2000, n_exc).astype(np.int32)
    pflat = plane.reshape(-1, cfg.cube_size // 2)
    wire = np.ascontiguousarray(pflat.T)
    f_flat = np.asarray(decode_step_planar4(
        jnp.asarray(plane), jnp.asarray(exc_idx), jnp.asarray(exc_val),
        ctx.dec_me, ctx.dec_mo, cfg=cfg, height=H, width=W))
    f_wire = np.asarray(decode_step_planar4(
        jnp.asarray(wire), jnp.asarray(exc_idx), jnp.asarray(exc_val),
        ctx.dec_me, ctx.dec_mo, cfg=cfg, height=H, width=W, wire=True))
    assert np.array_equal(f_flat, f_wire), (
        f"wire/flat mismatch: {int((f_flat != f_wire).sum())} pixels")
    print("step wire==flat: OK")

    # 2. container-level transparency: turbo pixels == plain pixels.
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    frames = np.empty((T, H, W), np.uint8)
    for k in range(T):
        frames[k] = ((x[None, :] + 3 * y + 5 * k) & 0xFF).astype(np.uint8)
    frames ^= rng.integers(0, 16, size=frames.shape, dtype=np.uint8)

    enc = TurboEncoder(W, H, cfg)
    turbo = enc.push(frames) + enc.finish()
    t_pix = decode_turbo_container(turbo, W, H, cfg=cfg, ctx=ctx)
    plain = encode_video(frames, cfg, ctx)
    p_pix = decode_video(plain, W, H, T, cfg, ctx)
    assert np.array_equal(np.asarray(t_pix), np.asarray(p_pix)), (
        "turbo/plain pixel mismatch")
    print("container turbo==plain: OK")


if __name__ == "__main__":
    main()
