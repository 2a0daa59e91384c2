"""Characterize the bfloat16 fast profile (VERDICT r2 item 6).

Measures on the real chip, slope-timed (K chained dispatches, relay
latency subtracted):
  * encode_step ms/GOP at 1080p, float32 (HIGHEST = multi-pass MXU) vs
    bfloat16 (single pass);
  * decode_step_planar4 ms/GOP the same way;
  * RD rows (bpp / PSNR vs the f32 stream) at a few quant strengths —
    the fast profile's rate is the same container format, only the
    transform rounding differs.

Run: python tools/profile_bf16.py          (TPU; ~2-4 min)
     python tools/profile_bf16.py --cpu    (tiny shapes, correctness only)
"""

from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dct3d_tpu import metrics
    from dct3d_tpu.codec.decoder import decode_video
    from dct3d_tpu.codec.encoder import encode_video
    from dct3d_tpu.codec.transform import TransformContext, encode_step
    from dct3d_tpu.config import CodecConfig
    from dct3d_tpu.io import synthetic
    from dct3d_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    h, w = (1080, 1920) if "--cpu" not in sys.argv else (216, 384)
    rng = np.random.default_rng(11)
    frames = (rng.integers(0, 16, (8, h, w)).astype(np.uint8)
              + np.arange(w, dtype=np.uint8)[None, None, :])
    fj = jnp.asarray(frames)

    def slope_encode(cfg, k1=2, k2=10, r=3):
        ctx = TransformContext(cfg)
        mb = ctx.max_packed_bytes(frames.size)

        def chain(steps):
            carry = (jnp.uint32(0), jnp.int32(0))
            g = None
            t0 = time.perf_counter()
            for _ in range(steps):
                g = encode_step(fj, ctx.enc_t, carry[0], carry[1],
                                max_bytes=mb, cfg=cfg)
                carry = (g.carry_code, g.carry_bits)
            int(g.total_bits)
            return time.perf_counter() - t0

        chain(1)  # warm (compile + remote program load)
        t1 = min(chain(k1) for _ in range(r))
        t2 = min(chain(k2) for _ in range(r))
        return (t2 - t1) / (k2 - k1)

    for name, cfg in (("float32", CodecConfig()),
                      ("bfloat16", CodecConfig(compute_dtype="bfloat16"))):
        dt = slope_encode(cfg)
        print(f"encode_step[{name:8s}]: {1000 * dt:6.2f} ms/GOP "
              f"= {cfg.gop_size / dt:7.1f} fps", flush=True)

    # Decode step (transform-dominated, so the dtype matters more here):
    # device-resident planes -> frames, same slope discipline as bench.py.
    from dct3d_tpu.codec import entropy
    from dct3d_tpu.codec.decoder import _pad_exceptions
    from dct3d_tpu.codec.transform import decode_step_planar4
    import zlib

    cfg0 = CodecConfig(transport_delta=False)
    data = encode_video(np.asarray(frames), cfg0)
    cpg = w * h * cfg0.gop_size
    payload = zlib.decompress(data)
    plane, ei, ev, _ = entropy.decode_values_planar4(payload, cpg)
    exc_idx, exc_val = _pad_exceptions(plane.size * 2, ei, ev)
    pd = jnp.asarray(plane)
    pi, pv = jnp.asarray(exc_idx), jnp.asarray(exc_val)

    def slope_decode(cfg, k1=2, k2=10, r=3):
        ctx = TransformContext(cfg)

        def chain(steps):
            fd = None
            t0 = time.perf_counter()
            for _ in range(steps):
                fd = decode_step_planar4(pd, pi, pv, ctx.dec_me, ctx.dec_mo,
                                         cfg=cfg, height=h, width=w)
            jax.device_get(fd[0, 0, 0])
            return time.perf_counter() - t0

        chain(1)
        t1 = min(chain(k1) for _ in range(r))
        t2 = min(chain(k2) for _ in range(r))
        return (t2 - t1) / (k2 - k1)

    for name in ("float32", "bfloat16"):
        cfg = CodecConfig(transport_delta=False, compute_dtype=name)
        dt = slope_decode(cfg)
        print(f"decode_step[{name:8s}]: {1000 * dt:6.2f} ms/GOP "
              f"= {cfg.gop_size / dt:7.1f} fps", flush=True)

    # RD rows: same clip through both profiles, decoded by the DEFAULT
    # (f32) decoder — the compatibility claim under test.
    clip = synthetic.moving_gradient(32, 240, 320)
    print("quant  f32_bpp  f32_psnr  bf16_bpp  bf16_psnr  delta_db")
    for q in (2, 5, 10):
        row = []
        for dtype in ("float32", "bfloat16"):
            cfg = CodecConfig(quant_strength=q, compute_dtype=dtype)
            data = encode_video(clip, cfg)
            out = decode_video(data, 320, 240, 32, CodecConfig(quant_strength=q))
            row.append((metrics.bits_per_pixel(len(data), 320, 240, 32),
                        metrics.psnr(clip, out)))
        (b0, p0), (b1, p1) = row
        print(f"{q:5d}  {b0:7.4f}  {p0:8.3f}  {b1:8.4f}  {p1:9.3f}"
              f"  {p1 - p0:+8.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
