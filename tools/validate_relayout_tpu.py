"""One-process TPU validation of the Pallas relayout + with_lastw pack paths.

1. quantize_step with the relayout kernel active vs forced-XLA fallback:
   quantized int32 coefficients must be IDENTICAL (the unscramble matmul is
   exact, so the DCT operand is bit-identical).
2. Full encode_video bitstream vs oracle Exp-Golomb built from the
   device-quantized ints: exact byte equality (exercises with_lastw).
3. Slope-timed encode_step -> compute fps at 1080p.
"""

from __future__ import annotations

import time
import zlib

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu import oracle
from dct3d_tpu.codec import transform
from dct3d_tpu.codec.encoder import encode_video
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.ops import relayout
from dct3d_tpu.utils import enable_compilation_cache

W, H, T = 1920, 1080, 8


def make_frames():
    rngs = np.random.default_rng(1)
    frames = np.empty((T, H, W), np.uint8)
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    for k in range(T):
        frames[k] = ((x[None, :] + y + k) & 0xFF).astype(np.uint8)
    frames ^= rngs.integers(0, 16, size=frames.shape, dtype=np.uint8)
    return frames


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), flush=True)
    cfg = CodecConfig(pack_bits_per_value=4)
    ctx = transform.TransformContext(cfg)
    frames = make_frames()
    fj = jnp.asarray(frames)

    # 1. relayout vs XLA fallback coefficient parity
    q_new = np.asarray(transform.quantize_step(fj, ctx.enc_t, cfg=cfg))
    orig = relayout.supports
    relayout.supports = lambda *a, **k: False
    transform.quantize_step.clear_cache()
    transform.encode_step.clear_cache()
    try:
        q_old = np.asarray(transform.quantize_step(fj, ctx.enc_t, cfg=cfg))
    finally:
        relayout.supports = orig
        transform.quantize_step.clear_cache()
        transform.encode_step.clear_cache()
    same = np.array_equal(q_new, q_old)
    print("relayout-vs-xla quantized parity:", same, flush=True)
    assert same

    # 2. full bitstream vs oracle bytes
    payload, nbits = oracle.expgolomb_bytes(q_new)
    if nbits % 8 == 0:
        payload += b"\x00"
    want = zlib.compress(payload, cfg.zlib_level)
    got = encode_video(frames, cfg, ctx)
    print("bitstream parity:", got == want, flush=True)
    assert got == want

    # 3. slope-timed encode_step
    carry = (jnp.zeros((), jnp.uint32), jnp.zeros((), jnp.int32))
    max_bytes = len(payload) + (1 << 16)

    def step(f, c):
        return transform.encode_step(f, ctx.enc_t, c[0], c[1],
                                     max_bytes=max_bytes, cfg=cfg)

    out = step(fj, carry)
    jax.device_get(out[1])
    # slope: (t16 - t4) / 12 GOPs
    t0 = time.perf_counter()
    c = carry
    for _ in range(4):
        o = step(fj, c)
        c = (o[2], o[3] % 8)
    jax.device_get(o[1])
    t4 = time.perf_counter() - t0
    t0 = time.perf_counter()
    c = carry
    for _ in range(16):
        o = step(fj, c)
        c = (o[2], o[3] % 8)
    jax.device_get(o[1])
    t16 = time.perf_counter() - t0
    per_gop = (t16 - t4) / 12
    print(f"slope per-GOP: {per_gop*1e3:.2f} ms -> compute fps "
          f"{8/per_gop:.1f}", flush=True)


if __name__ == "__main__":
    main()
