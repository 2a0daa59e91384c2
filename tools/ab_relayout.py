"""A/B slope-timing of encode_step with the Pallas relayout on vs off,
in ONE process (chained dispatches, same clip, same cfg as bench)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.codec import transform
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.ops import relayout
from dct3d_tpu.utils import enable_compilation_cache

W, H, T = 1920, 1080, 8


def make_frames():
    rng = np.random.default_rng(12345)
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    frames = np.empty((T, H, W), np.uint8)
    for k in range(T):
        frames[k] = ((x[None, :] + y + k) & 0xFF).astype(np.uint8)
    return frames ^ rng.integers(0, 16, size=frames.shape, dtype=np.uint8)


def slope(step, fj, carry):
    def chain(steps):
        best = float("inf")
        for _ in range(3):
            c = carry
            t0 = time.perf_counter()
            for _ in range(steps):
                o = step(fj, c)
                c = (o[2], o[3] % 8)
            jax.device_get(o[3])
            best = min(best, time.perf_counter() - t0)
        return best

    chain(1)
    t2, t10 = chain(2), chain(10)
    return (t10 - t2) / 8


def main():
    enable_compilation_cache()
    cfg = CodecConfig(deflate_workers=-1, pack_bits_per_value=4,
                      transport_delta=True)
    ctx = transform.TransformContext(cfg)
    fj = jnp.asarray(make_frames())
    carry = (jnp.zeros((), jnp.uint32), jnp.zeros((), jnp.int32))
    max_bytes = 1 << 21

    def step(f, c0, c1):
        return transform.encode_step(f, ctx.enc_t, c0, c1,
                                     max_bytes=max_bytes, cfg=cfg)

    stepf = lambda f, c: step(f, c[0], c[1])

    for label in ("relayout", "xla", "relayout2", "xla2"):
        on = label.startswith("relayout")
        orig = relayout.supports
        if not on:
            relayout.supports = lambda *a, **k: False
        transform.encode_step.clear_cache()
        try:
            per = slope(stepf, fj, carry)
        finally:
            relayout.supports = orig
        print(f"{label}: {per*1e3:.2f} ms/GOP -> {8/per:.0f} fps", flush=True)


if __name__ == "__main__":
    main()
