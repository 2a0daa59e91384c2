"""Slope-bisect the device decode step (planar4 -> frames), 1080p GOP.

HISTORICAL (round 2): this bisects the pre-perm composition (XLA 6-axis
relayout, unsplit matmul).  The production path moved to column-permuted
matrices + the Pallas inverse word transpose; bisect THAT with
tools/profile_decode_stages.py, which also covers the turbo wire branch."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.codec import framing
from dct3d_tpu.codec.transform import TransformContext, _PRECISION
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.utils import enable_compilation_cache

REPS = 3
K1, K2 = 2, 8


def run_once(fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def slope(make, *args):
    return (run_once(make(K2), *args) - run_once(make(K1), *args)) / (K2 - K1)


def main():
    enable_compilation_cache()
    cfg = CodecConfig()
    ctx = TransformContext(cfg)
    rng = np.random.default_rng(0)
    T, H, W = 8, 1080, 1920
    n = T * H * W
    plane = rng.integers(0, 256, n // 2, dtype=np.uint16).astype(np.uint8)
    exc_idx = np.sort(rng.integers(0, n, 4096)).astype(np.int32)
    exc_val = rng.integers(-2000, 2000, 4096).astype(np.int32)
    pd, pi, pv = jnp.asarray(plane), jnp.asarray(exc_idx), jnp.asarray(exc_val)

    def prefix(stage):
        def fn(plane, ei, ev, salt):
            b = (plane ^ (salt & 1).astype(jnp.uint8)).astype(jnp.int32)
            lo = b & 0xF
            hi = (b >> 4) & 0xF
            vals = jnp.stack([(lo ^ 8) - 8, (hi ^ 8) - 8], axis=-1).reshape(-1)
            if stage == "expand":
                return vals.sum()
            vals = vals.at[ei].set(ev, mode="drop")
            if stage == "scatter":
                return vals.sum()
            coeffs = vals.reshape(-1, cfg.cube_size)
            pixels = jnp.dot(coeffs.astype(ctx.dec_m.dtype), ctx.dec_m,
                             precision=_PRECISION)
            pixels = jnp.clip(pixels, 0.0, 255.0)
            if stage == "matmul":
                return pixels.sum()
            frames = framing.cubes_to_frames(pixels, cfg, H, W)
            frames = frames.astype(jnp.uint8)
            if stage == "relayout":
                return frames.sum(dtype=jnp.int32)
            return frames  # full: materialize output

        return fn

    for stage in ("expand", "scatter", "matmul", "relayout", "full"):
        def mk(k, stage=stage):
            body_fn = prefix(stage)

            @jax.jit
            def f(plane, ei, ev):
                def body(i, carry):
                    out = body_fn(plane, ei, ev, carry)
                    return jax.tree.leaves(out)[0].reshape(-1)[0].astype(jnp.int32)

                return jax.lax.fori_loop(0, k, body, jnp.int32(0))

            return f

        print(f"{stage:9s} {slope(mk, pd, pi, pv)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
