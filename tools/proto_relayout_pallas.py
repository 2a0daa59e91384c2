"""Pallas variants of the frame->cube relayout (the encode transform's
whole cost: ~1.9 ms/GOP at 1080p for a 16.6 MB uint8 permutation — ~50x
off memory bound; XLA reformulations all pinned negative, see
PERFORMANCE.md; a hand relayout kernel was never tried).

Layout: frames (8, 1080, 1920) u8 -> cubes (32400, 512) u8 where
cube (by, bx), col (k*64+i*8+j) = frames[k, 8*by+i, 8*bx+j].

Variants:
  xla      production: optimization_barrier(frames_to_cubes)
  pl_u8    grid by block-row; in-kernel reshape/transpose on uint8
  pl_u8xN  same with N block-rows per grid step
  pl_i32   transpose taken after widening to int32 in VMEM

Run on the real TPU; byte-checked vs frames_to_cubes.
"""

from __future__ import annotations

import functools
import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dct3d_tpu.codec import framing
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.utils import enable_compilation_cache

T, H, W = 8, 1080, 1920
NBH, NBW = H // 8, W // 8


def _kernel_u8(x_ref, o_ref, *, rows: int):
    x = x_ref[...]  # (8, 8*rows, 1920) u8
    y = x.reshape(8, rows, 8, NBW, 8)        # k, r, i, bx, j
    y = y.transpose(1, 3, 0, 2, 4)           # r, bx, k, i, j
    o_ref[...] = y.reshape(rows * NBW, 512)


def _kernel_i32(x_ref, o_ref, *, rows: int):
    x = x_ref[...].astype(jnp.int32)
    y = x.reshape(8, rows, 8, NBW, 8)
    y = y.transpose(1, 3, 0, 2, 4)
    o_ref[...] = y.reshape(rows * NBW, 512).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("rows", "impl"))
def relayout(frames, rows: int = 1, impl: str = "u8"):
    kern = {"u8": _kernel_u8, "i32": _kernel_i32}[impl]
    return pl.pallas_call(
        functools.partial(kern, rows=rows),
        grid=(NBH // rows,),
        in_specs=[
            pl.BlockSpec((T, 8 * rows, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((rows * NBW, 512), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NBH * NBW, 512), jnp.uint8),
    )(frames)


def slope(fn, *args):
    out = fn(*args)
    jax.device_get(out[:1, :1])
    ss = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(2):
            out = fn(*args)
        jax.device_get(out[:1, :1])
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(12):
            out = fn(*args)
        jax.device_get(out[:1, :1])
        t12 = time.perf_counter() - t0
        ss.append((t12 - t2) / 10)
    return sorted(ss)[1]


def main():
    enable_compilation_cache()
    cfg = CodecConfig()
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (T, H, W), dtype=np.uint8)
    fj = jnp.asarray(frames)

    base = jax.jit(
        lambda f: jax.lax.optimization_barrier(framing.frames_to_cubes(f, cfg))
    )
    ref = base(fj)
    print(f"xla        {slope(base, fj)*1e3:7.2f} ms", flush=True)

    for name, impl, rows in [("pl_u8", "u8", 1), ("pl_u8x3", "u8", 3),
                             ("pl_u8x5", "u8", 5), ("pl_i32", "i32", 1)]:
        try:
            got = relayout(fj, rows=rows, impl=impl.split("_")[1].rstrip("x135"))
            ok = bool(jnp.all(got == ref))
        except Exception as e:
            print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:140]}")
            continue
        t = slope(lambda f: relayout(f, rows=rows,
                                     impl=impl.split("_")[1].rstrip("x135")), fj)
        print(f"{name:10s} {t*1e3:7.2f} ms  exact={ok}", flush=True)


if __name__ == "__main__":
    main()
