"""Level-1 Pallas pack variants (the kernel is ~3.8 ms of a ~10 ms step).

Variants, all byte-checked against ops/group_pack.group_pack_values_pallas:

  base      shipped kernel (per word j: TWO masked sums over (GB,256) —
            c0 where word0==j plus c1 where word0==j-1)
  fold512   ONE masked sum per word over the lane-concatenated (GB,512)
            array Z=[c0|c1], W=[word0|word0+1] — same elements touched,
            half the compare/select/reduce instruction streams
  gb256     base kernel with GB=256 groups per grid step (fewer grid steps)
  fold_gb256  fold512 with GB=256

Run on the real TPU; slope-timed (K dispatches chained, one fetch).
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

from dct3d_tpu.ops import group_pack
from dct3d_tpu.ops.group_pack import _cumsum_lanes
from dct3d_tpu.utils import enable_compilation_cache

K2, K10 = 2, 12
G_COUNT, GROUP, W_WORDS = 64800, 256, 34


def _codewords(v):
    m = jnp.where(v > 0, 2 * v - 1, -2 * v)
    code = m + 1
    expo = (pltpu.bitcast(code.astype(jnp.float32), jnp.int32) >> 23) & 0xFF
    wid = 2 * (expo - 126) - 1
    return pltpu.bitcast(code, jnp.uint32), wid


def _fragments(code, wid, phase):
    loff = _cumsum_lanes(wid) - wid + phase
    word0 = loff >> 5
    start_bit = loff & 31
    over = start_bit + wid - 32
    shr = jnp.clip(over, 0, 31).astype(jnp.uint32)
    shl = jnp.clip(-over, 0, 31).astype(jnp.uint32)
    c0 = jnp.where(over > 0, code >> shr, code << shl)
    c0 = jnp.where(wid > 0, c0, 0)
    c1 = jnp.where(over > 0, code << (32 - shr), 0)
    return (pltpu.bitcast(c0, jnp.int32), pltpu.bitcast(c1, jnp.int32),
            word0)


def _kernel_fold(val_ref, phase_ref, out_ref, *, w_words: int):
    code, wid = _codewords(val_ref[...])
    c0i, c1i, word0 = _fragments(code, wid, phase_ref[...])
    z = jnp.concatenate([c0i, c1i], axis=1)          # (GB, 2*group)
    w = jnp.concatenate([word0, word0 + 1], axis=1)
    cols = [
        jnp.sum(jnp.where(w == j, z, 0), axis=1, keepdims=True)
        for j in range(w_words)
    ]
    out_ref[...] = pltpu.bitcast(jnp.concatenate(cols, axis=1), jnp.uint32)


def _call(kernel, values, phase, gb: int, w_words: int):
    gc = values.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(gc // gb,),
        in_specs=[
            pl.BlockSpec((gb, values.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, w_words), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gc, w_words), jnp.uint32),
    )(values, phase[:, None])


@functools.partial(jax.jit, static_argnames=("gb",))
def fold(values, phase, gb: int = 128):
    return _call(functools.partial(_kernel_fold, w_words=W_WORDS),
                 values, phase, gb, W_WORDS)


@functools.partial(jax.jit, static_argnames=("gb",))
def base_gb(values, phase, gb: int = 256):
    return _call(
        functools.partial(group_pack._kernel_values, w_words=W_WORDS),
        values, phase, gb, W_WORDS)


def slope(fn, *args):
    out = fn(*args)
    jax.device_get(out[:1])
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(K2):
            out = fn(*args)
        jax.device_get(out[:1])
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(K10):
            out = fn(*args)
        jax.device_get(out[:1])
        t10 = time.perf_counter() - t0
        slopes.append((t10 - t2) / (K10 - K2))
    return sorted(slopes)[1]


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(3)
    # realistic quantized coefficients: mostly 0/±1, occasional large
    vals = (rng.standard_normal((G_COUNT, GROUP)) * 1.2).astype(np.int32)
    vals[:, 0] = rng.integers(-4000, 4000, G_COUNT)
    values = jnp.asarray(vals)
    phase = jnp.asarray(rng.integers(0, 32, G_COUNT).astype(np.int32))

    ref = group_pack.group_pack_values_pallas(values, phase, W_WORDS)
    for name, fn in [("fold512/gb128", lambda v, p: fold(v, p, 128)),
                     ("fold512/gb256", lambda v, p: fold(v, p, 256)),
                     ("base/gb256", lambda v, p: base_gb(v, p, 256))]:
        try:
            got = fn(values, phase)
            ok = bool(jnp.all(got == ref))
        except Exception as e:  # VMEM overflow etc.
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        t = slope(fn, values, phase)
        print(f"{name:14s} {t*1e3:7.2f} ms  exact={ok}", flush=True)

    t0 = slope(
        lambda v, p: group_pack.group_pack_values_pallas(v, p, W_WORDS),
        values, phase)
    print(f"{'base/gb128':14s} {t0*1e3:7.2f} ms  (shipped)")


if __name__ == "__main__":
    main()
