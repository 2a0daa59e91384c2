"""Permuted-cube Pallas relayout: the transform matmul absorbs the layout.

The exact cube order needs a lane interleave Mosaic cannot express (see
proto_relayout_pallas.py: 5-D reshapes, strided lane slices, and minor
collapses all rejected; tools/mosaic probe).  But the cubes feed
`cubes @ enc_t` against a CONSTANT matrix — so ANY fixed permutation of
cube columns works if enc_t's rows are permuted to match at build time.

With the order freed, the kernel is only supported ops, on i32 words
(4 bytes each; byte order survives the bitcast round trip):

  frames u8 (8,1080,1920) --XLA bitcast--> (8,1080,480) i32
  per by-slab: (8,8,480) --collapse--> (64,480) --2D transpose--> (480,64)
  stack slabs -> (64800,64) i32 --XLA reshape+bitcast--> (32400,512) u8

The resulting byte column for cube byte c = 64k+8i+4w+b (w = word of the
j-block, b = byte in word) is sigma(c) = 256w+32k+4i+b.

Checks: (a) permuted relayout == frames_to_cubes()[:, sigma] (CPU,
interpret); (b) q parity: round(cubes_perm @ enc_t[sigma_inv_rows]) vs
production q — the matmul's K-summation ORDER changes, so f32 rounding
may shift; the byte-parity suite is the gate.  (c) TPU slope timing.
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


def sigma(cube_size: int = 512) -> np.ndarray:
    """sigma[c] = position of cube byte c in the permuted layout."""
    c = np.arange(cube_size)
    k, i = c >> 6, (c >> 3) & 7
    w, b = (c >> 2) & 1, c & 3
    return 256 * w + 32 * k + 4 * i + b


def _kernel(x_ref, o_ref):
    x = x_ref[...]  # (8, 8, 480) i32
    t = x.reshape(64, 480).T          # (2bx+w, 8k+i)
    nbw = t.shape[0] // 2
    o_ref[...] = t.reshape(nbw, 2, 64).transpose(0, 2, 1)


def _kernel_perm(x_ref, o_ref):
    x = x_ref[...]  # (8, 8, 480) i32
    o_ref[...] = x.reshape(64, 480).T


@functools.partial(jax.jit, static_argnames=("interpret",))
def relayout_id(frames, interpret: bool = False):
    """Byte-identical to frames_to_cubes: the (m, w) minor pair IS the
    8-byte j-block, so the final (64,2)i32 -> 512B collapse is a pure
    relabel done outside the kernel (bitcast + minor reshape, no copy)."""
    t, h, w = frames.shape
    nbh, nbw = h // 8, w // 8
    w32 = w // 4
    x32 = jax.lax.bitcast_convert_type(
        frames.reshape(t, h, w32, 4), jnp.int32
    )
    out = pl.pallas_call(
        _kernel,
        grid=(nbh,),
        in_specs=[pl.BlockSpec((t, 8, w32), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nbw, 64, 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbh * nbw, 64, 2), jnp.int32),
        interpret=interpret,
    )(x32)
    by = jax.lax.bitcast_convert_type(out, jnp.uint8)
    return by.reshape(nbh * nbw, 512)


@functools.partial(jax.jit, static_argnames=("interpret",))
def relayout_perm(frames, interpret: bool = False):
    t, h, w = frames.shape
    nbh, nbw = h // 8, w // 8
    w32 = w // 4
    x32 = jax.lax.bitcast_convert_type(
        frames.reshape(t, h, w32, 4), jnp.int32
    )
    out = pl.pallas_call(
        _kernel_perm,
        grid=(nbh,),
        in_specs=[pl.BlockSpec((t, 8, w32), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2 * nbw, 64), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbh * 2 * nbw, 64), jnp.int32),
        interpret=interpret,
    )(x32)
    by = jax.lax.bitcast_convert_type(
        out.reshape(nbh * nbw, 128), jnp.uint8
    )
    return by.reshape(nbh * nbw, 512)


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
    cpu_only = "--cpu" in sys.argv
    cfg = CodecConfig()
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (8, 1080, 1920), dtype=np.uint8)
    fj = jnp.asarray(frames)
    sg = sigma()

    if cpu_only:
        jax.config.update("jax_platforms", "cpu")
        ref = np.asarray(framing.frames_to_cubes(fj, cfg))
        got_id = np.asarray(relayout_id(fj, interpret=True))
        print("id-exact (interpret):", bool((got_id == ref).all()))
        got = np.asarray(relayout_perm(fj, interpret=True))
        want = np.zeros_like(ref)
        want[:, sg] = ref
        print("perm-exact (interpret):", bool((got == want).all()))

        # q parity vs production under the permuted matmul
        from dct3d_tpu.codec.transform import (
            TransformContext, _PRECISION, _round_half_away,
        )
        ctx = TransformContext(cfg)
        enc_t = np.asarray(ctx.enc_t)
        enc_p = np.zeros_like(enc_t)
        enc_p[sg, :] = enc_t
        q_ref = _round_half_away(
            jnp.dot(jnp.asarray(ref).astype(jnp.float32), jnp.asarray(enc_t),
                    precision=_PRECISION), 0.5).astype(jnp.int32)
        q_got = _round_half_away(
            jnp.dot(jnp.asarray(got).astype(jnp.float32), jnp.asarray(enc_p),
                    precision=_PRECISION), 0.5).astype(jnp.int32)
        diff = int((np.asarray(q_ref) != np.asarray(q_got)).sum())
        print(f"q mismatches on random frames (CPU f32): {diff}")
        return

    enable_compilation_cache()
    base = jax.jit(
        lambda f: jax.lax.optimization_barrier(framing.frames_to_cubes(f, cfg))
    )
    ref = np.asarray(base(fj))
    try:
        got_id = np.asarray(relayout_id(fj))
        print("id-exact (TPU):", bool((got_id == ref).all()))
    except Exception as e:
        print("relayout_id FAILED:", type(e).__name__, str(e)[:140])
    got = np.asarray(relayout_perm(fj))
    want = np.zeros_like(ref)
    want[:, sg] = ref
    print("perm-exact (TPU):", bool((got == want).all()))
    print(f"xla   {slope(base, fj)*1e3:7.2f} ms")
    try:
        print(f"id    {slope(relayout_id, fj)*1e3:7.2f} ms")
    except Exception:
        pass
    print(f"perm  {slope(relayout_perm, fj)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
