"""Prototype: Pallas level-1 group pack (select-accumulate on the VPU)
vs the XLA one-hot bf16 einsum.  Correctness vs the einsum + slope timing.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dct3d_tpu.ops import bitpack
from dct3d_tpu.utils import enable_compilation_cache

GB = 128  # groups per grid step (VMEM-bound)


def _cumsum_lanes(x):
    """Inclusive prefix sum along axis 1 (Hillis-Steele; cumsum primitive
    is not lowerable in Pallas TPU)."""
    n = x.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < n:
        r = pltpu.roll(x, s, axis=1)
        x = x + jnp.where(idx >= s, r, 0)
        s *= 2
    return x


def _kernel(code_ref, wid_ref, phase_ref, out_ref, *, w_words: int):
    wid = wid_ref[...]
    code = code_ref[...].astype(jnp.uint32)
    phase = phase_ref[...]  # (GB, 1)
    loff = _cumsum_lanes(wid) - wid + phase
    word0 = loff >> 5
    start_bit = loff & 31
    over = start_bit + wid - 32
    shr = jnp.clip(over, 0, 31).astype(jnp.uint32)
    shl = jnp.clip(-over, 0, 31).astype(jnp.uint32)
    c0 = jnp.where(over > 0, code >> shr, code << shl)
    c0 = jnp.where(wid > 0, c0, 0)
    c1 = jnp.where(over > 0, code << (32 - shr), 0)
    # Sum as int32 (unsigned reductions unimplemented in Mosaic); bit
    # patterns are identical under wrapping two's-complement adds.
    c0i = pltpu.bitcast(c0, jnp.int32)
    c1i = pltpu.bitcast(c1, jnp.int32)
    m_prev = jnp.zeros_like(word0, dtype=jnp.bool_)
    cols = []
    for j in range(w_words):
        m0 = word0 == j
        w0j = jnp.sum(jnp.where(m0, c0i, 0), axis=1, keepdims=True)
        w1j = jnp.sum(jnp.where(m_prev, c1i, 0), axis=1, keepdims=True)
        cols.append(w0j + w1j)
        m_prev = m0
    out_ref[...] = pltpu.bitcast(jnp.concatenate(cols, axis=1), jnp.uint32)


@partial(jax.jit, static_argnames=("w_words",))
def group_pack_pallas(code32, wid, phase, w_words: int):
    g_count, group = code32.shape
    pad = (-g_count) % GB
    if pad:
        code32 = jnp.concatenate([code32, jnp.zeros((pad, group), jnp.uint32)])
        wid = jnp.concatenate([wid, jnp.zeros((pad, group), jnp.int32)])
        phase = jnp.concatenate([phase, jnp.zeros((pad,), jnp.int32)])
    gc = code32.shape[0]
    out = pl.pallas_call(
        partial(_kernel, w_words=w_words),
        grid=(gc // GB,),
        in_specs=[
            pl.BlockSpec((GB, group), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, group), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GB, w_words), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gc, w_words), jnp.uint32),
    )(code32, wid, phase[:, None])
    return out[:g_count]


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    g_count, group, w = 64800, 256, 34
    # realistic: sorted word0 comes from widths; emulate via random widths
    wid_np = rng.integers(1, 5, (g_count, group)).astype(np.int32)
    hot = rng.random((g_count, group)) < 0.01
    wid_np[hot] = rng.integers(15, 27, hot.sum())
    code_np = rng.integers(0, 1 << 32, (g_count, group), dtype=np.uint64).astype(np.uint32)
    phase_np = rng.integers(0, 32, g_count).astype(np.int32)
    code = jnp.asarray(code_np)
    wid = jnp.asarray(wid_np)
    phase = jnp.asarray(phase_np)

    ref = jax.jit(bitpack._group_pack, static_argnums=3)(
        code, wid, phase, w
    )
    got = group_pack_pallas(code, wid, phase, w)
    ok = np.array_equal(np.asarray(ref), np.asarray(got))
    print("byte-exact vs einsum:", ok)

    def slope(fn):
        def run(k):
            out = None
            t0 = time.perf_counter()
            for _ in range(k):
                out = fn(code, wid, phase, w)
            jax.device_get(out[0, 0])
            return time.perf_counter() - t0
        run(1)
        return (min(run(8) for _ in range(3)) - min(run(2) for _ in range(3))) / 6

    einsum_fn = jax.jit(bitpack._group_pack, static_argnums=3)
    print(f"einsum: {slope(einsum_fn)*1e3:6.2f} ms")
    print(f"pallas: {slope(group_pack_pallas)*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
