"""Level-1 Pallas pack: roll-combined spill stream (round-4 prototype).

The shipped kernel (ops/group_pack.py) folds the two fragment streams by
LANE-CONCATENATION: Z=[c0|c1] (GB, 512), W=[word0|word0+1], then one
masked sum per output word over 512 lanes.  But the spill c1[i] always
belongs to the word the NEXT lane starts in: width <= 29 < 32 means a
codeword spills into exactly one following word, and the next codeword
starts in that same word (word0[i+1] == word0[i] + 1 whenever over[i] > 0,
because loff[i+1] = loff[i] + wid[i] lands in it; this holds across
zero-width lanes too, since they inherit the same loff).  The spill's bits
[0, over[i]) and the next codeword's bits [start_bit[i+1] = over[i], ...)
are disjoint, so

    z = c0 + roll(c1, 1)        (wrapping int32 add == OR on disjoint bits)

is a single 256-lane stream with key word0 — HALF the compare/select/
reduce work of the 512-lane concat.  The group's very last spill has no
following lane; it is re-added per word from the (GB, 1) tail column.

Variants measured here against the shipped kernel (byte-checked):
  roll        the halved-stream kernel above
  roll_sub4   roll + sub-group split: pack 4 sub-groups of 64 values into
              budget-capped sub-buffers (w_sub words), then combine the
              4*w_sub sub-words into the group buffer by word offset —
              select-accumulate work 4*128*w_sub + 4*w_sub*w_words vs
              roll's 256*w_words.

Run on the real TPU; slope-timed.  2026-08-20.
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
from dct3d_tpu.ops.group_pack import _cumsum_lanes, GB
from dct3d_tpu.utils import enable_compilation_cache

K2, K10 = 2, 12
G_COUNT, GROUP = 64800, 256
W_WORDS = 34  # budget 4 (the new default)


def _codewords(v):
    m = jnp.where(v > 0, 2 * v - 1, -2 * v)
    code = m + 1
    expo = (pltpu.bitcast(code.astype(jnp.float32), jnp.int32) >> 23) & 0xFF
    wid = 2 * (expo - 126) - 1
    return pltpu.bitcast(code, jnp.uint32), wid


def _fragments(code, wid, phase):
    inc = _cumsum_lanes(wid)
    loff = inc - wid + phase
    word0 = loff >> 5
    start_bit = loff & 31
    over = start_bit + wid - 32
    shr = jnp.clip(over, 0, 31).astype(jnp.uint32)
    shl = jnp.clip(-over, 0, 31).astype(jnp.uint32)
    c0 = jnp.where(over > 0, code >> shr, code << shl)
    c0 = jnp.where(wid > 0, c0, 0)
    c1 = jnp.where(over > 0, code << (32 - shr), 0)
    return (pltpu.bitcast(c0, jnp.int32), pltpu.bitcast(c1, jnp.int32),
            word0, inc)


def _kernel_roll(val_ref, phase_ref, out_ref, *, w_words: int):
    code, wid = _codewords(val_ref[...])
    phase = phase_ref[...]
    c0, c1, word0, inc = _fragments(code, wid, phase)
    idx = jax.lax.broadcasted_iota(jnp.int32, c1.shape, 1)
    c1r = jnp.where(idx >= 1, pltpu.roll(c1, 1, axis=1), 0)
    z = c0 + c1r  # disjoint bits within the shared word
    # tail: last lane's spill belongs to word0[:, -1] + 1
    tail_w = word0[:, -1:] + 1
    tail_v = c1[:, -1:]
    cols = [
        jnp.sum(jnp.where(word0 == j, z, 0), axis=1, keepdims=True)
        + jnp.where(tail_w == j, tail_v, 0)
        for j in range(w_words)
    ]
    out_ref[...] = pltpu.bitcast(jnp.concatenate(cols, axis=1), jnp.uint32)


def _kernel_roll_sub(val_ref, phase_ref, out_ref, *, w_words: int,
                     sub: int, w_sub: int):
    """roll + sub-group split: SUB independent packs of (group/sub) values,
    then an offset-keyed combine of the sub-buffer words."""
    v = val_ref[...]
    gb, group = v.shape
    code, wid = _codewords(v)
    phase = phase_ref[...]
    n_sub = group // sub
    # per-sub bit totals -> sub start offsets within the group
    inc_all = _cumsum_lanes(wid)
    # sub s spans lanes [s*sub, (s+1)*sub); its start bit = phase + inc_all
    # at lane s*sub - 1 (0 for s=0).
    cols_out = [jnp.zeros((gb, 1), jnp.int32) for _ in range(w_words)]
    for s in range(n_sub):
        lo = s * sub
        wid_s = wid[:, lo : lo + sub]
        code_s = code[:, lo : lo + sub]
        base = phase[:, :1] if s == 0 else (
            phase[:, :1] + inc_all[:, lo - 1 : lo]
        )
        off_words = base >> 5  # sub buffer word 0 = group word off_words
        sphase = base & 31
        c0, c1, w0, _ = _fragments(code_s, wid_s, sphase)
        idxs = jax.lax.broadcasted_iota(jnp.int32, c1.shape, 1)
        c1r = jnp.where(idxs >= 1, pltpu.roll(c1, 1, axis=1), 0)
        z = c0 + c1r
        tail_w = w0[:, -1:] + 1
        tail_v = c1[:, -1:]
        subcols = [
            jnp.sum(jnp.where(w0 == j, z, 0), axis=1, keepdims=True)
            + jnp.where(tail_w == j, tail_v, 0)
            for j in range(w_sub)
        ]
        # combine: sub word k -> group word off_words + k
        for k in range(w_sub):
            tgt = off_words + k
            for j in range(w_words):
                cols_out[j] = cols_out[j] + jnp.where(tgt == j, subcols[k], 0)
    out_ref[...] = pltpu.bitcast(
        jnp.concatenate(cols_out, axis=1), jnp.uint32
    )


def _call(kernel, values, phase, w_words: int):
    gc = values.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(gc // GB,),
        in_specs=[
            pl.BlockSpec((GB, values.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GB, w_words), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gc, w_words), jnp.uint32),
    )(values, phase[:, None])


@jax.jit
def roll(values, phase):
    return _call(functools.partial(_kernel_roll, w_words=W_WORDS),
                 values, phase, W_WORDS)


@functools.partial(jax.jit, static_argnames=("sub", "w_sub"))
def roll_sub(values, phase, sub: int = 64, w_sub: int = 12):
    return _call(
        functools.partial(_kernel_roll_sub, w_words=W_WORDS, sub=sub,
                          w_sub=w_sub),
        values, phase, W_WORDS)


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


def main() -> None:
    enable_compilation_cache()
    rng = np.random.default_rng(3)
    vals = (rng.standard_normal((G_COUNT, GROUP)) * 1.2).astype(np.int32)
    vals[:, 0] = rng.integers(-4000, 4000, G_COUNT)
    values = jnp.asarray(vals)
    phase = jnp.asarray(rng.integers(0, 32, G_COUNT).astype(np.int32))

    ref = group_pack.group_pack_values_pallas(values, phase, W_WORDS)
    for name, fn in [
        ("roll", lambda v, p: roll(v, p)),
        ("roll_sub64x12", lambda v, p: roll_sub(v, p, 64, 12)),
        ("roll_sub64x10", lambda v, p: roll_sub(v, p, 64, 10)),
    ]:
        try:
            got = fn(values, phase)
            ok = bool(jnp.all(got == ref))
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:140]}")
            continue
        t = slope(fn, values, phase)
        print(f"{name:14s} {t*1e3:7.2f} ms  exact={ok}", flush=True)

    t0 = slope(
        lambda v, p: group_pack.group_pack_values_pallas(v, p, W_WORDS),
        values, phase)
    print(f"{'shipped':14s} {t0*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
