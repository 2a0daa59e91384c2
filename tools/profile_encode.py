"""Stage-level timing of the encode hot path on the real TPU.

Times cumulative prefixes of the encode pipeline as separate jitted
programs, so the difference between consecutive rows isolates one stage:

  transform   frames -> cubes -> matmul -> round       (quantize_step)
  codewords   + Exp-Golomb (code, width)
  l1          + per-group aligned word sums (the one-hot MXU einsum)
  full        the shipped encode_step (adds level-2 assembly + carry)

Every timing forces execution with a tiny device_get (block_until_ready is
a no-op through the relay).  Run in ONE process; first execution per
program pays the remote load.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.codec import framing
from dct3d_tpu.codec.transform import (
    TransformContext, _PRECISION, _round_half_away, encode_step,
)
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.ops import bitpack, expgolomb
from dct3d_tpu.utils import enable_compilation_cache

W, H = 1920, 1080
REPS = 5


def timeit(fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])  # warm: compile + remote load
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    enable_compilation_cache()
    cfg = CodecConfig(pack_bits_per_value=4)
    ctx = TransformContext(cfg)
    rngs = np.random.default_rng(1)
    frames = np.empty((cfg.gop_size, H, W), np.uint8)
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    for k in range(cfg.gop_size):
        frames[k] = ((x[None, :] + y + k) & 0xFF).astype(np.uint8)
    frames ^= rngs.integers(0, 16, size=frames.shape, dtype=np.uint8)
    fj = jnp.asarray(frames)
    n = frames.size
    mb = ctx.max_packed_bytes(n)
    mw = bitpack.max_codeword_bits(cfg.cube_size)

    @jax.jit
    def stage_transform(f):
        cubes = framing.frames_to_cubes(f, cfg).astype(ctx.enc_t.dtype)
        scaled = jnp.dot(cubes, ctx.enc_t, precision=_PRECISION)
        q = _round_half_away(scaled, cfg.quant_bias).astype(jnp.int32)
        return q.sum()  # tiny fetch, keeps everything live

    @jax.jit
    def stage_codewords(f):
        cubes = framing.frames_to_cubes(f, cfg).astype(ctx.enc_t.dtype)
        scaled = jnp.dot(cubes, ctx.enc_t, precision=_PRECISION)
        q = _round_half_away(scaled, cfg.quant_bias).astype(jnp.int32)
        code, width = expgolomb.codewords(q.reshape(-1))
        return code.sum() + width.sum().astype(jnp.uint32)

    def l1_only(f, group=256):
        cubes = framing.frames_to_cubes(f, cfg).astype(ctx.enc_t.dtype)
        scaled = jnp.dot(cubes, ctx.enc_t, precision=_PRECISION)
        q = _round_half_away(scaled, cfg.quant_bias).astype(jnp.int32)
        code, width = expgolomb.codewords(q.reshape(-1))
        width = width.astype(jnp.int32)
        nn = width.shape[0]
        pad = (-nn) % group
        code32 = code.astype(jnp.uint32)
        if pad:
            code32 = jnp.concatenate([code32, jnp.zeros((pad,), jnp.uint32)])
            width = jnp.concatenate([width, jnp.zeros((pad,), jnp.int32)])
        g_count = (nn + pad) // group
        w_words = -(-group * min(mw, 32) // 32) + 2
        code32 = code32.reshape(g_count, group)
        wid = width.reshape(g_count, group)
        gbits = wid.sum(axis=1)
        gstart = jnp.cumsum(gbits) - gbits
        phase = (gstart & 31).astype(jnp.int32)
        loff = jnp.cumsum(wid, axis=1) - wid + phase[:, None]
        word0 = (loff >> 5).astype(jnp.int32)
        start_bit = (loff & 31).astype(jnp.int32)
        over = start_bit + wid - 32
        shr = jnp.clip(over, 0, 31).astype(jnp.uint32)
        shl = jnp.clip(-over, 0, 31).astype(jnp.uint32)
        c0 = jnp.where(over > 0, code32 >> shr, code32 << shl)
        c0 = jnp.where(wid > 0, c0, 0)
        c1 = jnp.where(over > 0, code32 << (32 - shr), 0)
        onehot = (
            word0[:, :, None]
            == jnp.arange(w_words, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.bfloat16)
        planes = jnp.stack(
            [
                (c0 >> 24) & 0xFF, (c0 >> 16) & 0xFF, (c0 >> 8) & 0xFF,
                c0 & 0xFF,
                (c1 >> 24) & 0xFF, (c1 >> 16) & 0xFF, (c1 >> 8) & 0xFF,
                c1 & 0xFF,
            ],
            axis=-1,
        ).astype(jnp.bfloat16)
        sums = jnp.einsum(
            "gcw,gcx->gwx", onehot, planes,
            preferred_element_type=jnp.float32,
        ).astype(jnp.uint32)
        w0 = (sums[..., 0] << 24) + (sums[..., 1] << 16) + (sums[..., 2] << 8) + sums[..., 3]
        w1 = (sums[..., 4] << 24) + (sums[..., 5] << 16) + (sums[..., 6] << 8) + sums[..., 7]
        buf_groups = w0 + jnp.concatenate(
            [jnp.zeros((g_count, 1), jnp.uint32), w1[:, :-1]], axis=1
        )
        return buf_groups.sum()

    @jax.jit
    def stage_full(f):
        g = encode_step(f, ctx.enc_t, jnp.uint32(0), jnp.int32(0),
                        max_bytes=mb, cfg=cfg)
        return g.packed[:1], g.total_bits

    rows = [
        ("transform", timeit(stage_transform, fj)),
        ("codewords", timeit(stage_codewords, fj)),
        ("l1_g256", timeit(jax.jit(functools.partial(l1_only, group=256)), fj)),
        ("l1_g512", timeit(jax.jit(functools.partial(l1_only, group=512)), fj)),
        ("full", timeit(stage_full, fj)),
    ]
    prev = 0.0
    for name, s in rows:
        print(f"{name:12s} {s*1e3:9.2f} ms  (+{(s-prev)*1e3:8.2f} ms)"
              f"  {cfg.gop_size/s:8.1f} fps")
        if name.startswith(("transform", "codewords", "l1_g256")) or name == "full":
            prev = s


if __name__ == "__main__":
    main()
