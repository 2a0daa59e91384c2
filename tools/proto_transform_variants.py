"""Transform-stage variants: can the cube relayout or the HIGHEST-precision
matmul be made cheaper?  (Slope-timed on the real TPU; see profile_slope.py
for the methodology.)

The encode transform is  frames (8,1080,1920) uint8
    -> reshape/transpose to (32400, 512)   [the "relayout"]
    -> @ enc_t (512, 512) f32, Precision.HIGHEST
    -> round -> int32

Variants measured:
  base      production form (relayout + convert + HIGHEST matmul)
  floor     matmul only, input already cube-major (what the MXU could do)
  einsum    6-D einsum contraction -- lets XLA pick where the relayout goes
  staged    optimization_barrier between relayout and matmul (forces the
            transpose into its own fusion; tests whether the fused form
            double-pays)
  u8stage   transpose in uint8, barrier, then convert+matmul (moves the
            relayout copy to 1 byte/elem instead of 4)
  bf16x2    relayout + convert to bf16 (uint8 is EXACT in bf16) then
            x @ m_hi + x @ m_lo with f32 accumulation: 2 MXU passes versus
            HIGHEST's ~6.  Parity must be re-verified if ever adopted.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.codec import framing
from dct3d_tpu.codec.transform import TransformContext, _PRECISION, _round_half_away
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.utils import enable_compilation_cache

REPS = 3
K1, K2 = 2, 10


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


def slope(make_looped, *args):
    t1 = run_once(make_looped(K1), *args)
    t2 = run_once(make_looped(K2), *args)
    return (t2 - t1) / (K2 - K1)


def looped(body_of):
    """body_of(frames_or_cubes, salt) -> scalar; returns k-looped jit."""

    def mk(k):
        @jax.jit
        def f(x, m):
            def body(_, carry):
                return body_of(x ^ (carry & 1), m)

            return jax.lax.fori_loop(0, k, body, jnp.uint8(0))

        return f

    return mk


def main():
    enable_compilation_cache()
    cfg = CodecConfig()
    ctx = TransformContext(cfg)
    rng = np.random.default_rng(1)
    T, H, W = 8, 1080, 1920
    frames = np.empty((T, H, W), np.uint8)
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    for k in range(T):
        frames[k] = ((x[None, :] + y + k) & 0xFF).astype(np.uint8)
    frames ^= rng.integers(0, 16, size=frames.shape, dtype=np.uint8)
    fj = jnp.asarray(frames)
    enc = ctx.enc_t

    def q_of(scaled):
        return (
            _round_half_away(scaled, 0.5)
            .astype(jnp.int32)
            .sum()
            .astype(jnp.uint8)
        )

    # base: production
    def base(fr, m):
        c = framing.frames_to_cubes(fr, cfg).astype(jnp.float32)
        return q_of(jnp.dot(c, m, precision=_PRECISION))

    # floor: pre-cubed input (relayout excluded from the loop)
    cubes_u8 = jax.jit(lambda fr: framing.frames_to_cubes(fr, cfg))(fj)

    def floor_(cu, m):
        return q_of(jnp.dot(cu.astype(jnp.float32), m, precision=_PRECISION))

    # einsum over the 6-D view: no explicit transpose
    def einsum6(fr, m):
        t, h, w = fr.shape
        bd = cfg.block_d
        x6 = fr.reshape(t // bd, bd, h // bd, bd, w // bd, bd).astype(
            jnp.float32
        )
        m6 = m.reshape(bd, bd, bd, m.shape[1])
        out = jnp.einsum(
            "gkylxc,klco->gyxo", x6, m6, precision=_PRECISION
        )
        return q_of(out)

    # staged: barrier between relayout(f32) and matmul
    def staged(fr, m):
        c = framing.frames_to_cubes(fr, cfg).astype(jnp.float32)
        c = jax.lax.optimization_barrier(c)
        return q_of(jnp.dot(c, m, precision=_PRECISION))

    # u8stage: transpose in uint8, barrier, convert in the matmul fusion
    def u8stage(fr, m):
        c = framing.frames_to_cubes(fr, cfg)
        c = jax.lax.optimization_barrier(c)
        return q_of(jnp.dot(c.astype(jnp.float32), m, precision=_PRECISION))

    # bf16x2: exact uint8 operand in bf16, split matrix, 2 passes
    m_hi = enc.astype(jnp.bfloat16)
    m_lo = (enc - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def bf16x2(fr, _):
        c = framing.frames_to_cubes(fr, cfg).astype(jnp.bfloat16)
        s = jnp.dot(c, m_hi, preferred_element_type=jnp.float32) + jnp.dot(
            c, m_lo, preferred_element_type=jnp.float32
        )
        return q_of(s)

    for name, fn, arg in [
        ("base", base, fj),
        ("floor", floor_, cubes_u8),
        ("einsum6", einsum6, fj),
        ("staged", staged, fj),
        ("u8stage", u8stage, fj),
        ("bf16x2", bf16x2, fj),
    ]:
        ms = slope(looped(fn), arg, enc) * 1e3
        print(f"{name:10s} {ms:7.2f} ms")

    # parity probe for bf16x2: max |q - q_ref| over this clip
    q_ref = jax.jit(
        lambda fr: _round_half_away(
            jnp.dot(
                framing.frames_to_cubes(fr, cfg).astype(jnp.float32),
                enc,
                precision=_PRECISION,
            ),
            0.5,
        ).astype(jnp.int32)
    )(fj)
    q_b = jax.jit(
        lambda fr: _round_half_away(
            jnp.dot(
                framing.frames_to_cubes(fr, cfg).astype(jnp.bfloat16),
                m_hi,
                preferred_element_type=jnp.float32,
            )
            + jnp.dot(
                framing.frames_to_cubes(fr, cfg).astype(jnp.bfloat16),
                m_lo,
                preferred_element_type=jnp.float32,
            ),
            0.5,
        ).astype(jnp.int32)
    )(fj)
    diff = int(jnp.abs(q_b - q_ref).max())
    nmis = int((q_b != q_ref).sum())
    print(f"bf16x2 parity: max|dq|={diff}  mismatched ints={nmis}/{q_ref.size}")


if __name__ == "__main__":
    main()
