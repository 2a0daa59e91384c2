"""Sub-bisect the encode TRANSFORM stage + A/B a 3-pass bf16 DCT matmul.

The round-4/5 bisect puts `transform` (frames -> quantized zigzag ints) at
1.8-2.0 ms/GOP vs the decode side's ~0.9 for the same FLOPs.  Stages here:

  relayout   frames_to_cubes_perm (Pallas word transpose)
  unscramble + exact one-hot bf16 matmul -> canonical cube order (f32)
  matmul     + (cubes, cube) @ (cube, cube) f32 HIGHEST [6 MXU passes]
  quantize   + round + exact-DC fix (the full production _frames_to_q)

A/B candidate (VERDICT r4 #7): the HIGHEST f32 matmul decomposes BOTH
operands into bf16 limbs (~6 passes), but the pixel-cube operand is
integers 0..255 — EXACT in one bf16 limb.  Splitting only the constant
encode matrix into 3 bf16 limbs (e1 + e2 + e3 == enc_t exactly in f32)
gives a 3-pass product:  q3 = x_bf @ e1 + x_bf @ e2 + x_bf @ e3, each
bf16xbf16 -> f32.  PARITY GATE: the framework's contract is quantized-int
equality vs the float64 oracle (CLAUDE.md), so the variant must match the
ORACLE on bench + adversarial content before any timing matters.

Run: python tools/ab_encode_3pass.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from dct3d_tpu import oracle
from dct3d_tpu.codec.transform import (
    TransformContext, _PRECISION, _frames_to_q, _round_half_away,
)
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.ops import bitpack, quant, relayout
from dct3d_tpu.utils import enable_compilation_cache

W, H = 1920, 1080
K1, K2 = 2, 12


def clips(cfg):
    rng = np.random.default_rng(12345)
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    grad = np.empty((cfg.gop_size, H, W), np.uint8)
    for k in range(cfg.gop_size):
        grad[k] = ((x[None, :] + y + k) & 0xFF).astype(np.uint8)
    bench = grad ^ rng.integers(0, 16, size=grad.shape, dtype=np.uint8)
    noise = rng.integers(0, 256, size=grad.shape, dtype=np.uint8)
    flat = np.full_like(grad, 128)
    checker = (((x[None, :] // 8) ^ (y // 8)) & 1).astype(np.uint8) * 255
    checker = np.broadcast_to(checker, grad.shape).copy()
    return {"bench": bench, "grad": grad, "noise": noise, "flat": flat,
            "checker": checker}


def split3(m: np.ndarray):
    """enc_t == e1 + e2 + e3 exactly in f64 (each limb a bf16 value)."""
    m64 = m.astype(np.float64)
    e1 = m64.astype(jnp.bfloat16)
    r1 = m64 - np.asarray(e1, np.float64)
    e2 = r1.astype(jnp.bfloat16)
    r2 = r1 - np.asarray(e2, np.float64)
    e3 = r2.astype(jnp.bfloat16)
    resid = np.abs(r2 - np.asarray(e3, np.float64)).max()
    print(f"3-limb split residual: {resid:.3e}")
    return jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(e3)


def main() -> None:
    enable_compilation_cache()
    cfg = CodecConfig()
    ctx = TransformContext(cfg)
    use_pallas = bitpack._tpu_backend()
    e1, e2, e3 = split3(np.asarray(ctx.enc_t))

    def q_3pass(frames):
        """_frames_to_q with the 3-pass matmul (same relayout + DC fix)."""
        t, h, w = frames.shape
        if relayout.supports(cfg, h, w) and t % 8 == 0 and use_pallas:
            perm = relayout.frames_to_cubes_perm(frames)
            cubes = jnp.dot(
                perm.astype(jnp.bfloat16), relayout.unscramble_matrix(),
                preferred_element_type=jnp.float32,
            )
        else:
            from dct3d_tpu.codec import framing

            cubes = jax.lax.optimization_barrier(
                framing.frames_to_cubes(frames, cfg)
            ).astype(jnp.float32)
        xb = cubes.astype(jnp.bfloat16)  # integers 0..255: exact
        scaled = (
            jnp.dot(xb, e1, preferred_element_type=jnp.float32)
            + jnp.dot(xb, e2, preferred_element_type=jnp.float32)
            + jnp.dot(xb, e3, preferred_element_type=jnp.float32)
        )
        q = _round_half_away(scaled, cfg.quant_bias).astype(jnp.int32)
        sums = jnp.sum(cubes.astype(jnp.int32), axis=-1)
        dc = quant.exact_dc_quant(sums, cfg.cube_size, cfg.quant_bias)
        return jnp.where(
            jnp.arange(q.shape[-1], dtype=jnp.int32) == 0, dc[:, None], q
        )

    j_cur = jax.jit(lambda f: _frames_to_q(f, ctx.enc_t, cfg))
    j_3p = jax.jit(q_3pass)

    # ---- parity gate: quantized ints vs the float64 oracle --------------
    all_ok = True
    for name, clip in clips(cfg).items():
        qo = oracle.quantized_coefficients(clip, cfg).reshape(-1, 512)
        qc = np.asarray(j_cur(jnp.asarray(clip)))
        q3 = np.asarray(j_3p(jnp.asarray(clip)))
        dc_ok = np.array_equal(qc, qo)
        d3 = int((q3 != qo).sum())
        print(f"{name:8s}: current=={'oracle' if dc_ok else 'DIFF'}  "
              f"3pass diffs vs oracle: {d3}"
              + ("" if d3 == 0 else
                 f" (first at {np.argwhere(q3 != qo)[:3].tolist()})"),
              flush=True)
        all_ok = all_ok and dc_ok and d3 == 0
    print("PARITY:", "OK — 3-pass matches the oracle on all probes"
          if all_ok else "FAIL — 3-pass is NOT parity-safe", flush=True)

    # ---- slope timing: in-program fori_loop with a DATA DEPENDENCY ------
    # Independent dispatches overlap on device (the first version of this
    # tool measured 0.12 ms "slopes" — pure pipelining); xor-ing a carry
    # byte into the frames serializes iterations like production's carry
    # chain does, and the fori_loop removes per-launch relay RPC.
    bench = jnp.asarray(clips(cfg)["bench"])

    def chained(stage_fn):
        @jax.jit
        def prog(frames, k):
            def body(i, carry):
                out = stage_fn(frames ^ (carry & 1).astype(jnp.uint8))
                return out.reshape(-1)[0].astype(jnp.int32)

            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        return prog

    def run(prog, k):
        jax.device_get(prog(bench, k))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(prog(bench, k))
            best = min(best, time.perf_counter() - t0)
        return best

    def slope(stage_fn):
        p = chained(stage_fn)
        return (run(p, K2) - run(p, K1)) / (K2 - K1)

    for name, fn in (
        ("current(HIGHEST)", lambda f: _frames_to_q(f, ctx.enc_t, cfg)),
        ("3-pass bf16", q_3pass),
    ):
        print(f"{name:18s}: {slope(fn)*1e3:.2f} ms/GOP transform+quant",
              flush=True)

    # ---- sub-bisect of the current transform ----------------------------
    def pfx(stage):
        def fn(frames):
            perm = relayout.frames_to_cubes_perm(frames)
            if stage == "relayout":
                return perm.astype(jnp.int32).sum()[None]
            cubes = jnp.dot(
                perm.astype(jnp.bfloat16), relayout.unscramble_matrix(),
                preferred_element_type=jnp.float32,
            )
            if stage == "unscramble":
                return cubes.sum()[None]
            scaled = jnp.dot(cubes, ctx.enc_t, precision=_PRECISION)
            if stage == "matmul":
                return scaled.sum()[None]
            q = _round_half_away(scaled, cfg.quant_bias).astype(jnp.int32)
            sums = jnp.sum(cubes.astype(jnp.int32), axis=-1)
            dc = quant.exact_dc_quant(sums, cfg.cube_size, cfg.quant_bias)
            return jnp.where(
                jnp.arange(q.shape[-1], dtype=jnp.int32) == 0,
                dc[:, None], q,
            )

        return fn

    prev = 0.0
    for stage in ("relayout", "unscramble", "matmul", "quantize"):
        s = slope(pfx(stage))
        print(f"  {stage:10s}: {s*1e3:5.2f} ms (+{(s-prev)*1e3:5.2f})",
              flush=True)
        prev = s


if __name__ == "__main__":
    main()
