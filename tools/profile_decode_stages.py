"""Slope-bisect the PRODUCTION device decode step at 1080p (round 4).

Bisects the exact planar4_to_frames composition the decoder dispatches
(codec/transform.py: nibble expand -> exception scatter -> column-permuted
split matmul -> clamp -> Pallas inverse word-transpose relayout), so
PERFORMANCE.md's decode roofline rests on the same code the drivers run —
unlike the older profile_decode_bisect.py, which predates the perm path.

The wire_* prefix stages deliberately replicate the ROUND-4-REPLACED
byte-order wire composition (wire_to_plane + scatter) — the measured
baseline the word-grouped rework beat (+3.2 -> +0.3 ms); `prod_full` /
`prod_wire` time the SHIPPED planar4_to_frames both ways.

Method: device-resident chained fori_loop (K iterations in ONE program),
slope between K1 and K2 (see constants below) removes the ~26-40 ms relay
RPC latency (CLAUDE.md).  Each stage prefix ends in a scalar so XLA cannot fuse the
truncated tail away differently between runs; `full` materializes frames.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.codec.transform import (
    TransformContext, _PRECISION, planar4_to_frames,
)
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.ops import bitpack, relayout
from dct3d_tpu.utils import enable_compilation_cache

REPS = 5
K1, K2 = 2, 14


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
    T, H, W = cfg.gop_size, 1080, 1920
    n = T * H * W
    assert relayout.supports(cfg, H, W)
    use_pallas = bitpack._tpu_backend()
    print(f"backend pallas={use_pallas}  n={n}  cubes={n // cfg.cube_size}")

    # Realistic reference-profile planar4 inputs: packed nibble plane plus
    # one DC exception per cube (typical content's DCs exceed the nibble)
    # and a sprinkle of AC outliers.
    plane = rng.integers(0, 256, n // 2, dtype=np.uint16).astype(np.uint8)
    cubes = n // cfg.cube_size
    ac_idx = np.sort(rng.choice(
        np.setdiff1d(np.arange(n), np.arange(cubes) * cfg.cube_size),
        8192, replace=False))
    exc_idx = np.sort(np.concatenate(
        [ac_idx, np.arange(cubes) * cfg.cube_size])).astype(np.int32)
    n_exc = exc_idx.size
    exc_val = rng.integers(-2000, 2000, n_exc).astype(np.int32)
    pd, pi, pv = jnp.asarray(plane), jnp.asarray(exc_idx), jnp.asarray(exc_val)
    # Round-5 production flat route: dense DC split host-side and spliced
    # on device; the exception scatter keeps only the AC outliers.
    from dct3d_tpu.codec.decoder import _split_dc_flat

    fdc, fi, fv = _split_dc_flat(plane, exc_idx.astype(np.int64), exc_val,
                                 cfg.cube_size)
    sdc, spi, spv = (jnp.asarray(fdc), jnp.asarray(fi.astype(np.int32)),
                     jnp.asarray(fv))
    # Turbo wire layout: (cube/2, cubes) plane as it arrives off the member.
    wire = jnp.asarray(
        plane.reshape(-1, cfg.cube_size // 2).T.copy()
    )

    inv = relayout.inv_sigma(cfg.cube_size)
    dec_me = ctx.dec_me[:, inv]
    dec_mo = ctx.dec_mo[:, inv]
    hc = cfg.cube_size // 2

    def prefix(stage):
        def fn(plane, ei, ev, salt):
            plane = plane ^ (salt & 1).astype(jnp.uint8)
            if stage == "prod_split":
                # The SHIPPED flat route (decoder._dispatch_planar4):
                # AC-only scatter + DC column splice.
                return planar4_to_frames(
                    plane, spi, spv, ctx.dec_me, ctx.dec_mo, cfg=cfg,
                    height=H, width=W, dc=sdc,
                )
            if stage.startswith("prod"):
                # The shipped composition itself (codec/transform.py), so
                # the roofline cannot drift from production code.
                return planar4_to_frames(
                    plane, ei, ev, ctx.dec_me, ctx.dec_mo, cfg=cfg,
                    height=H, width=W, wire=(stage == "prod_wire"),
                )
            if stage.startswith("wire"):
                plane = relayout.wire_to_plane(plane, use_pallas=use_pallas)
                if stage == "wire":
                    return plane.sum(dtype=jnp.int32)
            b = plane.astype(jnp.int32)
            lo = (((b & 0xF) ^ 8) - 8).reshape(-1)
            hi = ((((b >> 4) & 0xF) ^ 8) - 8).reshape(-1)
            if stage.endswith("expand"):
                return lo.sum() + hi.sum()
            half = lo.shape[0]
            e_even = jnp.where((ei & 1) == 0, ei >> 1, half)
            e_odd = jnp.where((ei & 1) == 1, ei >> 1, half)
            lo = lo.at[e_even].set(ev, mode="drop", unique_indices=True)
            hi = hi.at[e_odd].set(ev, mode="drop", unique_indices=True)
            if stage.endswith("scatter"):
                return lo.sum() + hi.sum()
            pixels = (
                jnp.dot(lo.reshape(-1, hc).astype(dec_me.dtype), dec_me,
                        precision=_PRECISION)
                + jnp.dot(hi.reshape(-1, hc).astype(dec_mo.dtype), dec_mo,
                          precision=_PRECISION)
            )
            if stage.endswith("matmul"):
                return pixels.sum()
            pixels = jnp.clip(pixels, 0.0, 255.0)
            frames = relayout.cubes_perm_to_frames(
                pixels.astype(jnp.uint8), height=H, width=W,
                use_pallas=use_pallas,
            )
            if stage == "relayout":
                return frames.sum(dtype=jnp.int32)
            return frames

        return fn

    stages = ("expand", "scatter", "matmul", "relayout", "full",
              "wire", "wire_expand", "wire_scatter", "wire_matmul",
              "wire_full", "prod_full", "prod_split", "prod_wire")
    results = {}
    for stage in stages:
        body_fn = prefix(stage)
        src = wire if stage in ("wire", "wire_expand", "wire_scatter",
                                "wire_matmul", "wire_full",
                                "prod_wire") else pd

        def mk(k, body_fn=body_fn):
            @jax.jit
            def f(plane, ei, ev):
                def body(i, carry):
                    out = body_fn(plane, ei, ev, carry)
                    return jax.tree.leaves(out)[0].reshape(-1)[0].astype(
                        jnp.int32)

                return jax.lax.fori_loop(0, k, body, jnp.int32(0))

            return f

        ms = slope(mk, src, pi, pv) * 1e3
        results[stage] = ms
        print(f"{stage:9s} {ms:8.2f} ms")

    print("\nincrements (ms):")
    order = ["expand", "scatter", "matmul", "relayout", "full"]
    prev = 0.0
    for s in order:
        print(f"  {s:9s} +{results[s] - prev:6.2f}")
        prev = results[s]
    print(f"  wire pre  +{results['wire_full'] - results['full']:6.2f} "
          f"(wire_to_plane alone {results['wire']:.2f})")
    prev = 0.0
    for s in ("wire", "wire_expand", "wire_scatter", "wire_matmul",
              "wire_full"):
        print(f"  {s:12s} +{results[s] - prev:6.2f}")
        prev = results[s]


if __name__ == "__main__":
    main()
