#!/usr/bin/env python
"""Prototype: emit the turbo wire plane COEFFICIENT-pair-major on device.

The turbo wire stores the transpose of the device transport's
(cubes, cube/2) nibble plane (docs/FORMAT.md).  Today the transpose runs
on host (native byte_transpose, ~16 ms/GOP at 1080p inside the drain
pool).  If the device can emit the (cube/2, cubes) layout directly for
less than that (amortized across the pool it only has to beat
16 ms / pool_width), _member_payload's transpose disappears.

Run on the real TPU (slope-timed, K dispatches per measurement):
    python tools/proto_turbo_pairmajor.py
On CPU it still verifies byte-equality of the two layouts.

Verdict slot (fill in after a TPU run): PENDING — relay was down when
this was written.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax

    if "--cpu" in sys.argv:  # correctness-only run (e.g. relay down)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dct3d_tpu.config import CodecConfig
    from dct3d_tpu.codec import turbo
    from dct3d_tpu.codec.transform import TransformContext, _frames_to_q
    from dct3d_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = CodecConfig()
    ctx = TransformContext(cfg)
    rng = np.random.default_rng(7)
    h, w = (1080, 1920) if "--cpu" not in sys.argv else (216, 384)
    frames = (rng.integers(0, 16, (8, h, w)).astype(np.uint8)
              + np.arange(w, dtype=np.uint8)[None, None, :])

    from dct3d_tpu.ops import relayout

    def make_step(kind):
        @functools.partial(jax.jit, static_argnames=("cfg", "slots"))
        def step(fr, enc_t, *, cfg, slots):
            plane, dc, lidx, vals, counts, ovf = turbo._plane_and_tables(
                _frames_to_q(fr, enc_t, cfg), slots
            )
            hc = cfg.cube_size // 2
            p2 = plane.reshape(-1, hc)
            if kind == "u8T":  # direct uint8 transpose (near-serial on TPU)
                wire = p2.T
            elif kind == "xla":  # i32 word transpose via XLA + byte peel
                wire = relayout.plane_to_wire(p2, use_pallas=False)
            else:  # Pallas block word transpose + byte peel
                wire = relayout.plane_to_wire(
                    p2, interpret="--cpu" in sys.argv
                )
            return wire, dc, lidx, vals, counts, ovf
        return step

    fd = jnp.asarray(frames)
    base = turbo.encode_step_turbo(fd, ctx.enc_t_pair, cfg=cfg, slots=16)
    hc = cfg.cube_size // 2
    want = np.ascontiguousarray(np.asarray(base[0]).reshape(-1, hc).T)
    steps = {k: make_step(k) for k in ("xla", "pallas")}
    for k, fn in steps.items():
        got = np.asarray(fn(fd, ctx.enc_t_pair, cfg=cfg, slots=16)[0])
        assert got.shape == want.shape and np.array_equal(got, want), (
            f"{k}: device wire plane != host transpose of transport plane"
        )
    print("byte-equality OK", want.shape, flush=True)

    # DEVICE-ONLY slope timing: the tunnel fetch is ~230 ms/GOP for this
    # plane (45 MB/s link), swamping the ~2 ms device step, so run K
    # iterations inside ONE jitted program with a carried data dependency
    # and fetch a single scalar (tools/profile_slope.py pattern).
    interp = "--cpu" in sys.argv

    def mk_loop(kind, k):
        @functools.partial(jax.jit, static_argnames=())
        def f(fr, enc_t):
            def body(_, carry):
                plane, dc, *_ = turbo._plane_and_tables(
                    _frames_to_q(fr ^ (carry & 1), enc_t, cfg), 16
                )
                hc = cfg.cube_size // 2
                p2 = plane.reshape(-1, hc)
                if kind == "base":
                    wire = p2
                elif kind == "xla":
                    wire = relayout.plane_to_wire(p2, use_pallas=False)
                else:
                    wire = relayout.plane_to_wire(p2, interpret=interp)
                return (wire[0].sum() + wire[-1, -1]).astype(jnp.uint8)

            return jax.lax.fori_loop(0, k, body, jnp.uint8(0))

        return f

    def run_once(fn, r=3):
        jax.device_get(fn(fd, ctx.enc_t_pair))
        best = 1e9
        for _ in range(r):
            t0 = time.perf_counter()
            jax.device_get(fn(fd, ctx.enc_t_pair))
            best = min(best, time.perf_counter() - t0)
        return best

    def slope(kind, k1=2, k2=10):
        t1 = run_once(mk_loop(kind, k1))
        t2 = run_once(mk_loop(kind, k2))
        return (t2 - t1) / (k2 - k1)

    t_base = slope("base")
    print(f"transport-major device step: {1000 * t_base:.2f} ms/GOP")
    for k in steps:
        t = slope(k)
        print(f"wire[{k:6s}]     device step: {1000 * t:.2f} ms/GOP "
              f"(delta {1000 * (t - t_base):+.2f}; host transpose it "
              f"replaces: ~16 ms / drain-pool width)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
