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

    @functools.partial(jax.jit, static_argnames=("cfg", "slots"))
    def step_pairmajor(fr, enc_t, *, cfg, slots):
        plane, dc, lidx, vals, counts, ovf = turbo._plane_and_tables(
            _frames_to_q(fr, enc_t, cfg), slots
        )
        hc = cfg.cube_size // 2
        wire = plane.reshape(-1, hc).T  # device transpose -> wire layout
        return wire, dc, lidx, vals, counts, ovf

    fd = jnp.asarray(frames)
    base = turbo.encode_step_turbo(fd, ctx.enc_t_pair, cfg=cfg, slots=16)
    pm = step_pairmajor(fd, ctx.enc_t_pair, cfg=cfg, slots=16)
    hc = cfg.cube_size // 2
    want = np.ascontiguousarray(np.asarray(base[0]).reshape(-1, hc).T)
    got = np.asarray(pm[0])
    assert got.shape == want.shape and np.array_equal(got, want), (
        "pair-major device plane != host transpose of the transport plane"
    )
    print("byte-equality OK", got.shape, flush=True)

    # Slope timing: K chained dispatches per program, min of R runs.
    def slope(fn, k=8, r=3):
        best = 1e9
        for _ in range(r):
            t0 = time.perf_counter()
            outs = [fn(fd, ctx.enc_t_pair, cfg=cfg, slots=16) for _ in range(k)]
            for o in outs:
                np.asarray(o[0]).ravel()[:1]  # force D2H of the plane
            best = min(best, (time.perf_counter() - t0) / k)
        return best

    t_base = slope(turbo.encode_step_turbo)
    t_pm = slope(step_pairmajor)
    print(f"transport-major step+fetch: {1000 * t_base:.2f} ms/GOP")
    print(f"pair-major      step+fetch: {1000 * t_pm:.2f} ms/GOP")
    print(f"delta: {1000 * (t_pm - t_base):+.2f} ms/GOP "
          f"(host transpose it replaces: ~16 ms / drain-pool width)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
