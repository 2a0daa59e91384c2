"""Does lax.scan over GOPs inside ONE program beat back-to-back dispatches?

VERDICT r1 item 7: the multi-GOP repack transpose compiles pathologically
(374 s at T=32), so the driver dispatches per GOP.  A lax.scan keeps the
per-GOP shapes INSIDE the loop body (single-GOP compile profile) while one
dispatch covers N GOPs — this measures compile time and steady-state
throughput for both.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dct3d_tpu.codec.transform import TransformContext, _encode_core, encode_step
from dct3d_tpu.config import CodecConfig
from dct3d_tpu.utils import enable_compilation_cache


def main():
    enable_compilation_cache()
    cfg = CodecConfig(pack_bits_per_value=4)
    ctx = TransformContext(cfg)
    rng = np.random.default_rng(1)
    T, H, W = 8, 1080, 1920
    N = 4  # GOPs per scan
    frames = np.empty((N, T, H, W), np.uint8)
    x = np.arange(W, dtype=np.uint32)
    y = np.arange(H, dtype=np.uint32)[:, None]
    for g in range(N):
        for k in range(T):
            frames[g, k] = ((x[None, :] + y + (g * T + k)) & 0xFF).astype(np.uint8)
    frames ^= rng.integers(0, 16, size=frames.shape, dtype=np.uint8)
    fj = jnp.asarray(frames)
    mb = ctx.max_packed_bytes(T * H * W)

    def scan_fn(fr):
        def body(carry, gop_frames):
            code, bits = carry
            g = _encode_core(gop_frames, ctx.enc_t, code, bits, mb, cfg)
            return (g.carry_code, g.carry_bits), (
                g.packed, g.total_bits, g.overflow
            )

        (code, bits), (packed, total, ovf) = jax.lax.scan(
            body, (jnp.uint32(0), jnp.int32(0)), fr
        )
        return packed, total, code, bits, ovf

    jitted = jax.jit(scan_fn)
    t0 = time.perf_counter()
    out = jitted(fj)
    jax.device_get(out[1])
    compile_s = time.perf_counter() - t0
    print(f"scan N={N}: first call (compile+load) {compile_s:.1f} s")

    def run_scan():
        t0 = time.perf_counter()
        out = jitted(fj)
        jax.device_get(out[1][-1])
        return time.perf_counter() - t0

    best = min(run_scan() for _ in range(4))
    print(f"scan N={N}: {best/N*1e3:8.2f} ms/GOP = {N*T/best:7.1f} fps")

    # per-GOP dispatch chain, same data
    def chain():
        carry = (jnp.uint32(0), jnp.int32(0))
        g = None
        t0 = time.perf_counter()
        for i in range(N):
            g = encode_step(fj[i], ctx.enc_t, carry[0], carry[1],
                            max_bytes=mb, cfg=cfg)
            carry = (g.carry_code, g.carry_bits)
        int(g.total_bits)
        return time.perf_counter() - t0

    chain()
    best = min(chain() for _ in range(4))
    print(f"chain N={N}: {best/N*1e3:8.2f} ms/GOP = {N*T/best:7.1f} fps "
          "(includes 1 relay sync)")


if __name__ == "__main__":
    main()
