"""Small runtime utilities."""

from __future__ import annotations

import os

_CACHE_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache.

    XLA-TPU compiles of the fused encode program take ~15-30 s per geometry
    (minutes through a remote-compile relay); the persistent cache makes
    every geometry a one-time cost across processes.  Idempotent.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    path = path or os.environ.get(
        "DCT3D_TPU_CACHE", os.path.expanduser("~/.cache/dct3d_tpu/jax")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _CACHE_ENABLED = True
