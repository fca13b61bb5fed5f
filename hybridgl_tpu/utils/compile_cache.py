"""Persistent XLA compilation cache.

The reference pays its model-build cost once per process via torch's eager
CUDA kernels; our jitted stages instead pay an XLA compile on first call
(~90s for the ViT-H proposal stage). Serving and benchmarking restart
processes often, so we persist compiled executables to disk — the standard
Cloud-TPU deployment pattern — and warm restarts skip compilation entirely.

Opt out with HYBRIDGL_COMPILE_CACHE=0; point elsewhere by setting it to a
directory path.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Enable jax's on-disk compilation cache; returns the directory used
    (None when disabled via HYBRIDGL_COMPILE_CACHE=0)."""
    env = os.environ.get("HYBRIDGL_COMPILE_CACHE")
    if env == "0":
        return None
    path = path or (env if env else os.path.abspath(_DEFAULT))
    os.makedirs(path, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # cache EVERYTHING: on the tunneled TPU backend even a scalar multiply
    # costs ~0.5 s to compile (remote compile service round-trip), so the
    # default thresholds would skip exactly the ops that dominate cold
    # start (hundreds of tiny param-init/cast ops)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
