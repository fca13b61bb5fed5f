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

from .env import env_is_falsy


def _default_dir() -> str:
    """Prefer a repo-local .jax_cache when the package lives in a writable
    checkout (keeps the cache next to the code it compiled); otherwise the
    user cache directory — an installed package's site-packages parent may
    be read-only, and the CLI enables the cache unconditionally."""
    repo_local = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    )
    parent = os.path.dirname(repo_local)
    # only a CHECKOUT gets the repo-local cache: an installed package's
    # parent is site-packages (writable in any venv — don't litter it)
    is_checkout = any(
        os.path.exists(os.path.join(parent, m)) for m in (".git", "pyproject.toml")
    )
    if is_checkout and os.access(parent, os.W_OK):
        return repo_local
    xdg = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    return os.path.join(xdg, "hybridgl_tpu", "jax")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Enable jax's on-disk compilation cache; returns the directory used
    (None when disabled via HYBRIDGL_COMPILE_CACHE=0 or not creatable)."""
    env = os.environ.get("HYBRIDGL_COMPILE_CACHE")
    if env is not None and env_is_falsy(env):
        return None  # "0"/"false"/"off"/"no" disable; other strings are paths
    path = path or (env if env else _default_dir())
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None  # unwritable location: run without the cache

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # cache EVERYTHING: on the tunneled TPU backend even a scalar multiply
    # costs ~0.5 s to compile (remote compile service round-trip), so the
    # default thresholds would skip exactly the ops that dominate cold
    # start (hundreds of tiny param-init/cast ops)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
