"""Unit tests: score-softmax helpers and the persistent compile cache."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hybridgl_tpu.core.dtypes import softmax_scores, softmax_scores2


def test_softmax_scores2_equals_flat_softmax(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 5, 4, 5)), jnp.float32)
    got = np.asarray(softmax_scores2(x))
    flat = jax.nn.softmax(x.reshape(2, 3, 4, 5, 20), axis=-1)
    np.testing.assert_allclose(got, np.asarray(flat).reshape(x.shape), atol=1e-6)


def test_softmax_scores2_bf16_close(rng):
    x32 = jnp.asarray(rng.standard_normal((2, 2, 3, 3, 3, 3)) * 4, jnp.float32)
    got = np.asarray(softmax_scores2(x32.astype(jnp.bfloat16)).astype(jnp.float32))
    want = np.asarray(softmax_scores2(x32))
    np.testing.assert_allclose(got, want, atol=2e-2)
    np.testing.assert_allclose(got.reshape(2, 2, 3, 3, -1).sum(-1), 1.0, atol=2e-2)


def test_softmax_scores_matches_jax(rng):
    x = jnp.asarray(rng.standard_normal((3, 7)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(softmax_scores(x)), np.asarray(jax.nn.softmax(x, -1)), atol=1e-6
    )


def test_persistent_cache_configures(tmp_path, monkeypatch):
    from hybridgl_tpu.utils import compile_cache

    old = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("HYBRIDGL_COMPILE_CACHE", str(tmp_path / "cc"))
    try:
        path = compile_cache.enable_persistent_cache()
        assert path == str(tmp_path / "cc")
        import os

        assert os.path.isdir(path)
        assert jax.config.jax_compilation_cache_dir == path
    finally:
        # tmp_path dies with the test; don't leave the suite caching there
        jax.config.update("jax_compilation_cache_dir", old)


def test_persistent_cache_disable(monkeypatch):
    from hybridgl_tpu.utils import compile_cache

    monkeypatch.setenv("HYBRIDGL_COMPILE_CACHE", "0")
    assert compile_cache.enable_persistent_cache() is None
