"""Mechanism-level invariants of GEM's self-self attention.

VERDICT round-1 flagged a single-oracle risk: models/gem/gem.py was only
validated against this repo's own torch restatement of the paper
(tests/torch_ref_gem.py), so a shared misreading would pass. These tests
pin mathematical properties that the paper's construction — an ensemble of
qq/kk/vv attentions softmax(tau * norm(t) norm(t)^T) applied to v through
the block's out-projection — must satisfy REGARDLESS of how it is
restated. A misreading that e.g. re-derived qkv from the gem stream,
applied attention to the wrong operand, or broke the L2 normalisation
would violate at least one of them.

(reference: Hybridgl_main.py:36-39 consumes gem-torch==1.0.1;
environment.yaml:206)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hybridgl_tpu.models.gem.gem import self_self_attention

pytestmark = pytest.mark.quick


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


@pytest.fixture()
def qkv(rng):
    N, H, L, hd = 2, 3, 9, 4
    return tuple(_rand(rng, N, H, L, hd) for _ in range(3))


def test_token_permutation_equivariance(qkv):
    """Self-self attention has no positional structure: permuting the
    tokens permutes the output identically."""
    q, k, v = qkv
    perm = np.array([3, 1, 4, 0, 8, 2, 7, 5, 6])
    out = self_self_attention(q, k, v, temp=2.0, iters=1)
    out_p = self_self_attention(q[:, :, perm], k[:, :, perm], v[:, :, perm], 2.0, 1)
    np.testing.assert_allclose(np.asarray(out[:, :, perm]), np.asarray(out_p), atol=1e-5)


def test_qk_stream_symmetry(qkv):
    """The ensemble averages the three streams symmetrically; the q and k
    streams differ only by which tensor seeds the similarity, so swapping
    q and k leaves the ensemble unchanged (all streams attend into v)."""
    q, k, v = qkv
    a = self_self_attention(q, k, v, temp=1.5, iters=2)
    b = self_self_attention(k, q, v, temp=1.5, iters=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_per_token_scale_invariance_of_similarity(qkv):
    """L2 normalisation makes the attention invariant to positive per-token
    rescaling of the similarity seed (q and k streams; the v stream also
    changes the attended values, so only scale q and k)."""
    q, k, v = qkv
    scales = jnp.asarray(np.random.default_rng(1).uniform(0.1, 10.0, q.shape[:3]))[..., None]
    a = self_self_attention(q, k, v, temp=3.0, iters=1)
    b = self_self_attention(q * scales, k * scales, v, temp=3.0, iters=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_identical_tokens_fixed_point(rng):
    """If every token is identical the attention is uniform and the output
    reproduces that token in every stream."""
    N, H, L, hd = 1, 2, 7, 4
    tok = _rand(rng, N, H, 1, hd)
    q = jnp.broadcast_to(tok, (N, H, L, hd))
    out = self_self_attention(q, q, q, temp=2.0, iters=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(q), atol=1e-5)


def test_high_temperature_collapses_to_identity(qkv):
    """Cosine self-similarity is maximal on the diagonal (=1), so as
    temp -> inf each stream's attention approaches the identity and the
    ensemble approaches v itself."""
    q, k, v = qkv
    out = self_self_attention(q, k, v, temp=1e4, iters=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-3)


def test_rows_are_convex_combinations(qkv):
    """Every output token lies in the convex hull of the v tokens: with
    v >= 0 the output must be >= 0 and bounded by max(v)."""
    q, k, _ = qkv
    v = jnp.abs(_rand(np.random.default_rng(7), *q.shape))
    out = np.asarray(self_self_attention(q, k, v, temp=2.0, iters=1))
    assert out.min() >= -1e-6
    assert out.max() <= float(jnp.max(v)) + 1e-5
