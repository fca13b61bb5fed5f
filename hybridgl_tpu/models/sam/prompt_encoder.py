"""SAM prompt encoder in functional JAX.

Semantics match the reference
(reference: third_party/segment-anything/segment_anything/modeling/prompt_encoder.py):
random-Fourier positional encoding over normalized coordinates, learned
point/box-corner embeddings, and the dense no-mask embedding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.config import SamConfig


def _pe_encode(p, coords01: jax.Array) -> jax.Array:
    """coords in [0,1]^2, shape [..., 2] -> [..., prompt_dim]
    (reference: prompt_encoder.py:185-192)."""
    coords = 2.0 * coords01 - 1.0
    coords = coords @ p["pe_gaussian"].astype(coords.dtype)
    coords = 2.0 * np.pi * coords
    return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)


def dense_pe(p, cfg: SamConfig) -> jax.Array:
    """Positional encoding grid [embed_grid, embed_grid, prompt_dim]
    (reference: prompt_encoder.py:194-205)."""
    g = cfg.embed_grid
    y = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    x = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    grid = jnp.stack(
        [jnp.broadcast_to(x[None, :], (g, g)), jnp.broadcast_to(y[:, None], (g, g))],
        axis=-1,
    )
    return _pe_encode(p, grid)


def embed_points(
    p,
    coords: jax.Array,
    labels: jax.Array,
    cfg: SamConfig,
    pad: bool = True,
) -> jax.Array:
    """coords: [B, N, 2] in input-image pixels, labels: [B, N] in {-1,0,1}.

    With ``pad`` a (0,0)/-1 padding point is appended (the reference does
    this whenever no box prompt accompanies the points,
    prompt_encoder.py:80-91). Returns sparse embeddings [B, N(+1), prompt_dim].
    """
    if pad:
        B = coords.shape[0]
        coords = jnp.concatenate([coords, jnp.zeros((B, 1, 2), coords.dtype)], axis=1)
        labels = jnp.concatenate([labels, -jnp.ones((B, 1), labels.dtype)], axis=1)
    coords = (coords + 0.5) / jnp.asarray(
        [cfg.img_size, cfg.img_size], coords.dtype
    )  # shift to pixel center, normalize by (W, H)
    emb = _pe_encode(p, coords)
    lab = labels[..., None]
    emb = jnp.where(lab == -1, p["not_a_point_embed"].astype(emb.dtype), emb)
    emb = emb + jnp.where(lab == 0, p["point_embeddings"][0].astype(emb.dtype), 0.0)
    emb = emb + jnp.where(lab == 1, p["point_embeddings"][1].astype(emb.dtype), 0.0)
    return emb


def embed_boxes(p, boxes: jax.Array, cfg: SamConfig) -> jax.Array:
    """boxes: [B, 4] XYXY -> [B, 2, prompt_dim] corner embeddings
    (reference: prompt_encoder.py:93-100)."""
    corners = (boxes.reshape(-1, 2, 2) + 0.5) / jnp.asarray(
        [cfg.img_size, cfg.img_size], boxes.dtype
    )
    emb = _pe_encode(p, corners)
    emb = emb.at[:, 0, :].add(p["point_embeddings"][2].astype(emb.dtype))
    emb = emb.at[:, 1, :].add(p["point_embeddings"][3].astype(emb.dtype))
    return emb


def no_mask_dense(p, cfg: SamConfig, batch: int) -> jax.Array:
    """Dense embedding when no mask prompt is given: broadcast no_mask_embed
    over the embedding grid, NHWC (reference: prompt_encoder.py:164-166)."""
    g = cfg.embed_grid
    return jnp.broadcast_to(
        p["no_mask_embed"].reshape(1, 1, 1, -1), (batch, g, g, cfg.prompt_dim)
    )
