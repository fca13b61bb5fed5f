"""GEM — training-free dense relevance via self-self attention.

The reference consumes the external pip package ``gem-torch==1.0.1``
(reference: Hybridgl_main.py:36-39, environment.yaml:206) whose source is
not in-tree. This module re-implements the mechanism from the GEM paper
(Bousselham et al., "Grounding Everything: Emerging Localization
Properties in Vision-Language Transformers", CVPR 2024) on top of our CLIP
ViT params:

  * the last ``depth`` blocks run a parallel "gem" stream whose attention
    is a qq/kk/vv **self-self attention ensemble**: for t in {q, k, v},
    attn_t = softmax(tau * norm(t) @ norm(t)^T) (iterated ``ss_attn_iters``
    times), applied to v; the ensemble mean goes through the block's output
    projection into the gem stream (residual, no MLP);
  * the normal stream runs the standard block and feeds each gem block's
    qkv;
  * patch-level relevance = cosine(normalized gem patch features,
    normalized text features), reshaped to the patch grid.

Inputs are 448^2 (``GemConfig.img_size``) with the 224-pretrained
positional embedding bilinearly interpolated to the larger grid.

NOTE: validated numerically against an independent torch restatement of
the paper (tests/torch_ref_gem.py, 2e-4 agreement) AND against
restatement-independent mechanism invariants (tests/test_gem_invariants.py:
permutation equivariance, q/k stream symmetry, per-token scale invariance,
identity/temperature limits, convex-hull bounds); exact parity with the
gem-torch pip package itself still requires an environment that has it
(docs/ACCURACY_VALIDATION.md section 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.config import ClipConfig, GemConfig
from ...kernels.resize import resize_bilinear
from ..clip.layers import layer_norm, linear, quick_gelu


def interpolate_pos_embedding(pos: jax.Array, new_grid: int) -> jax.Array:
    """[1+g*g, D] -> [1+G*G, D] bilinear over the spatial grid."""
    cls, patches = pos[:1], pos[1:]
    g = int(round(patches.shape[0] ** 0.5))
    grid = patches.reshape(g, g, -1)
    up = resize_bilinear(grid, (new_grid, new_grid))
    return jnp.concatenate([cls, up.reshape(new_grid * new_grid, -1)], axis=0)


def _qkv(p_attn, x, num_heads):
    N, L, D = x.shape
    hd = D // num_heads
    qkv = x @ p_attn["in_proj_w"].astype(x.dtype) + p_attn["in_proj_b"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(N, L, num_heads, hd).transpose(0, 2, 1, 3)

    return heads(q), heads(k), heads(v)


def _merge_heads(t):
    N, H, L, hd = t.shape
    return t.transpose(0, 2, 1, 3).reshape(N, L, H * hd)


def _l2norm(t, eps=1e-6):
    return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), eps)


def self_self_attention(q, k, v, temp: float, iters: int):
    """qq/kk/vv ensemble; returns [N, H, L, hd]."""
    from ...core.dtypes import score_dtype, softmax_scores

    sdt = score_dtype(q.dtype)
    outs = []
    for t in (q, k, v):
        tn = _l2norm(t)
        attn = None
        for _ in range(max(iters, 1)):
            attn = softmax_scores(
                (
                    temp
                    * jnp.einsum(
                        "nhqd,nhkd->nhqk", tn, tn, preferred_element_type=jnp.float32
                    )
                ).astype(sdt)
            ).astype(t.dtype)
            tn = _l2norm(jnp.einsum("nhqk,nhkd->nhqd", attn, tn))
        outs.append(jnp.einsum("nhqk,nhkd->nhqd", attn, v))
    return (outs[0] + outs[1] + outs[2]) / 3.0


def _std_attention(q, k, v, scale):
    from ...core.dtypes import score_dtype, softmax_scores

    attn = softmax_scores(
        (
            scale * jnp.einsum("nhqd,nhkd->nhqk", q, k, preferred_element_type=jnp.float32)
        ).astype(score_dtype(q.dtype))
    ).astype(v.dtype)
    return jnp.einsum("nhqk,nhkd->nhqd", attn, v)


def gem_image_features(
    p_visual,
    images: jax.Array,  # [N, S, S, 3] normalized, S = gem img_size
    clip_cfg: ClipConfig,
    gem_cfg: GemConfig,
):
    """Returns (gem_patch_feats [N, G*G, embed], cls_feats [N, embed], G)."""
    S = images.shape[1]
    G = S // clip_cfg.patch_size
    H = clip_cfg.vision_heads
    hd = clip_cfg.vision_width // H
    temp = gem_cfg.ss_attn_temp if gem_cfg.ss_attn_temp is not None else hd**-0.5
    scale = hd**-0.5

    # param dtype drives the compute dtype (see vit.vit_stem)
    dt = jnp.asarray(p_visual["conv1"]).dtype
    images = images.astype(dt)
    x = jax.lax.conv_general_dilated(
        images,
        p_visual["conv1"].astype(dt),
        window_strides=(clip_cfg.patch_size, clip_cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    N = x.shape[0]
    x = x.reshape(N, G * G, clip_cfg.vision_width)
    cls = jnp.broadcast_to(
        p_visual["class_embedding"].astype(dt), (N, 1, clip_cfg.vision_width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    pos = interpolate_pos_embedding(p_visual["positional_embedding"].astype(dt), G)
    x = x + pos
    x = layer_norm(p_visual["ln_pre"], x)

    n_blocks = clip_cfg.vision_layers
    gem_start = n_blocks - gem_cfg.depth

    def block_step(x, x_gem, blk, with_gem: bool):
        y = layer_norm(blk["ln_1"], x)
        q, k, v = _qkv(blk["attn"], y, H)
        if with_gem:
            ss = self_self_attention(q, k, v, temp, gem_cfg.ss_attn_iters)
            ss = _merge_heads(ss)
            ss = ss @ blk["attn"]["out_w"].astype(dt) + blk["attn"]["out_b"].astype(dt)
            x_gem = x_gem + ss  # gem stream: attention only, no MLP
        # normal stream
        o = _merge_heads(_std_attention(q * scale, k, v, 1.0))
        o = o @ blk["attn"]["out_w"].astype(dt) + blk["attn"]["out_b"].astype(dt)
        x = x + o
        h = layer_norm(blk["ln_2"], x)
        h = linear(blk["mlp_fc"], h)
        h = quick_gelu(h)
        return x + linear(blk["mlp_proj"], h), x_gem

    stacked = p_visual.get("blocks_stacked")
    if stacked is not None:
        # scan-ready path (see clip/layers.py:stack_block_params): plain
        # run to gem_start, then a (x, x_gem) carry over the gem range
        def plain(h, bp):
            return block_step(h, None, bp, False)[0], None

        def gem_body(carry, bp):
            return block_step(carry[0], carry[1], bp, True), None

        pre = jax.tree.map(lambda a: a[:gem_start], stacked)
        post = jax.tree.map(lambda a: a[gem_start:], stacked)
        x = jax.lax.scan(plain, x, pre)[0]
        (x, x_gem), _ = jax.lax.scan(gem_body, (x, x), post)
    else:
        x_gem = None
        for i in range(n_blocks):
            if i >= gem_start and x_gem is None:
                x_gem = x
            x, x_gem = block_step(
                x, x_gem, p_visual["blocks"][i], i >= gem_start
            )

    gem_feats = layer_norm(p_visual["ln_post"], x_gem) @ p_visual["proj"].astype(dt)
    cls_feats = layer_norm(p_visual["ln_post"], x[:, :1])[:, 0] @ p_visual["proj"].astype(dt)
    # f32 features at the boundary (cosine relevance stays full-precision)
    return gem_feats[:, 1:].astype(jnp.float32), cls_feats.astype(jnp.float32), G


def gem_heatmap(
    p_clip,
    image: jax.Array,  # [S, S, 3] normalized single image
    text_features: jax.Array,  # [T, embed]
    clip_cfg: ClipConfig,
    gem_cfg: GemConfig,
) -> jax.Array:
    """Per-phrase relevance heatmaps [T, S, S] (bilinearly upsampled from
    the patch grid, matching gem-torch's output frame)."""
    patch_feats, _, G = gem_image_features(
        p_clip["visual"], image[None], clip_cfg, gem_cfg
    )
    pf = _l2norm(patch_feats[0])  # [G*G, E]
    tf = _l2norm(text_features)  # [T, E]
    rel = (pf @ tf.T).T.reshape(-1, G, G)  # [T, G, G]
    S = image.shape[0]
    up = jax.vmap(lambda m: resize_bilinear(m, (S, S)))(rel)
    return up


GEM_NORM_MEAN = (0.48145466, 0.4578275, 0.40821073)
GEM_NORM_STD = (0.26862954, 0.26130258, 0.27577711)


def gem_preprocess(image_u8: jax.Array, size: int) -> jax.Array:
    """uint8 [H, W, 3] -> normalized [size, size, 3] (squash resize +
    OpenAI-CLIP normalization, matching gem.get_gem_img_transform)."""
    x = image_u8.astype(jnp.float32)
    if x.shape[:2] != (size, size):
        x = resize_bilinear(x, (size, size))
    x = x / 255.0
    mean = jnp.asarray(GEM_NORM_MEAN, jnp.float32)
    std = jnp.asarray(GEM_NORM_STD, jnp.float32)
    return (x - mean) / std
