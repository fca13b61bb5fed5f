"""Hybrid global/local fusion scoring forward (the HybridGL core idea).

Re-implements the five fusion modes of the reference's ``CLIPViTFM``
(reference: model/backbone.py:117-309) as one jit-compiled function with a
static mode enum:

  crop          plain ViT on the local crops (backbone.py:126-128)
  token_masking patch tokens multiplied by the (fractionally resized)
                proposal mask from ``masking_block`` on (backbone.py:161-185)
  attn_masking  CLS row restricted to in-mask patches via a per-proposal
                attention mask (backbone.py:187-204); NOTE the reference
                returns after block ``last_layer`` — one block earlier than
                every other mode — reproduced behind CompatConfig
  L2G           local stream injected into the attention-masked global
                stream (backbone.py:206-225)
  G2L           token-masked global injected into the local stream
                (backbone.py:227-260)
  G2L&L2G       both directions, four parallel streams, summed heads
                (backbone.py:262-306)

TPU-first structure: the shared blocks [0, masking_block) run on the
concatenated 2P batch in a single pass (one big MXU batch per block); the
specialised tail blocks run per-stream. All shapes are static in the
proposal bucket P; invalid (padded) proposals are masked downstream at
scoring time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.config import ClipConfig, CompatConfig
from ...kernels.resize import resize_bilinear
from .layers import allowed_mask_to_bias
from .vit import vit_block, vit_head, vit_stem


def last_layer_index(cfg: ClipConfig) -> int:
    """The reference's ``last_layer`` (10 for the 12-block ViT-B,
    backbone.py:17-21); generalised as depth-2 so smaller test models work."""
    return cfg.vision_layers - 2


def resize_masks_to_grid(pred_masks: jax.Array, grid: int, masks_hw=None) -> jax.Array:
    """[P, H, W] bool/float -> [P, grid, grid] float via bilinear (matches
    torchvision TF.resize on float masks, backbone.py:160).

    ``masks_hw``: optional valid (h, w) extent when the masks live in a
    zero-padded canonical frame — only that region is resized.
    """
    m = pred_masks.astype(jnp.float32)
    return jax.vmap(lambda x: resize_bilinear(x, (grid, grid), src_hw=masks_hw))(m)


def make_cls_bias(masks_grid: jax.Array) -> jax.Array:
    """Compact CLS-row bias [P, L]: the reference's ``make_attn_mask``
    (backbone.py:108-115) only restricts the CLS query row — CLS may attend
    to itself and to patches whose (fractionally resized) mask value is
    nonzero. This is the form the fused attention kernel
    (kernels/clip_attention.py) consumes natively; the unfused path expands
    it with ``cls_bias_to_attn_bias``."""
    P = masks_grid.shape[0]
    patch_ok = masks_grid.reshape(P, -1) != 0
    allowed = jnp.concatenate([jnp.ones((P, 1), bool), patch_ok], axis=1)
    return allowed_mask_to_bias(allowed)  # [P, L]


def make_attn_bias(masks_grid: jax.Array) -> jax.Array:
    """Per-proposal CLS-row attention bias.

    ``make_attn_mask`` semantics (backbone.py:108-115): CLS may attend to
    itself and to patches whose (fractionally resized) mask value is
    nonzero; patch rows are unrestricted. Returns additive bias
    [P, 1, L, L] (broadcast over heads).
    """
    P = masks_grid.shape[0]
    L = masks_grid.shape[1] * masks_grid.shape[2] + 1
    allowed = jnp.ones((P, L, L), bool)
    patch_ok = (masks_grid.reshape(P, -1) != 0)
    allowed = allowed.at[:, 0, 1:].set(patch_ok)
    return allowed_mask_to_bias(allowed)[:, None, :, :]


def token_mask(x: jax.Array, masks_grid: jax.Array) -> jax.Array:
    """Multiply patch tokens by the (fractional) proposal mask, keep CLS.

    x: [P, L, D]; masks_grid: [P, g, g]. (backbone.py:164-175 / :236-247.)
    """
    P, L, D = x.shape
    cls, patches = x[:, :1, :], x[:, 1:, :]
    m = masks_grid.reshape(P, -1, 1).astype(x.dtype)
    return jnp.concatenate([cls, patches * m], axis=1)


def hybrid_forward(
    p_visual,
    local_imgs: jax.Array,
    global_imgs: jax.Array,
    pred_masks: jax.Array,
    cfg: ClipConfig,
    fusion_mode: str = "G2L",
    masking_block: int = 9,
    compat: CompatConfig = CompatConfig(),
    masks_hw=None,
) -> jax.Array:
    """Compute hybrid CLS features for P proposals.

    Args:
      local_imgs / global_imgs: [P, S, S, 3] NHWC, CLIP-preprocessed.
      pred_masks: [P, H, W] proposal masks (bool or float), any resolution.
      masks_hw: optional valid (h, w) extent of ``pred_masks`` when they
        live in a zero-padded canonical frame.
    Returns: [P, embed_dim] features (mode 'G2L&L2G' returns the summed
      hybrid features, matching the reference).
    """
    mb = masking_block
    last = last_layer_index(cfg)
    n_blocks = cfg.vision_layers

    heads = cfg.vision_heads
    stacked = p_visual.get("blocks_stacked")

    def run_plain(x, start, stop, cls=None):
        """Blocks [start, stop): scanned when stacked params are present.
        ``cls`` is the compact CLS-row bias (see make_cls_bias)."""
        if stacked is not None:
            from .layers import scan_blocks

            return scan_blocks(stacked, x, heads, start=start, stop=stop, cls_bias=cls)
        for i in range(start, stop):
            x = vit_block(p_visual["blocks"][i], x, cfg, cls_bias=cls)
        return x

    def run_scan(carry, body, start, stop):
        """Scan a multi-stream tail body over stacked blocks [start, stop);
        falls back to the unrolled loop on list-format params."""
        if stacked is not None:
            import jax as _jax

            sl = _jax.tree.map(lambda a: a[start:stop], stacked)
            return _jax.lax.scan(lambda c, bp: (body(c, bp), None), carry, sl)[0]
        for i in range(start, stop):
            carry = body(carry, p_visual["blocks"][i])
        return carry

    def blk_fwd(bp, x, cls=None):
        from .layers import residual_attention_block

        return residual_attention_block(bp, x, heads, cls_bias=cls)

    if fusion_mode == "crop":
        x = vit_stem(p_visual, local_imgs, cfg)
        x = run_plain(x, 0, n_blocks)
        return vit_head(p_visual, x, cfg)

    masks_grid = resize_masks_to_grid(pred_masks, cfg.grid, masks_hw)

    x = vit_stem(p_visual, local_imgs, cfg)

    if fusion_mode == "token_masking":
        x = run_plain(x, 0, mb)
        stop = last + 2  # blocks mb..11 inclusive; head taken at block 11
        x = run_scan(
            x, lambda h, bp: blk_fwd(bp, token_mask(h, masks_grid)), mb, stop
        )
        return vit_head(p_visual, x, cfg)

    if fusion_mode == "attn_masking":
        bias = make_cls_bias(masks_grid)
        x = run_plain(x, 0, mb)
        stop = (last + 1) if compat.attn_masking_early_exit else (last + 2)
        x = run_plain(x, mb, stop, cls=bias)
        return vit_head(p_visual, x, cfg)

    # two-stream modes
    x2 = vit_stem(p_visual, global_imgs, cfg)
    bias = make_cls_bias(masks_grid)

    # shared trunk on the fused 2P batch (one resblock call per block)
    P = x.shape[0]
    xx = jnp.concatenate([x, x2], axis=0)
    xx = run_plain(xx, 0, mb)
    x, x2 = xx[:P], xx[P:]

    if fusion_mode == "L2G":

        def l2g(carry, bp):
            x, x2 = carry
            return blk_fwd(bp, x), blk_fwd(bp, x + 2.0 * x2, bias)

        x, x2 = run_scan((x, x2), l2g, mb, last + 2)
        return vit_head(p_visual, x2, cfg)

    if fusion_mode == "G2L":

        def g2l(carry, bp):
            x, x2 = carry
            x_ori_global = token_mask(x2, masks_grid)
            return blk_fwd(bp, 2.0 * x_ori_global + x), blk_fwd(bp, x2, bias)

        x, x2 = run_scan((x, x2), g2l, mb, last + 2)
        return vit_head(p_visual, x, cfg)

    if fusion_mode == "G2L&L2G":

        def both(carry, bp):
            x, x2, xh_local, xh_global = carry
            x_ori_local = x
            x_ori_global = token_mask(x2, masks_grid)
            return (
                blk_fwd(bp, x),
                blk_fwd(bp, x2, bias),
                blk_fwd(bp, xh_local + 2.0 * x_ori_global),
                blk_fwd(bp, x_ori_local + 2.0 * xh_global, bias),
            )

        _, _, xh_local, xh_global = run_scan((x, x2, x, x2), both, mb, last + 2)
        return vit_head(p_visual, xh_local, cfg) + vit_head(p_visual, xh_global, cfg)

    raise ValueError(f"unknown fusion mode {fusion_mode!r}")


def calculate_score(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
) -> jax.Array:
    """Cosine-similarity logits ([P, T]) scaled by exp(logit_scale)
    (reference: model/backbone.py:74-87)."""
    img = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
    txt = text_features / jnp.linalg.norm(text_features, axis=-1, keepdims=True)
    return jnp.exp(logit_scale) * img @ txt.T
