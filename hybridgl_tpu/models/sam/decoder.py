"""SAM two-way transformer + mask decoder in functional JAX.

Semantics match the reference
(reference: third_party/segment-anything/segment_anything/modeling/transformer.py
and modeling/mask_decoder.py): IoU token + 4 mask tokens, two
{token self-attn, token->image cross-attn, MLP, image->token cross-attn}
layers with attention-channel downsample rate 2, a final token->image
attention, 4x deconv upscaling and per-token hypernetwork MLPs.

TPU note: the decoder runs over the full point batch at once
([B=points_per_batch] prompts x [4096] image tokens) as one jitted call —
no per-prompt host loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...core.config import SamConfig
from .image_encoder import layer_norm_2d

LN_EPS = 1e-5  # decoder transformer norms are default torch LayerNorm


def use_fused_upscale() -> bool:
    """Fused Pallas upscale+hypernetwork tail (kernels/upscale_hyper.py).
    Default ON; opt OUT via $HYBRIDGL_FUSED_UPSCALE=0. Runs in interpret
    mode on CPU (slow but exact), so tiny-model tests exercise it too."""
    from ...utils.env import env_flag

    return env_flag("HYBRIDGL_FUSED_UPSCALE", default=True)


def _ln(p, x, eps=LN_EPS):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(dt)


def _lin(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _attn(p, q, k, v, num_heads: int):
    """Projected multi-head attention (reference transformer.py:185-240).

    Heads stay in the [B, L, heads, hd] view end-to-end — no explicit
    [B, heads, L, hd] transposes (on TPU those materialise as layout
    copies of every projected tensor; the einsum batch dims express the
    same contraction without them)."""
    q, k, v = _lin(p["q"], q), _lin(p["k"], k), _lin(p["v"], v)
    B, Lq, D = q.shape
    Lk = k.shape[1]
    hd = D // num_heads
    qh = q.reshape(B, Lq, num_heads, hd)
    kh = k.reshape(B, Lk, num_heads, hd)
    vh = v.reshape(B, Lk, num_heads, hd)
    attn = jnp.einsum(
        "bqnd,bknd->bnqk", qh, kh, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    out = jnp.einsum("bnqk,bknd->bqnd", attn, vh).reshape(B, Lq, D)
    return _lin(p["out"], out)


def _mlp_relu(p_fc, p_proj, x):
    return _lin(p_proj, jax.nn.relu(_lin(p_fc, x)))


def _attn_shared_kv(p, q, k_shared, v_shared, num_heads: int):
    """Multi-head attention where the key/value side is identical across the
    batch: q is [B, Lq, C], k_shared/v_shared are [Lk, C]. Exactly the same
    contraction as _attn with k/v broadcast to B, but the projections run
    once and no [B, Lk, D] tensor is materialised. Used for the decoder's
    layer-0 token->image attention in the AMG point loop, where the image
    side is per-crop constant (reference recomputes it per prompt batch,
    transformer.py:75-87)."""
    q = _lin(p["q"], q)
    k = _lin(p["k"], k_shared.astype(q.dtype))
    v = _lin(p["v"], v_shared.astype(q.dtype))
    B, Lq, D = q.shape
    Lk = k.shape[0]
    hd = D // num_heads
    qh = q.reshape(B, Lq, num_heads, hd)
    kh = k.reshape(Lk, num_heads, hd)
    vh = v.reshape(Lk, num_heads, hd)
    attn = jnp.einsum(
        "bqnd,knd->bnqk", qh, kh, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    out = jnp.einsum("bnqk,knd->bqnd", attn, vh).reshape(B, Lq, D)
    return _lin(p["out"], out)


def _attn_shared_q(p, q_shared, k, v, num_heads: int):
    """Multi-head attention where the query side is identical across the
    batch: q_shared is [Lq, C], k/v are [B, Lk, C]. The query projection
    runs once, and the value/output projections are folded onto the tiny
    token side (vo[t] = v_h[t] W_out[h]; sum over the Lk ~7 tokens happens
    directly in the output width) so no [B, Lq, D] intermediate is ever
    materialised. Used for the decoder's layer-0 image->token attention
    (image tokens query the per-point prompt tokens)."""
    k = _lin(p["k"], k)
    v = _lin(p["v"], v)
    q = _lin(p["q"], q_shared.astype(k.dtype))
    B, Lk, D = k.shape
    Lq = q.shape[0]
    hd = D // num_heads
    qh = q.reshape(Lq, num_heads, hd)
    kh = k.reshape(B, Lk, num_heads, hd)
    vh = v.reshape(B, Lk, num_heads, hd)
    # score layout [B, n, Lk, Lq]: the softmax axis is the ~7-token Lk —
    # keeping the 4096-token Lq MINOR means the f32 scores tile as
    # (Lk, 128) with every lane live; the transposed [.., Lq, Lk] form pads
    # Lk 7 -> 128 lanes (16x the HBM traffic on a [B, n, 4096, .] tensor)
    attn = jnp.einsum(
        "qnd,bknd->bnkq", qh, kh, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    attn = jax.nn.softmax(attn, axis=2).astype(k.dtype)
    wo = p["out"]["w"].reshape(num_heads, hd, -1)
    vo = jnp.einsum(
        "bknd,nde->bkne", vh.astype(jnp.float32), wo.astype(jnp.float32)
    ).astype(k.dtype)
    out = jnp.einsum("bnkq,bkne->bqe", attn, vo)
    return out + p["out"]["b"].astype(k.dtype)


def _heads_w(p_lin, num_heads):
    """Projection weight/bias in the per-head view: [C, heads, hd], [heads, hd]."""
    w = p_lin["w"]
    C, D = w.shape
    hd = D // num_heads
    return w.reshape(C, num_heads, hd), p_lin["b"].reshape(num_heads, hd)


# ---------------------------------------------------------------------------
# Serving-time weight preparation.
#
# The AMG decode scan re-derives every weight-only product (per-head
# W_q W_k^T score matrices, W_v W_out readouts, kron-expanded upscale
# weights, tiled LN vectors, the output-token concat) EVERY chunk: each is
# a tiny op whose weight staging costs a small async DMA per scan
# iteration — device traces showed those copy-starts dominating the decode
# chunk (STATUS round-3 decode attribution). All of them are prompt- and
# image-independent, so they are hoisted to stacking time here (same move
# as stack_encoder_runs for the encoder / rel-pos tables). Exact matmul
# reassociations only — no approximation.
# ---------------------------------------------------------------------------


def _prep_t2i(p, num_heads: int):
    """Token->image site: score weights A = W_q W_k^T (scale folded), score
    bias a = b_q W_k^T, readout wvo = W_v W_out, const = b_v W_out + b_out
    (see _t2i_attn for the derivation)."""
    f32 = jnp.float32
    wq, bq = _heads_w(p["q"], num_heads)
    wk, _bk = _heads_w(p["k"], num_heads)  # b_k cancels in the softmax
    hd = wq.shape[-1]
    scale = hd**-0.5
    A = jnp.einsum("chd,ehd->hce", wq.astype(f32), wk.astype(f32)) * scale
    a = jnp.einsum("hd,ehd->he", bq.astype(f32), wk.astype(f32)) * scale
    wv, bv = _heads_w(p["v"], num_heads)
    wo = p["out"]["w"].reshape(num_heads, hd, -1)
    wvo = jnp.einsum("chd,hde->hce", wv.astype(f32), wo.astype(f32))
    const = jnp.einsum("hd,hde->e", bv.astype(f32), wo.astype(f32)) + p["out"][
        "b"
    ].astype(f32)
    C = A.shape[1]
    dt = jnp.asarray(p["q"]["w"]).dtype
    return {
        # [C, h*C]: qw[b,t,(h,:)] = q_tok[b,t] @ score_w + score_b
        "score_w": jnp.transpose(A, (1, 0, 2)).reshape(C, -1).astype(dt),
        "score_b": a.reshape(-1),
        # [h*C, C]: the readout as ONE contiguous matmul operand. The
        # [h, C, C] einsum form made XLA stage it into the decode loop as 8
        # per-head slice DMAs per use (~400 ms/call of sliced slice-starts
        # on the decode-scan trace); the flat dot fetches it whole.
        "wvo_flat": wvo.reshape(-1, wvo.shape[-1]).astype(dt),
        "const": const,  # [C] f32
    }


def _prep_i2t(p, num_heads: int):
    """Image->token site: wk/off/vo all become single matmuls from the
    token streams (see _i2t_attn; scale folded):

      wk[b,t,h,:]  = k_tok[b,t] @ (W_k_h W_q_h^T) + b_k_h W_q_h^T
      off[b,h,t]   = k_tok[b,t] @ (W_k_h b_q_h)   + b_k_h . b_q_h
      vo[b,h,t,:]  = v_tok[b,t] @ (W_v_h W_out_h) + b_v_h W_out_h
    """
    f32 = jnp.float32
    wq, bq = _heads_w(p["q"], num_heads)
    wk, bk = _heads_w(p["k"], num_heads)
    hd = wq.shape[-1]
    scale = hd**-0.5
    B_ = jnp.einsum("chd,ehd->hce", wk.astype(f32), wq.astype(f32)) * scale
    c_ = jnp.einsum("hd,ehd->he", bk.astype(f32), wq.astype(f32)) * scale
    d_ = jnp.einsum("chd,hd->hc", wk.astype(f32), bq.astype(f32)) * scale  # [h, C]
    e_ = jnp.einsum("hd,hd->h", bk.astype(f32), bq.astype(f32)) * scale  # [h]
    wv, bv = _heads_w(p["v"], num_heads)
    wo = p["out"]["w"].reshape(num_heads, hd, -1)
    V_ = jnp.einsum("chd,hde->hce", wv.astype(f32), wo.astype(f32))
    f_ = jnp.einsum("hd,hde->he", bv.astype(f32), wo.astype(f32))
    C = B_.shape[1]
    dt = jnp.asarray(p["q"]["w"]).dtype
    return {
        # one matmul yields scores AND offsets: [C, h*C + h]
        "so_w": jnp.concatenate(
            [jnp.transpose(B_, (1, 0, 2)).reshape(C, -1), d_.T], axis=-1
        ).astype(dt),
        "so_b": jnp.concatenate([c_.reshape(-1), e_]),
        "vo_w": jnp.transpose(V_, (1, 0, 2)).reshape(C, -1).astype(dt),  # [C, h*C]
        "vo_b": f_.reshape(-1),
        "const": p["out"]["b"].astype(f32),
        # shared-q (decoder layer 0) needs the raw scaled key projection
        # for its block-diagonal score weights
        "k_w_scaled": (p["k"]["w"].astype(f32) * scale).astype(dt),
        "k_b_scaled": p["k"]["b"].astype(f32) * scale,
    }


def _i2t_from_prepared(prep, k_tok, v_tok, num_heads: int, tp: int):
    """(w [B,C,GT], off [B,GT], vo [B,GT,C], const) for i2t_ln_update from
    the prepared products — two matmuls on the tiny token side."""
    B, T, C = k_tok.shape
    hC = prep["vo_w"].shape[-1]
    so = (
        jnp.dot(
            k_tok.astype(prep["so_w"].dtype),
            prep["so_w"],
            preferred_element_type=jnp.float32,
        )
        + prep["so_b"]
    )  # [B, T, h*C + h]
    wk = so[..., :hC].reshape(B, T, num_heads, -1)  # [B, T, h, C] f32
    off = jnp.transpose(so[..., hC:], (0, 2, 1))  # [B, h, T]
    vo = (
        jnp.dot(
            v_tok.astype(prep["vo_w"].dtype),
            prep["vo_w"],
            preferred_element_type=jnp.float32,
        )
        + prep["vo_b"]
    ).reshape(B, T, num_heads, -1)  # [B, T, h, C]
    pad = tp - T
    w_full = jnp.pad(jnp.transpose(wk, (0, 3, 2, 1)), ((0, 0), (0, 0), (0, 0), (0, pad)))
    off_full = jnp.pad(off, ((0, 0), (0, 0), (0, pad)), constant_values=-1e30)
    vo_full = jnp.pad(
        jnp.transpose(vo, (0, 2, 1, 3)), ((0, 0), (0, 0), (0, pad), (0, 0))
    )
    GT = num_heads * tp
    return (
        w_full.reshape(B, C, GT),
        off_full.reshape(B, GT),
        vo_full.reshape(B, GT, -1),
        prep["const"],
    )


def _i2t_shared_q_from_prepared(prep, k_tok, v_tok, num_heads: int, tp: int):
    """Layer-0 shared-q site from the prepared products (see
    _i2t_prep_shared_q): the block-diagonal score weights come from the
    pre-scaled key projection; vo is the same one-matmul form."""
    B, T, _C = k_tok.shape
    kh = (
        jnp.dot(
            k_tok.astype(prep["k_w_scaled"].dtype),
            prep["k_w_scaled"],
            preferred_element_type=jnp.float32,
        )
        + prep["k_b_scaled"]
    )  # [B, T, D] f32, scale folded
    D = kh.shape[-1]
    hd = D // num_heads
    kh = kh.reshape(B, T, num_heads, hd)
    eye = jnp.eye(num_heads, dtype=jnp.float32)
    w_bd = jnp.einsum("btnd,nm->bndmt", kh, eye)  # [B, n, hd, n, T]
    pad = tp - T
    w_bd = jnp.pad(w_bd, ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad)))
    GT = num_heads * tp
    off = jnp.zeros((B, num_heads, tp), jnp.float32)
    off = off.at[:, :, T:].set(-1e30) if pad else off
    vo = (
        jnp.dot(
            v_tok.astype(prep["vo_w"].dtype),
            prep["vo_w"],
            preferred_element_type=jnp.float32,
        )
        + prep["vo_b"]
    ).reshape(B, T, num_heads, -1)
    vo_full = jnp.pad(
        jnp.transpose(vo, (0, 2, 1, 3)), ((0, 0), (0, 0), (0, pad), (0, 0))
    )
    return (
        w_bd.reshape(B, D, GT),
        off.reshape(B, GT),
        vo_full.reshape(B, GT, -1),
        prep["const"],
    )


def _prep_upscale(u, C: int):
    """The fused-tail weight views: reshaped deconvs (deconv1 group-mean-
    CENTERED so the kernel's matmul emits LN-centered activations directly,
    kernels/upscale_hyper.py:center_w1), kron-expanded second deconv,
    (i, j)-tiled bias/LN vectors (single source of truth for the stacked
    prep and the raw-param fallback in predict_masks)."""
    from ...kernels.upscale_hyper import center_w1

    f32 = jnp.float32
    u1, u2, ln = u["deconv1"], u["deconv2"], u["ln"]
    c4, c8 = u1["w"].shape[-1], u2["w"].shape[-1]
    w1 = jnp.transpose(u1["w"], (2, 0, 1, 3)).reshape(C, 4 * c4)
    w2 = jnp.transpose(u2["w"], (2, 0, 1, 3)).reshape(c4, 4 * c8)
    dt = jnp.asarray(u1["w"]).dtype
    w1c, b1c = center_w1(w1, jnp.tile(u1["b"].astype(f32), 4), c4)
    return {
        "w1": w1c.astype(dt),
        "b1": b1c,
        "ln_s": jnp.tile(ln["scale"].astype(f32), 4),
        "ln_b": jnp.tile(ln["bias"].astype(f32), 4),
        "w2bd": jnp.kron(jnp.eye(4, dtype=w2.dtype), w2).astype(dt),
        "b2": jnp.tile(u2["b"].astype(f32), 16),
    }


def prepare_decoder_params(p_dec, cfg: SamConfig):
    """Returns a copy of the decoder params augmented with the serving
    ``prepared`` products (consumed by two_way_transformer / predict_masks
    when present; the raw format keeps working — tests compare both)."""
    h = cfg.decoder_heads
    tf = dict(p_dec["transformer"])
    layers = []
    for i, layer in enumerate(tf["layers"]):
        lp = dict(layer)
        lp["prepared_t2i"] = _prep_t2i(layer["cross_t2i"], h)
        lp["prepared_i2t"] = _prep_i2t(layer["cross_i2t"], h)
        layers.append(lp)
    tf["layers"] = layers
    tf["prepared_final_t2i"] = _prep_t2i(tf["final_attn"], h)
    out = dict(p_dec)
    out["transformer"] = tf

    # fused upscale tail: the reshaped/kron-expanded weight views
    u = dict(p_dec["upscale"])
    u["prepared"] = _prep_upscale(u, cfg.prompt_dim)
    out["upscale"] = u

    # hypernetwork MLPs: one stacked weight set per depth (the per-token
    # python loop issued 3 matmuls x nmt tokens per chunk)
    depths = len(p_dec["hyper_mlps"][0])
    out["hyper_prepared"] = [
        {
            "w": jnp.stack([m[d]["w"] for m in p_dec["hyper_mlps"]]),
            "b": jnp.stack([m[d]["b"] for m in p_dec["hyper_mlps"]]),
        }
        for d in range(depths)
    ]
    out["output_tokens_prepared"] = jnp.concatenate(
        [p_dec["iou_token"], p_dec["mask_tokens"]], axis=0
    )
    return out


def _t2i_attn(p, q_tok, keys_pe, keys_raw, num_heads: int):
    """Token->image cross attention with every image-side projection
    side-switched onto the token side.

    With T (~7) prompt tokens against S (=4096) image tokens, projecting
    the image stream costs three [B*S, C] @ [C, D] matmuls plus their
    [B, S, D] materialisations. The same contraction reassociated:

      scores[q,k] = (q W_q) . (keys_pe W_k + b_k)
                  = (q W_q W_k^T) . keys_pe   (+ const over k -> cancels
                                               in the softmax)
      out[q]      = sum_k attn[q,k] (keys_raw[k] W_v + b_v) W_out + b_out
                  = einsum(attn, keys_raw) (W_v W_out)  + b_v W_out + b_out
                    (sum_k attn = 1 folds the v-bias into a constant)

    so the image stream is only ever *read* by the two attention einsums;
    the per-head [C, C] products ride on the tiny side. Exact in exact
    arithmetic (matmul reassociation only). Reference math:
    transformer.py:185-240."""
    B = q_tok.shape[0]
    dt = q_tok.dtype
    qh = _lin(p["q"], q_tok)  # [B, T, D]
    T, D = qh.shape[1], qh.shape[2]
    hd = D // num_heads
    qh = qh.reshape(B, T, num_heads, hd)
    wk, _bk = _heads_w(p["k"], num_heads)  # b_k shifts scores uniformly over k
    # [B,T,h,hd] x [C,h,hd] -> [B,T,h,C]  (tiny: T*heads rows)
    qw = jnp.einsum(
        "bthd,chd->bthc", qh.astype(jnp.float32), wk.astype(jnp.float32)
    ).astype(dt)
    scores = jnp.einsum(
        "bthc,bkc->bhtk", qw, keys_pe, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(hd, jnp.float32))
    attn = jax.nn.softmax(scores, axis=-1).astype(dt)
    ctx = jnp.einsum("bhtk,bkc->bthc", attn, keys_raw)
    wv, bv = _heads_w(p["v"], num_heads)
    wo = p["out"]["w"].reshape(num_heads, hd, -1)  # [h, hd, C]
    wvo = jnp.einsum(
        "chd,hde->hce", wv.astype(jnp.float32), wo.astype(jnp.float32)
    )  # [h, C, C]
    out = jnp.einsum("bthc,hce->bte", ctx, wvo.astype(dt))
    const = (
        jnp.einsum("hd,hde->e", bv.astype(jnp.float32), wo.astype(jnp.float32))
        + p["out"]["b"].astype(jnp.float32)
    ).astype(dt)
    return out + const


def _i2t_attn(p, img_q_pe, k_tok, v_tok, num_heads: int):
    """Image->token cross attention with the image-side query projection
    side-switched onto the token side (see _t2i_attn; here the softmax runs
    over the T (~7) tokens, so the q-bias term b_q . k_h[t] varies along the
    softmax axis and is kept as a tiny [B, h, T] offset)."""
    B, S, C = img_q_pe.shape
    dt = img_q_pe.dtype
    kh = _lin(p["k"], k_tok)  # [B, T, D]
    vh = _lin(p["v"], v_tok)
    T, D = kh.shape[1], kh.shape[2]
    hd = D // num_heads
    kh = kh.reshape(B, T, num_heads, hd)
    vh = vh.reshape(B, T, num_heads, hd)
    wq, bq = _heads_w(p["q"], num_heads)
    # wk[b,t,h,:] = W_q[:, h] k_h[b,t,h,:]  (tiny)
    wk = jnp.einsum(
        "chd,bthd->bthc", wq.astype(jnp.float32), kh.astype(jnp.float32)
    ).astype(dt)
    offset = jnp.einsum("hd,bthd->bht", bq.astype(jnp.float32), kh.astype(jnp.float32))
    scale = jax.lax.rsqrt(jnp.asarray(hd, jnp.float32))
    # score layout [B, h, T, S]: softmax over the ~7 tokens rides the
    # SUBLANE axis while the 4096 image tokens stay minor — the transposed
    # [.., S, T] form pads T 7 -> 128 lanes (16x HBM traffic; see
    # _attn_shared_q)
    scores = (
        jnp.einsum("bqc,bthc->bhtq", img_q_pe, wk, preferred_element_type=jnp.float32)
        + offset[:, :, :, None]
    ) * scale
    attn = jax.nn.softmax(scores, axis=2).astype(dt)
    wo = p["out"]["w"].reshape(num_heads, hd, -1)
    # vo[b,t,h,:] = v_h[b,t,h,:] W_out[h]  (tiny)
    vo = jnp.einsum(
        "bthd,hde->bthe", vh.astype(jnp.float32), wo.astype(jnp.float32)
    ).astype(dt)
    out = jnp.einsum("bhtq,bthe->bqe", attn, vo)
    return out + p["out"]["b"].astype(dt)


def _tp_for(T: int) -> int:
    """Padded tokens per head group for the fused i2t kernel (>= T,
    power of two, min 8 so SAM's 7 prompt tokens use one 8-lane group)."""
    tp = 8
    while tp < T:
        tp *= 2
    return tp


def use_fused_i2t() -> bool:
    """Fused image->token attention + norm4 (kernels/decoder_attn.py).
    Default ON; opt OUT via $HYBRIDGL_FUSED_I2T=0."""
    from ...utils.env import env_flag

    return env_flag("HYBRIDGL_FUSED_I2T", default=True)


def use_fused_t2i() -> bool:
    """Flash-style token->image attention (kernels/decoder_attn_t2i.py):
    streams the image tiles once with an online softmax and adds the
    positional encoding in VMEM. Default ON; opt OUT via
    $HYBRIDGL_FUSED_T2I=0."""
    from ...utils.env import env_flag

    return env_flag("HYBRIDGL_FUSED_T2I", default=True)


def use_fused_pass() -> bool:
    """Fused layer pass (kernels/decoder_pass.py): each i2t+LN update also
    accumulates the NEXT t2i's flash statistics in the same sweep, so the
    per-prompt image stream crosses HBM once per layer instead of three
    times. Default ON; opt OUT via $HYBRIDGL_FUSED_PASS=0 (falls back to
    the separate i2t/t2i kernels)."""
    from ...utils.env import env_flag

    return env_flag("HYBRIDGL_FUSED_PASS", default=True)


def _t2i_qw(p, q_tok, num_heads: int, prep=None):
    """The t2i score weights in the kernel layout: QW [B, C, GT] f32 plus
    the epilogue products (wvo [h, C, C], const [C], T, tp). Shared by
    _t2i_fused and the fused layer pass."""
    if prep is None:
        prep = _prep_t2i(p, num_heads)
    B, T = q_tok.shape[0], q_tok.shape[1]
    qw = (
        jnp.dot(
            q_tok.astype(prep["score_w"].dtype),
            prep["score_w"],
            preferred_element_type=jnp.float32,
        )
        + prep["score_b"]
    ).reshape(B, T, num_heads, -1).transpose(0, 2, 1, 3)  # [B, h, T, C]
    tp = _tp_for(T)
    qw = jnp.pad(qw, ((0, 0), (0, 0), (0, tp - T), (0, 0)))
    C = qw.shape[-1]
    QW = qw.transpose(0, 3, 1, 2).reshape(B, C, num_heads * tp)
    return QW, prep["wvo_flat"], prep["const"], T, tp


def _t2i_epilogue(ctx, wvo_flat, const, T: int, tp: int, num_heads: int, dt):
    """ctx [B, h*tp, C] f32 -> attention output [B, T, C] (the token-side
    readout shared by _t2i_fused and the fused layer pass).

    ``wvo_flat`` is the [h*C, C] readout (see _prep_t2i): the contraction
    over (h, c) is ONE plain dot, which XLA stages as a single contiguous
    weight fetch instead of 8 per-head slices inside the decode loop."""
    B, _, C = ctx.shape
    ctx = (
        ctx.reshape(B, num_heads, tp, C)[:, :, :T]
        .transpose(0, 2, 1, 3)
        .astype(dt)
        .reshape(B, T, num_heads * C)
    )
    out = jnp.dot(ctx, wvo_flat.astype(dt))
    return out + const.astype(dt)


def _t2i_fused(p, q_tok, keys, pe, num_heads: int, prep=None):
    """_t2i_attn with the score/readout over the image stream done by the
    t2i_ctx kernel (same side-switched math; kpe built in VMEM). With
    ``prep`` (prepare_decoder_params) the score weights / readout products
    come precomputed — one matmul replaces the projection+fold einsums."""
    from ...kernels.decoder_attn_t2i import t2i_ctx

    dt = q_tok.dtype
    QW, wvo, const, T, tp = _t2i_qw(p, q_tok, num_heads, prep=prep)
    ctx = t2i_ctx(keys, pe, QW)  # [B, GT, C] f32
    return _t2i_epilogue(ctx, wvo, const, T, tp, num_heads, dt)


def _i2t_prep_generic(p, k_tok, v_tok, num_heads: int, tp: int):
    """(score_w [B,C,GT], off [B,GT], vo [B,GT,C], const [C]) for the
    generic image->token site (qside = unprojected kpe): exactly
    _i2t_attn's side-switched weights with the 1/sqrt(hd) scale folded in
    and the token axis padded to ``tp`` per head (padding scores -1e30)."""
    kh = _lin(p["k"], k_tok)
    vh = _lin(p["v"], v_tok)
    B, T, D = kh.shape
    hd = D // num_heads
    kh = kh.reshape(B, T, num_heads, hd)
    vh = vh.reshape(B, T, num_heads, hd)
    wq, bq = _heads_w(p["q"], num_heads)
    scale = hd**-0.5
    wk = jnp.einsum(
        "chd,bthd->bhtc", wq.astype(jnp.float32), kh.astype(jnp.float32)
    ) * scale  # [B,h,T,C]
    off = jnp.einsum(
        "hd,bthd->bht", bq.astype(jnp.float32), kh.astype(jnp.float32)
    ) * scale
    wo = p["out"]["w"].reshape(num_heads, hd, -1)
    vo = jnp.einsum(
        "bthd,hde->bhte", vh.astype(jnp.float32), wo.astype(jnp.float32)
    )  # [B,h,T,C]
    pad = tp - T
    w_full = jnp.pad(wk, ((0, 0), (0, 0), (0, pad), (0, 0)))
    off_full = jnp.pad(off, ((0, 0), (0, 0), (0, pad)), constant_values=-1e30)
    vo_full = jnp.pad(vo, ((0, 0), (0, 0), (0, pad), (0, 0)))
    GT = num_heads * tp
    C = k_tok.shape[-1]
    return (
        w_full.transpose(0, 3, 1, 2).reshape(B, C, GT),
        off_full.reshape(B, GT),
        vo_full.reshape(B, GT, -1),
        p["out"]["b"].astype(jnp.float32),
    )


def _i2t_prep_shared_q(p, k_tok, v_tok, num_heads: int, tp: int):
    """Same outputs for the layer-0 shared-q site (qside = the ONCE-
    projected image queries): the score weights are the block-diagonal
    per-head key projections (_attn_shared_q's contraction)."""
    kh = _lin(p["k"], k_tok)
    vh = _lin(p["v"], v_tok)
    B, T, D = kh.shape
    hd = D // num_heads
    scale = hd**-0.5
    kh = kh.reshape(B, T, num_heads, hd).astype(jnp.float32) * scale
    vh = vh.reshape(B, T, num_heads, hd)
    eye = jnp.eye(num_heads, dtype=jnp.float32)
    # W[b, (n,d), (m,t)] = delta_nm kh[b,t,n,d]
    w_bd = jnp.einsum("btnd,nm->bndmt", kh, eye)  # [B,n,hd,n,T]
    pad = tp - T
    w_bd = jnp.pad(w_bd, ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad)))
    GT = num_heads * tp
    w_full = w_bd.reshape(B, D, GT)
    off = jnp.zeros((B, num_heads, tp), jnp.float32)
    off = off.at[:, :, T:].set(-1e30) if pad else off
    wo = p["out"]["w"].reshape(num_heads, hd, -1)
    vo = jnp.einsum(
        "btnd,nde->bnte", vh.astype(jnp.float32), wo.astype(jnp.float32)
    )  # [B,n,T,C]
    vo_full = jnp.pad(vo, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return (
        w_full,
        off.reshape(B, GT),
        vo_full.reshape(B, GT, -1),
        p["out"]["b"].astype(jnp.float32),
    )


def _two_way_fused_passes(
    p,
    image_embedding: jax.Array,  # [g*g, C] shared across the prompt batch
    image_pe: jax.Array,  # [g*g, C]
    point_embedding: jax.Array,  # [B, T, C]
    cfg: SamConfig,
) -> Tuple[jax.Array, jax.Array]:
    """two_way_transformer(shared_image=True) restructured around the fused
    layer pass (kernels/decoder_pass.py): layer i's i2t+LN sweep also
    accumulates layer i+1's (or the final attention's) t2i statistics, so
    the [B, S, C] image stream crosses HBM once per layer. Exact same math
    as the unfused path — the t2i query side depends only on token state
    (self-attn/norm1) that is complete before the preceding i2t runs."""
    from ...kernels.decoder_pass import i2t_ln_then_t2i

    h = cfg.decoder_heads
    layers = p["layers"]
    L = len(layers)
    dt = point_embedding.dtype

    # layer 0 token-side ops (reference transformer.py:155-166): the
    # image-side t2i here attends the SHARED image — tiny, stays XLA
    layer0 = layers[0]
    queries = _attn(layer0["self_attn"], point_embedding, point_embedding, point_embedding, h)
    queries = _ln(layer0["norm1"], queries)
    q = queries + point_embedding
    k_img = image_embedding + image_pe
    queries = queries + _attn_shared_kv(
        layer0["cross_t2i"], q, k_img, image_embedding, h
    )
    queries = _ln(layer0["norm2"], queries)
    queries = queries + _mlp_relu(layer0["mlp_fc"], layer0["mlp_proj"], queries)
    queries = _ln(layer0["norm3"], queries)

    tp = _tp_for(queries.shape[1])
    pe_b = image_pe[None].astype(dt)
    keys = None
    for i in range(L):
        layer = layers[i]
        q = queries + point_embedding
        if i == 0:
            p0 = layer["cross_i2t"]
            qproj = _lin(p0["q"], k_img.astype(dt))  # [S, D], projected once
            prep0 = layer.get("prepared_i2t")
            if prep0 is not None:
                w, off, vo, const = _i2t_shared_q_from_prepared(prep0, q, queries, h, tp)
            else:
                w, off, vo, const = _i2t_prep_shared_q(p0, q, queries, h, tp)
            qside, base, shared = qproj[None], image_embedding[None].astype(dt), True
        else:
            prep_i = layer.get("prepared_i2t")
            if prep_i is not None:
                w, off, vo, const = _i2t_from_prepared(prep_i, q, queries, h, tp)
            else:
                w, off, vo, const = _i2t_prep_generic(layer["cross_i2t"], q, queries, h, tp)
            qside, base, shared = keys, keys, False
        # next-t2i prologue: the consuming layer's self-attn/norm1 and its
        # score weights are pure token work — complete before this pass
        if i + 1 < L:
            nxt = layers[i + 1]
            qn = queries + point_embedding
            queries_n = queries + _attn(nxt["self_attn"], qn, qn, queries, h)
            queries_n = _ln(nxt["norm1"], queries_n)
            qt = queries_n + point_embedding
            QW, wvo, constT, T, tp2 = _t2i_qw(
                nxt["cross_t2i"], qt, h, prep=nxt.get("prepared_t2i")
            )
        else:
            queries_n = queries
            qt = queries_n + point_embedding
            QW, wvo, constT, T, tp2 = _t2i_qw(
                p["final_attn"], qt, h, prep=p.get("prepared_final_t2i")
            )
        keys, ctx = i2t_ln_then_t2i(
            qside,
            base,
            pe_b,
            w,
            off,
            vo,
            const,
            layer["norm4"]["scale"],
            layer["norm4"]["bias"],
            QW,
            h,
            tp,
            shared_qside=shared,
        )
        queries_n = queries_n + _t2i_epilogue(ctx, wvo, constT, T, tp2, h, dt)
        if i + 1 < L:
            nxt = layers[i + 1]
            queries_n = _ln(nxt["norm2"], queries_n)
            queries_n = queries_n + _mlp_relu(nxt["mlp_fc"], nxt["mlp_proj"], queries_n)
            queries_n = _ln(nxt["norm3"], queries_n)
        else:
            queries_n = _ln(p["norm_final"], queries_n)
        queries = queries_n
    return queries, keys


def two_way_transformer(
    p,
    image_embedding: jax.Array,  # [B, g*g, C] — or [g*g, C] with shared_image
    image_pe: jax.Array,  # [1 or B, g*g, C] — or [g*g, C] with shared_image
    point_embedding: jax.Array,  # [B, T, C]
    cfg: SamConfig,
    shared_image: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (queries [B,T,C], keys [B,g*g,C])
    (reference: transformer.py:62-106, blocks :151-182).

    With ``shared_image`` the image side enters un-batched ([g*g, C]): in
    layer 0 it is identical for every prompt in the batch, so its q/k/v
    projections run once and the [B, g*g, C] image tensor is only
    materialised by the layer-0 image->token output (after which the image
    stream is genuinely per-prompt). Exact same math as the batched path —
    the AMG point loop uses this to avoid re-projecting 4096 image tokens
    per point chunk."""
    h = cfg.decoder_heads
    queries = point_embedding
    if shared_image and use_fused_pass():
        return _two_way_fused_passes(
            p, image_embedding, image_pe, point_embedding, cfg
        )
    if shared_image:
        layer0 = p["layers"][0]
        # layer 0 REPLACES queries with the self-attention output — no
        # residual (reference transformer.py:155-156, skip_first_layer_pe)
        queries = _attn(layer0["self_attn"], queries, queries, queries, h)
        queries = _ln(layer0["norm1"], queries)

        q = queries + point_embedding
        k_img = image_embedding + image_pe  # [g*g, C], shared
        queries = queries + _attn_shared_kv(
            layer0["cross_t2i"], q, k_img, image_embedding, h
        )
        queries = _ln(layer0["norm2"], queries)

        queries = queries + _mlp_relu(layer0["mlp_fc"], layer0["mlp_proj"], queries)
        queries = _ln(layer0["norm3"], queries)

        q = queries + point_embedding
        if use_fused_i2t():
            # fused i2t + norm4 (kernels/decoder_attn.py): the image-query
            # projection runs ONCE on the shared stream, then the kernel
            # does both small matmuls + grouped softmax + LN per tile
            from ...kernels.decoder_attn import i2t_ln_update

            tp = _tp_for(q.shape[1])
            p0 = layer0["cross_i2t"]
            qproj = _lin(p0["q"], k_img.astype(queries.dtype))  # [S, D]
            prep0 = layer0.get("prepared_i2t")
            if prep0 is not None:
                w, off, vo, const = _i2t_shared_q_from_prepared(
                    prep0, q, queries, h, tp
                )
            else:
                w, off, vo, const = _i2t_prep_shared_q(p0, q, queries, h, tp)
            keys = i2t_ln_update(
                qproj[None],
                image_embedding[None].astype(queries.dtype),
                w,
                off,
                vo,
                const,
                layer0["norm4"]["scale"],
                layer0["norm4"]["bias"],
                h,
                tp,
            )
        else:
            keys = image_embedding[None] + _attn_shared_q(
                layer0["cross_i2t"], k_img, q, queries, h
            )
            keys = _ln(layer0["norm4"], keys)

        image_pe = image_pe[None]  # [1, g*g, C] broadcasts against [B, ...]
        layers, first = p["layers"][1:], 1
    else:
        keys = image_embedding
        layers, first = p["layers"], 0

    for i, layer in enumerate(layers, first):
        if i == 0:
            # no residual on the first layer (transformer.py:155-156)
            queries = _attn(layer["self_attn"], queries, queries, queries, h)
        else:
            q = queries + point_embedding
            queries = queries + _attn(layer["self_attn"], q, q, queries, h)
        queries = _ln(layer["norm1"], queries)

        q = queries + point_embedding
        if use_fused_t2i():
            # both fused cross attentions add the PE in VMEM, so the
            # [B, S, C] kpe stream never materialises
            queries = queries + _t2i_fused(
                layer["cross_t2i"], q, keys, image_pe, h,
                prep=layer.get("prepared_t2i"),
            )
        else:
            kpe = keys + image_pe
            queries = queries + _t2i_attn(layer["cross_t2i"], q, kpe, keys, h)
        queries = _ln(layer["norm2"], queries)

        queries = queries + _mlp_relu(layer["mlp_fc"], layer["mlp_proj"], queries)
        queries = _ln(layer["norm3"], queries)

        q = queries + point_embedding
        if use_fused_i2t():
            from ...kernels.decoder_attn import i2t_ln_update

            tp = _tp_for(q.shape[1])
            prep_i = layer.get("prepared_i2t")
            if prep_i is not None:
                w, off, vo, const = _i2t_from_prepared(prep_i, q, queries, h, tp)
            else:
                w, off, vo, const = _i2t_prep_generic(
                    layer["cross_i2t"], q, queries, h, tp
                )
            keys = i2t_ln_update(
                keys,
                keys,
                w,
                off,
                vo,
                const,
                layer["norm4"]["scale"],
                layer["norm4"]["bias"],
                h,
                tp,
                pe=image_pe,
            )
        else:
            kpe = keys + image_pe
            keys = keys + _i2t_attn(layer["cross_i2t"], kpe, q, queries, h)
            keys = _ln(layer["norm4"], keys)

    q = queries + point_embedding
    if use_fused_t2i():
        queries = queries + _t2i_fused(
            p["final_attn"], q, keys, image_pe, h,
            prep=p.get("prepared_final_t2i"),
        )
    else:
        kpe = keys + image_pe
        queries = queries + _t2i_attn(p["final_attn"], q, kpe, keys, h)
    queries = _ln(p["norm_final"], queries)
    return queries, keys


def _mlp_stack(layers, x, sigmoid_output=False):
    for i, p in enumerate(layers):
        x = _lin(p, x)
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    if sigmoid_output:
        x = jax.nn.sigmoid(x)
    return x


def predict_masks(
    p_dec,
    image_embedding: jax.Array,  # [g, g, C] (single image) NHWC
    image_pe: jax.Array,  # [g, g, C]
    sparse_prompts: jax.Array,  # [B, S, C]
    cfg: SamConfig,
    dense_prompts: jax.Array | None = None,  # [B, g, g, C] or None
    multimask_output: bool = True,
    return_blocked: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """All-prompts-at-once mask prediction.

    Returns (mask logits [B, M, 4g, 4g], iou predictions [B, M]) where M is
    3 with multimask_output else 1 (reference: mask_decoder.py:94-149).

    With ``return_blocked=True`` the mask logits come back in the BLOCKED
    upscale layout [B, g*g, 16*M] f32 (minor axis (i, j, e, f, m); row
    4h+2i+e / col 4w+2j+f of the interleaved frame — see
    kernels/upscale_hyper.py:interleave_blocked_masks). Dot consumers
    (resize/placement/stats half-transforms) can contract this layout
    directly, letting XLA fold the spatial interleave into the matmul
    instead of materialising a strided-copy relayout.
    """
    B = sparse_prompts.shape[0]
    g = cfg.embed_grid
    C = cfg.prompt_dim
    nmt = cfg.num_mask_tokens

    # run at the PARAM dtype (core/dtypes.py policy, same as encode_image):
    # the prompt embeddings arrive f32 (sin/cos PE), and following the
    # activation dtype silently upcast every decoder weight — the whole
    # two-way transformer + upscale ran f32 under bf16 serving (2x HBM
    # traffic, quarter-rate MXU; visible as f32[B,4096,256] streams in
    # device traces). Mask logits / IoU still come out f32.
    param_dt = jnp.asarray(p_dec["transformer"]["final_attn"]["q"]["w"]).dtype
    sparse_prompts = sparse_prompts.astype(param_dt)

    output_tokens = p_dec.get("output_tokens_prepared")
    if output_tokens is None:
        output_tokens = jnp.concatenate(
            [p_dec["iou_token"], p_dec["mask_tokens"]], axis=0
        )
    output_tokens = jnp.broadcast_to(output_tokens[None], (B, nmt + 1, C)).astype(
        sparse_prompts.dtype
    )
    tokens = jnp.concatenate([output_tokens, sparse_prompts], axis=1)

    if dense_prompts is None or dense_prompts.ndim == 3:
        # image side identical for every prompt (dense_prompts [g, g, C] or
        # absent): keep it un-batched through layer 0 (see two_way_transformer)
        src = image_embedding
        if dense_prompts is not None:
            src = src + dense_prompts
        src = src.reshape(g * g, C).astype(tokens.dtype)
        pe = image_pe.reshape(g * g, C).astype(tokens.dtype)
        hs, src = two_way_transformer(
            p_dec["transformer"], src, pe, tokens, cfg, shared_image=True
        )
    else:
        src = jnp.broadcast_to(image_embedding[None], (B, g, g, C)) + dense_prompts
        src = src.reshape(B, g * g, C).astype(tokens.dtype)
        pe = jnp.broadcast_to(image_pe.reshape(1, g * g, C), (B, g * g, C)).astype(
            tokens.dtype
        )
        hs, src = two_way_transformer(p_dec["transformer"], src, pe, tokens, cfg)
    iou_token_out = hs[:, 0, :]
    mask_tokens_out = hs[:, 1 : 1 + nmt, :]

    # upscale image features 4x (mask_decoder.py:53-59) — in BLOCKED layout.
    # Both deconvs have kernel == stride == 2 (non-overlapping windows), so
    # each is a per-pixel matmul; the spatial interleave is a pure
    # permutation that commutes with the bias/LN/GELU elementwise tail, so
    # it is deferred all the way past the hypernetwork contraction.
    u1, u2 = p_dec["upscale"]["deconv1"], p_dec["upscale"]["deconv2"]
    c4, c8 = u1["w"].shape[-1], u2["w"].shape[-1]
    hyper_prep = p_dec.get("hyper_prepared")
    if hyper_prep is not None:
        # one stacked einsum per depth instead of nmt separate MLP chains
        xh = mask_tokens_out  # [B, nmt, C]
        for d, pd in enumerate(hyper_prep):
            xh = (
                jnp.einsum("bmc,mck->bmk", xh, pd["w"].astype(xh.dtype))
                + pd["b"].astype(xh.dtype)
            )
            if d < len(hyper_prep) - 1:
                xh = jax.nn.relu(xh)
        hyper = xh
    else:
        hyper = jnp.stack(
            [
                _mlp_stack(p_dec["hyper_mlps"][i], mask_tokens_out[:, i, :])
                for i in range(nmt)
            ],
            axis=1,
        )  # [B, nmt, C/8]
    g4 = 4 * g

    # the caller keeps only tokens [1:] (multimask) or [:1] — select the
    # hypernetwork rows BEFORE the contraction so the tail never computes
    # the dropped token's 4g x 4g plane (exact: that row was never read)
    sel = slice(1, None) if multimask_output else slice(0, 1)
    hyper = hyper[:, sel]
    n_sel = hyper.shape[1]

    if use_fused_upscale():
        # Fused Pallas tail (kernels/upscale_hyper.py): the XLA blocked
        # einsums materialise ~2 GB of 32-lane/2-sublane intermediates per
        # 128-prompt chunk (~6% tile occupancy, ~25 of a ~32 ms decode
        # chunk on v5e). The kernel keeps everything in VMEM as three
        # row-parallel matmuls; one XLA transpose interleaves at the end.
        from ...kernels.upscale_hyper import (
            interleave_blocked_masks,
            upscale_hyper_blocked,
        )

        dt = src.dtype
        pu = p_dec["upscale"].get("prepared")
        if pu is None:
            pu = _prep_upscale(p_dec["upscale"], C)
        hbd = jax.vmap(
            lambda hyp: jnp.kron(jnp.eye(16, dtype=hyp.dtype), hyp.T)
        )(hyper)  # [B, 16c8, 16m]
        y = upscale_hyper_blocked(
            src.reshape(B, g * g, C),
            pu["w1"].astype(dt),
            pu["b1"],
            pu["ln_s"],
            pu["ln_b"],
            pu["w2bd"].astype(dt),
            pu["b2"],
            hbd.astype(dt),
        )
        if return_blocked:
            iou_pred = _mlp_stack(p_dec["iou_head"], iou_token_out).astype(jnp.float32)
            return y.astype(jnp.float32), iou_pred[:, sel]
        masks = interleave_blocked_masks(y, g, n_sel)
    else:
        w1 = jnp.transpose(u1["w"], (2, 0, 1, 3)).reshape(C, 4 * c4)  # [C, i*j*c4]
        w2 = jnp.transpose(u2["w"], (2, 0, 1, 3)).reshape(c4, 4 * c8)  # [c4, e*f*c8]
        up = src.reshape(B, g, g, C)
        x = jnp.einsum("bhwc,ck->bhwk", up, w1.astype(up.dtype))
        x = x.reshape(B, g, g, 2, 2, c4) + u1["b"].astype(x.dtype)
        x = layer_norm_2d(p_dec["upscale"]["ln"], x)  # channel LN: last-dim
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.einsum("bhwijc,ck->bhwijk", x, w2.astype(x.dtype))
        x = x.reshape(B, g, g, 2, 2, 2, 2, c8) + u2["b"].astype(x.dtype)
        x = jax.nn.gelu(x, approximate=False)  # [b, h, w, i, j, e, f, c]
        if return_blocked:
            y = jnp.einsum(
                "bmc,bhwijefc->bhwijefm", hyper, x,
                preferred_element_type=jnp.float32,
            ).astype(jnp.float32).reshape(B, g * g, 16 * n_sel)
            iou_pred = _mlp_stack(p_dec["iou_head"], iou_token_out).astype(jnp.float32)
            return y, iou_pred[:, sel]
        # rows are (h, i, e) -> 4h+2i+e, cols (w, j, f) -> 4w+2j+f
        masks = jnp.einsum(
            "bmc,bhwijefc->bmhiewjf", hyper, x, preferred_element_type=jnp.float32
        ).astype(jnp.float32).reshape(B, n_sel, g4, g4)

    iou_pred = _mlp_stack(p_dec["iou_head"], iou_token_out).astype(jnp.float32)
    return masks, iou_pred[:, sel]
