"""SAM image encoder (ViTDet-style) in functional JAX.

Semantics match the reference encoder
(reference: third_party/segment-anything/segment_anything/modeling/image_encoder.py):
16x16 patch embed + absolute pos embed, ``depth`` blocks of 14x14 windowed
attention except the four global-attention blocks, decomposed relative
position bias, and a two-conv neck to ``prompt_dim`` channels.

TPU structure notes:
  * everything is NHWC (conv-friendly on TPU);
  * windowed attention reshapes to one [B*25, 196, D] batch -> a single
    fused MXU batch per block instead of per-window loops;
  * block weights are served STACKED (stack_encoder_runs) and consumed by
    lax.scan — one streamed buffer per weight instead of ~500 per-block
    DMAs per call (docs/DESIGN.md "Weight layout");
  * attention scores live in the factored (qh, qw, kh, kw) view so the
    decomposed rel-pos adds never force an [S, S] relayout copy; the
    4096-token global blocks default to the Pallas flash kernel
    (kernels/flash_attention.py) which folds the bias into its tile loop.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ...core.config import SamConfig
from ...core.dtypes import score_dtype, softmax_scores2

LN_EPS = 1e-6  # build_sam.py uses LayerNorm(eps=1e-6) throughout the encoder


def _ln(p, x, eps=LN_EPS):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), -1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(dt)


def layer_norm_2d(p, x, eps=LN_EPS):
    """Channel LayerNorm on NHWC maps (reference LayerNorm2d, common.py:27-43)."""
    return _ln(p, x, eps)


def get_rel_pos_table(size: int, rel_pos: jax.Array) -> jax.Array:
    """R[q, k] = rel_pos[q - k + size - 1]; [S, S, head_dim].

    (reference: image_encoder.py:292-322; no interpolation needed because
    converted checkpoints carry the exact 2S-1 table.)
    """
    q = jnp.arange(size)[:, None]
    k = jnp.arange(size)[None, :]
    idx = q - k + (size - 1)
    return rel_pos[idx]


def _rel_tables(p_attn, size: int, dtype) -> tuple[jax.Array, jax.Array]:
    """The per-block [size, size, hd] rel-pos tables.

    Prefer the precomputed ``rel_tab_h/w`` (added by stack_encoder_runs):
    gathering from the raw (2*size-1, hd) param INSIDE the windowed-run scan
    made XLA stage the whole stacked [depth, 2G-1, hd] table through VMEM
    every iteration — a device trace showed ~69 ms/call of copy-starts on
    the [28, 27, 80] buffers alone (vs a ~50 ms loop wall). The precomputed
    tables stream with the rest of the block's weights instead."""
    if "rel_tab_h" in p_attn:
        return p_attn["rel_tab_h"].astype(dtype), p_attn["rel_tab_w"].astype(dtype)
    return (
        get_rel_pos_table(size, p_attn["rel_pos_h"].astype(dtype)),
        get_rel_pos_table(size, p_attn["rel_pos_w"].astype(dtype)),
    )


def decomposed_rel_pos_bias(q: jax.Array, rel_pos_h, rel_pos_w, size: int):
    """Per-head additive attention bias from decomposed rel-pos.

    q: [B, heads, S*S, hd] -> bias [B, heads, S*S, S*S]
    (reference math: image_encoder.py:325-361).
    """
    B, H, _, hd = q.shape
    Rh = get_rel_pos_table(size, rel_pos_h)  # [S, S, hd]
    Rw = get_rel_pos_table(size, rel_pos_w)
    r_q = q.reshape(B, H, size, size, hd)
    rel_h = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh, preferred_element_type=jnp.float32)
    rel_w = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw, preferred_element_type=jnp.float32)
    bias = rel_h[..., :, None] + rel_w[..., None, :]  # [B,H,h,w,kh,kw]
    return bias.reshape(B, H, size * size, size * size)


def use_flash_attention() -> bool:
    """Pallas flash attention for the 4096-token global blocks; opt OUT
    via $HYBRIDGL_FLASH=0.

    Default is ON (round 2): isolated back-to-back measurement on v5e has
    the kernel at ~12 ms vs ~23 ms for the 4 global blocks against even
    the factored-view XLA attention (round 1's e2e A/B that kept it off —
    1.33 vs 1.25 img/s — predates the factored view and was within the
    tunnel's noise band). Sizes >= 32 use the tiled augmented-contraction
    kernel (flash_attention_fused); windowed sizes 8..31 use the
    whole-window fused kernel when use_flash_windowed() also allows it
    (HYBRIDGL_FLASH_WINDOWED=0 turns just the windowed kernel off);
    smaller sizes keep the factored XLA path.
    """
    from ...utils.env import env_flag

    return env_flag("HYBRIDGL_FLASH", default=True)


def use_flash_windowed() -> bool:
    """Fused whole-window Pallas attention for the 14x14 windowed blocks
    (28 of 32 in ViT-H): qkv consumed in its natural [B, S, 3D] layout,
    rel-pos bias folded into the score matmul via augmented contraction
    (kernels/flash_attention.py:flash_windowed_fused). Opt OUT via
    $HYBRIDGL_FLASH_WINDOWED=0."""
    from ...utils.env import env_flag

    return env_flag("HYBRIDGL_FLASH_WINDOWED", default=True)


def _attention(p_attn, x: jax.Array, num_heads: int, size: int) -> jax.Array:
    """Windowed/global attention over an [B, S, S, D] tile with rel-pos."""
    B = x.shape[0]
    D = x.shape[-1]
    tokens = x.reshape(B, size * size, D)
    qkv = tokens @ p_attn["qkv_w"].astype(x.dtype) + p_attn["qkv_b"].astype(x.dtype)
    # attention width from the qkv projection, not the input: under tensor
    # parallelism (parallel/encoder_tp.py) qkv_w maps D -> 3*(D/mp) for
    # this shard's head group; Da == D in the unsharded case
    Da = qkv.shape[-1] // 3
    hd = Da // num_heads
    scale = hd**-0.5

    if size < 32 and size >= 8 and use_flash_attention() and use_flash_windowed():
        # windowed blocks: the fused whole-window kernel consumes qkv in
        # its natural [B, S, 3*Da] layout — no head-major relayouts, no
        # 6-D rel-pos reshapes (trace-guided; see flash_windowed_fused)
        import jax as _jax

        from ...kernels.flash_attention import (
            flash_windowed_fused,
            pad_windowed_proj,
            windowed_lane,
            windowed_rel_terms,
        )

        # NOTE (round 5, measured and REJECTED): folding Wq into the rel
        # tables at stack time (rel_h = x @ (Wq Rh^T) + bq Rh^T, two plain
        # batched matmuls replacing this einsum chain) targeted the
        # ~0.19 ms/block of reshape/convert/relayout the trace shows here —
        # but a same-process 28-block A/B measured 75.8 -> 77.6 ms/scan
        # (tools/bench_windowed.py --only flash): the chain's copies
        # overlap the MXU stream, while the fold's +3 GF/block and
        # +16 MB/block of streamed [G, D, H*G] tables sit on the wall.
        Rh, Rw = _rel_tables(p_attn, size, x.dtype)
        rel_h, rel_w = windowed_rel_terms(qkv, Rh, Rw, num_heads, size)
        out = flash_windowed_fused(qkv, rel_h, rel_w, num_heads, size)
        # kernel output is head-padded [B, S, H*lane]; consume it with
        # zero-expanded proj rows instead of a lane-repack copy
        lane = windowed_lane(hd, size, _jax.default_backend() == "cpu")
        proj_w = pad_windowed_proj(p_attn["proj_w"].astype(x.dtype), num_heads, lane)
        out = out @ proj_w + p_attn["proj_b"].astype(x.dtype)
        return out.reshape(B, size, size, D)

    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, size * size, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)

    if size >= 32 and use_flash_attention():
        # fold the decomposed rel-pos bias into the Pallas flash kernel via
        # augmented contraction: precompute the two rank-G terms from q
        # (tiny), never materialise the [S, S] bias or attention matrix
        from ...kernels.flash_attention import (
            flash_attention_fused,
            pad_windowed_proj,
        )

        Rh, Rw = _rel_tables(p_attn, size, x.dtype)
        S = size * size
        r_q = q.reshape(B, num_heads, size, size, hd)
        rel_h = jnp.einsum(
            "bnhwc,hkc->bnhwk", r_q, Rh, preferred_element_type=jnp.float32
        ).reshape(B * num_heads, S, size)
        rel_w = jnp.einsum(
            "bnhwc,wkc->bnhwk", r_q, Rw, preferred_element_type=jnp.float32
        ).reshape(B * num_heads, S, size)
        out = flash_attention_fused(
            (q * scale).reshape(B * num_heads, S, hd),
            k.reshape(B * num_heads, S, hd),
            v.reshape(B * num_heads, S, hd),
            rel_h.astype(x.dtype),
            rel_w.astype(x.dtype),
            size,
        )  # [B*H, S, lane_v] head-padded
        lane_v = out.shape[-1]
        out = out.reshape(B, num_heads, S, lane_v).transpose(0, 2, 1, 3)
        out = out.reshape(B, S, num_heads * lane_v)
        proj_w = pad_windowed_proj(p_attn["proj_w"].astype(x.dtype), num_heads, lane_v)
        out = out @ proj_w + p_attn["proj_b"].astype(x.dtype)
        return out.reshape(B, size, size, D)
    else:
        # Attention entirely in the FACTORED position view: scores are
        # produced, biased, softmaxed and consumed as
        # [B, H, qh, qw, kh, kw] — the row-major view of [B, H, S, S] — so
        # the decomposed rel-pos adds need no reshape and XLA never emits
        # the [S, S] <-> 6-D relayout copies the flat formulation forced
        # (global blocks measured ~4x faster on v5e: ~14 -> ~3.5 ms/block).
        # Scores stored at the serving dtype (core/dtypes.py policy); QK
        # still accumulates f32 on the MXU.
        score_dt = score_dtype(x.dtype)
        q6 = q.reshape(B, num_heads, size, size, hd)
        k6 = k.reshape(B, num_heads, size, size, hd)
        v6 = v.reshape(B, num_heads, size, size, hd)
        attn6 = jnp.einsum(
            "bnhwc,bnHWc->bnhwHW", q6 * scale, k6, preferred_element_type=jnp.float32
        ).astype(score_dt)
        Rh, Rw = _rel_tables(p_attn, size, x.dtype)
        rel_h = jnp.einsum(
            "bnhwc,hkc->bnhwk", q6, Rh, preferred_element_type=jnp.float32
        ).astype(score_dt)
        rel_w = jnp.einsum(
            "bnhwc,wkc->bnhwk", q6, Rw, preferred_element_type=jnp.float32
        ).astype(score_dt)
        attn6 = attn6 + rel_h[..., :, None] + rel_w[..., None, :]
        attn6 = softmax_scores2(attn6).astype(x.dtype)
        out = jnp.einsum(
            "bnhwHW,bnHWc->bnhwc", attn6, v6, preferred_element_type=jnp.float32
        ).reshape(B, num_heads, size * size, hd)

    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, size * size, Da)
    out = out @ p_attn["proj_w"].astype(x.dtype) + p_attn["proj_b"].astype(x.dtype)
    return out.reshape(B, size, size, D)


def window_partition(x: jax.Array, window: int):
    """[B, H, W, C] -> [B*nW, win, win, C] with zero padding
    (reference: image_encoder.py:243-264)."""
    B, H, W, C = x.shape
    pad_h = (window - H % window) % window
    pad_w = (window - W % window) % window
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window, window, Wp // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, C)
    return x, (Hp, Wp)


def window_unpartition(wins: jax.Array, window: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    C = wins.shape[-1]
    B = wins.shape[0] // ((Hp // window) * (Wp // window))
    x = wins.reshape(B, Hp // window, Wp // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :H, :W, :]


def _mlp(p, x):
    h = x @ p["mlp_fc"]["w"].astype(x.dtype) + p["mlp_fc"]["b"].astype(x.dtype)
    h = jax.nn.gelu(h, approximate=False)
    return h @ p["mlp_proj"]["w"].astype(x.dtype) + p["mlp_proj"]["b"].astype(x.dtype)


def encoder_block(p, x: jax.Array, cfg: SamConfig, window: int) -> jax.Array:
    """One ViTDet block; window==0 means global attention
    (reference: image_encoder.py:166-182)."""
    shortcut = x
    x = _ln(p["ln_1"], x)
    if window > 0:
        H, W = x.shape[1], x.shape[2]
        wins, pad_hw = window_partition(x, window)
        wins = _attention(p["attn"], wins, cfg.encoder_heads, window)
        x = window_unpartition(wins, window, pad_hw, (H, W))
    else:
        x = _attention(p["attn"], x, cfg.encoder_heads, x.shape[1])
    x = shortcut + x
    return x + _mlp(p, _ln(p["ln_2"], x))


def window_runs(cfg: SamConfig):
    """Static block schedule: maximal runs of consecutive windowed blocks
    plus the interleaved global blocks, e.g. ViT-H -> [(win, 0..6),
    (global, 7), (win, 8..14), ...]."""
    runs = []
    cur = []
    for i in range(cfg.encoder_depth):
        if i in cfg.encoder_global_idx:
            if cur:
                runs.append(("win", cur))
                cur = []
            runs.append(("global", [i]))
        else:
            cur.append(i)
    if cur:
        runs.append(("win", cur))
    return runs


def stack_encoder_runs(sam_params, cfg: SamConfig):
    """Convert the public list-of-blocks encoder param format into the
    scan-ready run format: each windowed run's blocks stacked along a
    leading axis (``block_runs``), global blocks kept as-is.

    Why: with ~500 separate per-block weight buffers XLA issues a small
    async copy/slice DMA per weight per block per call — a device trace
    showed copy-start/slice-start at ~360 ms/call vs ~120 ms of actual
    compute. Scanning over ONE stacked buffer per run turns those into a
    double-buffered dynamic-slice stream (the canonical TPU weight layout)
    and shrinks the traced graph ~8x (compile time). Call once at pipeline
    construction; ``encode_image`` accepts both formats.
    """
    enc = dict(sam_params["encoder"])
    blocks = enc.pop("blocks")

    def with_tables(bp, size):
        # precompute the [size, size, hd] rel-pos tables so the serving
        # scan never gathers from the stacked (2*size-1, hd) params inside
        # the loop (see _rel_tables)
        attn = dict(bp["attn"])
        attn["rel_tab_h"] = get_rel_pos_table(size, attn["rel_pos_h"])
        attn["rel_tab_w"] = get_rel_pos_table(size, attn["rel_pos_w"])
        out = dict(bp)
        out["attn"] = attn
        return out

    rps = []
    for kind, idxs in window_runs(cfg):
        size = cfg.window_size if kind == "win" else cfg.embed_grid
        if len(idxs) == 1:
            rps.append(with_tables(blocks[idxs[0]], size))
        else:
            from ...core.params import stack_block_params

            rps.append(
                stack_block_params([with_tables(blocks[i], size) for i in idxs])
            )
    enc["block_runs"] = rps
    out = dict(sam_params)
    out["encoder"] = enc
    if "decoder" in out:
        # hoist the decoder's weight-only products (per-head score/readout
        # matrices, kron-expanded upscale weights, stacked hypernetwork
        # MLPs) to stacking time too: the AMG decode scan re-derived them
        # every point chunk, and their tiny staging DMAs dominated the
        # chunk wall (see models/sam/decoder.py:prepare_decoder_params)
        from .decoder import prepare_decoder_params

        out["decoder"] = prepare_decoder_params(out["decoder"], cfg)
    return out


def embed_patches(p, images: jax.Array, cfg: SamConfig) -> jax.Array:
    """Patchify conv + abs pos embed at the PARAM dtype (shared by the
    single-device and tensor-parallel encoders)."""
    dt = jnp.asarray(p["patch_embed"]["w"]).dtype
    images = images.astype(dt)
    x = jax.lax.conv_general_dilated(
        images,
        p["patch_embed"]["w"].astype(dt),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(dt) + p["patch_embed"]["b"].astype(dt)
    return x + p["pos_embed"].astype(dt)


def neck(p, x: jax.Array) -> jax.Array:
    """1x1 conv -> LN2d -> 3x3 conv -> LN2d (image_encoder.py:88-104)."""
    dt = x.dtype
    x = jax.lax.conv_general_dilated(
        x,
        p["neck"]["conv1_w"].astype(dt),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    x = layer_norm_2d(p["neck"]["ln1"], x)
    x = jax.lax.conv_general_dilated(
        x,
        p["neck"]["conv2_w"].astype(dt),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    return layer_norm_2d(p["neck"]["ln2"], x)


def encode_image(p, images: jax.Array, cfg: SamConfig) -> jax.Array:
    """images: [N, 1024, 1024, 3] preprocessed -> [N, 64, 64, prompt_dim].

    Runs at the PARAM dtype: preprocessing emits f32 (normalisation), and
    following the activation dtype would silently run the whole encoder —
    the pipeline's hottest stage — in f32 (quarter-rate MXU, 2x score-DMA).
    Casting params bf16 (core.params.cast_pytree) is what selects bf16
    serving; matmuls still accumulate f32 via preferred_element_type.
    """
    x = embed_patches(p, images, cfg)

    runs = window_runs(cfg)
    if "block_runs" in p:
        run_params = p["block_runs"]
    else:
        # public list format: stack windowed runs at trace time (adds one
        # in-call device copy of the run's weights; prefer pre-stacking
        # via stack_encoder_runs for serving)
        from ...core.params import stack_block_params

        run_params = [
            p["blocks"][idxs[0]]
            if len(idxs) == 1
            else stack_block_params([p["blocks"][i] for i in idxs])
            for _, idxs in runs
        ]
    for (kind, idxs), rp in zip(runs, run_params):
        if kind == "global":
            x = encoder_block(rp, x, cfg, 0)
        elif len(idxs) == 1:
            x = encoder_block(rp, x, cfg, cfg.window_size)
        else:
            # one scanned body serves the whole windowed run: weights
            # stream via double-buffered dynamic-slice instead of per-block
            # copies, and the graph carries the body once
            def body(h, bp):
                return encoder_block(bp, h, cfg, cfg.window_size), None

            n_run = len(idxs)
            unroll = int(os.environ.get("HYBRIDGL_ENC_UNROLL", "1"))
            if n_run % max(unroll, 1):
                unroll = 1
            x, _ = jax.lax.scan(body, x, rp, unroll=max(unroll, 1))

    return neck(p, x)
