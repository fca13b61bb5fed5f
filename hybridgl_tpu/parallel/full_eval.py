"""Full-parity multi-chip eval: the COMPLETE per-image pipeline (SAM
proposals -> crops -> fusion -> text ensembles + negatives -> GEM heatmap ->
box-relation guidance -> selection -> IoU) as one shard_map'd step over a
('dp',) or ('dp','mp') mesh.

Differences from the sequential driver (pipeline/runner.py):
  * sentences are padded to a static per-image bucket (``max_sentences``)
    with validity masking; expression parsing/tokenisation happens on the
    host up front (ExpressionParser is pure python);
  * the reference's *sticky* k1/k2 clamp is inherently a sequential global
    mutation (Hybridgl_main.py:178-181) and cannot exist under data
    parallelism; this path uses the non-sticky per-image clamp
    (CompatConfig.k_clamp_sticky=False semantics);
  * the host small-region cleanup is skipped (min_mask_region_area treated
    as 0) — connected components has no jittable equivalent yet.

Collectives: psum of the four IoU scalars over dp (+ the fusion-stage
all_gather over mp when enabled). Everything else is local.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import PipelineConfig
from ..eval.metrics import IoUAccum, mask_iou
from ..kernels.masks import box_xyxy_to_xywh
from ..kernels.resize import (
    place_valid_region_antialias,
    resize_bilinear,
    valid_mask,
)
from ..models.clip import tokenizer as tok
from ..models.clip.fusion import calculate_score, hybrid_forward
from ..models.clip.text import encode_text
from ..models.gem.gem import gem_image_features, gem_preprocess
from ..models.sam.amg import generate_proposals
from ..pipeline.guidance import (
    dir_flag_id,
    gem_mask_scores,
    normalize_heatmap,
    rela_flag_id,
    select_candidates,
)
from ..pipeline.preprocess import build_crops


class FullEvalBatch(NamedTuple):
    """Host-prepared batch; leading axis B shards over dp."""

    image_1024: jax.Array  # [B, S, S, 3] uint8
    rh: jax.Array  # [B]
    rw: jax.Array
    image_canonical: jax.Array  # [B, C, C, 3] uint8
    h: jax.Array
    w: jax.Array
    gt_mask: jax.Array  # [B, C, C] bool
    tokens_sentence: jax.Array  # [B, S_max, L]
    tokens_np: jax.Array  # [B, S_max, L]
    tokens_others: jax.Array  # [B, S_max, K, L]
    n_others: jax.Array  # [B, S_max]
    dir_flag: jax.Array  # [B, S_max]
    rela_flag: jax.Array  # [B, S_max]
    black: jax.Array  # [B, S_max] f32
    has_other: jax.Array  # [B, S_max] bool
    sentence_valid: jax.Array  # [B, S_max] bool


def prepare_records(
    samples,  # iterable of pipeline.runner.ImageSample
    parser,
    cfg: PipelineConfig,
    tokenizer=None,
    max_sentences: int = 4,
) -> FullEvalBatch:
    """Host-side batch assembly: parse + tokenize every sentence, pad to
    the sentence bucket, stack images."""
    g = cfg.guidance
    L = cfg.clip.context_length
    K = g.max_other_nouns
    tk = tokenizer or tok.default_tokenizer()

    arrays = {k: [] for k in FullEvalBatch._fields}
    for s in samples:
        arrays["image_1024"].append(s.image_1024)
        arrays["rh"].append(s.rh)
        arrays["rw"].append(s.rw)
        arrays["image_canonical"].append(s.image_canonical)
        arrays["h"].append(s.h)
        arrays["w"].append(s.w)
        arrays["gt_mask"].append(
            s.gt_mask
            if s.gt_mask is not None
            else np.zeros((cfg.canonical_size,) * 2, bool)
        )
        ts = np.zeros((max_sentences, L), np.int32)
        tn = np.zeros((max_sentences, L), np.int32)
        to = np.zeros((max_sentences, K, L), np.int32)
        no = np.zeros(max_sentences, np.int32)
        df = np.zeros(max_sentences, np.int32)
        rf = np.zeros(max_sentences, np.int32)
        bl = np.full(max_sentences, g.black_other, np.float32)
        ho = np.zeros(max_sentences, bool)
        sv = np.zeros(max_sentences, bool)
        for i, sentence in enumerate(list(s.sentences)[:max_sentences]):
            parsed = parser.parse(sentence)
            kwargs = dict(tokenizer=tk, context_length=L, truncate=True)
            ts[i] = tok.tokenize(parsed.sentence, **kwargs)[0]
            tn[i] = tok.tokenize(parsed.noun_phrase, **kwargs)[0]
            for j, noun in enumerate(parsed.other_noun_phrases[:K]):
                to[i, j] = tok.tokenize("a photo of " + noun, **kwargs)[0]
            no[i] = min(len(parsed.other_noun_phrases), K)
            df[i] = dir_flag_id(parsed.dir_flag)
            rf[i] = rela_flag_id(parsed.rela_flag)
            bl[i] = (
                g.black_big
                if parsed.rela_flag == "big"
                else g.black_small if parsed.rela_flag == "small" else g.black_other
            )
            ho[i] = parsed.has_other_nouns
            sv[i] = True
        arrays["tokens_sentence"].append(ts)
        arrays["tokens_np"].append(tn)
        arrays["tokens_others"].append(to)
        arrays["n_others"].append(no)
        arrays["dir_flag"].append(df)
        arrays["rela_flag"].append(rf)
        arrays["black"].append(bl)
        arrays["has_other"].append(ho)
        arrays["sentence_valid"].append(sv)
    return FullEvalBatch(**{k: np.stack(v) for k, v in arrays.items()})


def _image_full_step(sam_params, clip_params, rec, cfg: PipelineConfig, mp_axis):
    sam_cfg, clip_cfg = cfg.sam, cfg.clip
    C = cfg.canonical_size
    g = cfg.guidance
    props = generate_proposals(
        sam_params, rec.image_1024, rec.rh, rec.rw, rec.h, rec.w, sam_cfg, cfg.amg, C
    )
    masks = props.masks
    if mp_axis is not None:
        mp = jax.lax.axis_size(mp_axis)
        idx = jax.lax.axis_index(mp_axis)
        shard = masks.shape[0] // mp
        masks_shard = jax.lax.dynamic_slice_in_dim(masks, idx * shard, shard, 0)
    else:
        masks_shard = masks
    glob, local = build_crops(
        rec.image_canonical, masks_shard, (rec.h, rec.w), cfg.crop_size, cfg.blur_ksize
    )
    feats = hybrid_forward(
        clip_params["visual"],
        local,
        glob,
        masks_shard.astype(jnp.float32),
        clip_cfg,
        fusion_mode=cfg.fusion_mode,
        masking_block=g.masking_block,
        compat=cfg.compat,
        masks_hw=(rec.h, rec.w),
    )
    if mp_axis is not None:
        feats = jax.lax.all_gather(feats, mp_axis, axis=0, tiled=True)

    # GEM patch features once per image
    gem_u8 = jnp.round(
        resize_bilinear(
            rec.image_canonical, (cfg.gem.img_size, cfg.gem.img_size), src_hw=(rec.h, rec.w)
        )
    ).astype(jnp.uint8)
    gem_img = gem_preprocess(gem_u8, cfg.gem.img_size)
    gem_pf, _, _ = gem_image_features(clip_params["visual"], gem_img[None], clip_cfg, cfg.gem)
    gem_pf = gem_pf[0] / jnp.maximum(
        jnp.linalg.norm(gem_pf[0], axis=-1, keepdims=True), 1e-6
    )
    gem_grid = cfg.gem.img_size // clip_cfg.patch_size

    num = props.num
    k1 = jnp.minimum(jnp.asarray(g.k1), jnp.maximum(num, 1))
    k2 = jnp.minimum(jnp.asarray(g.k2), jnp.maximum(num, 1))
    boxes_xywh = box_xyxy_to_xywh(props.boxes_xyxy)
    vm = valid_mask((C, C), (rec.h, rec.w))
    ls = clip_params["logit_scale"]

    pure_acc = IoUAccum.zeros()
    final_acc = IoUAccum.zeros()
    S_max = rec.tokens_sentence.shape[0]
    pure_idx = jnp.zeros((S_max,), jnp.int32)
    final_idx = jnp.zeros((S_max,), jnp.int32)
    pure_ious = jnp.zeros((S_max,), jnp.float32)
    final_ious = jnp.zeros((S_max,), jnp.float32)

    for si in range(S_max):
        stacked = jnp.concatenate(
            [rec.tokens_sentence[si][None], rec.tokens_np[si][None], rec.tokens_others[si]],
            axis=0,
        )
        tf = encode_text(clip_params["text"], stacked, clip_cfg)
        sent_f, np_f, other_f = tf[0], tf[1], tf[2:]
        text_ensemble = g.r * sent_f + (1 - g.r) * np_f
        score = calculate_score(feats, text_ensemble[None], ls)[:, 0]
        k_mask = (jnp.arange(other_f.shape[0]) < rec.n_others[si])[:, None]
        neg_mean = jnp.where(k_mask, other_f, 0.0).sum(0) / jnp.maximum(
            rec.n_others[si], 1
        )
        neg_norm = jnp.maximum(jnp.linalg.norm(neg_mean), 1e-6)
        score_neg = (
            jnp.exp(ls)
            * (feats / jnp.linalg.norm(feats, axis=-1, keepdims=True))
            @ (neg_mean / neg_norm)
        )
        npf_n = np_f / jnp.maximum(jnp.linalg.norm(np_f), 1e-6)
        rel = (gem_pf @ npf_n).reshape(gem_grid, gem_grid)
        heat448 = resize_bilinear(rel, (cfg.gem.img_size, cfg.gem.img_size))
        heat = place_valid_region_antialias(heat448, (C, C), (rec.h, rec.w))
        heat = normalize_heatmap(heat, vm, rec.dir_flag[si])
        gem_scores = gem_mask_scores(heat, props.masks, vm, rec.black[si])
        sel = select_candidates(
            score,
            score_neg,
            boxes_xywh,
            gem_scores,
            props.valid,
            rec.rela_flag[si],
            rec.has_other[si],
            k1,
            k2,
            alpha=g.alpha,
        )
        enabled = rec.sentence_valid[si] & (num > 0)
        pi, pu, pio = mask_iou(props.masks[sel.pure_index], rec.gt_mask)
        fi, fu, fio = mask_iou(props.masks[sel.final_index], rec.gt_mask)
        e = enabled.astype(jnp.float32)
        pure_acc = IoUAccum(
            pure_acc.cum_i + e * pi, pure_acc.cum_u + e * pu,
            pure_acc.sum_iou + e * pio, pure_acc.count + e,
        )
        final_acc = IoUAccum(
            final_acc.cum_i + e * fi, final_acc.cum_u + e * fu,
            final_acc.sum_iou + e * fio, final_acc.count + e,
        )
        pure_idx = pure_idx.at[si].set(jnp.where(enabled, sel.pure_index, -1))
        final_idx = final_idx.at[si].set(jnp.where(enabled, sel.final_index, -1))
        pure_ious = pure_ious.at[si].set(e * pio)
        final_ious = final_ious.at[si].set(e * fio)

    return pure_acc, final_acc, pure_idx, final_idx, pure_ious, final_ious


def build_full_eval_step(
    cfg: PipelineConfig, mesh: Mesh, axis: str = "dp", mp_axis: str | None = None
):
    """jitted ``step(sam_params, clip_params, batch) -> (pure IoUAccum,
    final IoUAccum, pure_idx [B,S], final_idx [B,S], pure_iou [B,S],
    final_iou [B,S])`` with psum'd accums."""

    def per_device(sam_params, clip_params, batch: FullEvalBatch):
        def body(carry, rec):
            pa, fa = carry
            p_acc, f_acc, pidx, fidx, pious, fious = _image_full_step(
                sam_params, clip_params, rec, cfg, mp_axis
            )
            pa = IoUAccum(*(a + b for a, b in zip(pa, p_acc)))
            fa = IoUAccum(*(a + b for a, b in zip(fa, f_acc)))
            return (pa, fa), (pidx, fidx, pious, fious)

        (pa, fa), (pidx, fidx, pious, fious) = jax.lax.scan(
            body, (IoUAccum.zeros(), IoUAccum.zeros()), batch
        )
        pa = IoUAccum(*(jax.lax.psum(x, axis) for x in pa))
        fa = IoUAccum(*(jax.lax.psum(x, axis) for x in fa))
        return pa, fa, pidx, fidx, pious, fious

    from jax.experimental.shard_map import shard_map

    specs = FullEvalBatch(*(P(axis) for _ in FullEvalBatch._fields))
    step = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), specs),
        out_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
        check_rep=False,
    )
    return jax.jit(step)


def place_batch(batch: FullEvalBatch, mesh: Mesh, axis: str = "dp") -> FullEvalBatch:
    sharding = NamedSharding(mesh, P(axis))
    return FullEvalBatch(*(jax.device_put(np.asarray(x), sharding) for x in batch))
