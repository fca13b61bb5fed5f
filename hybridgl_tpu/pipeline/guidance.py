"""Augmented spatial guidance + candidate selection, fully on device.

Rebuilds, as vectorised fixed-shape XLA:
  * box-relation scoring: the reference's k1 x k2 python double loop with a
    host->device sync per element (reference: Hybridgl_main.py:185-196,
    relation_boxes utils.py:240-268) becomes one [k1, k2] tensor op;
  * the directional position prior (gen_dir_mask, utils.py:135-161)
    with traced width/height (no recompiles per image);
  * GEM heatmap normalisation + per-mask foreground/background scoring
    (the reference's per-mask .sum() loop, Hybridgl_main.py:198-228);
  * top-k selection with the reference's sticky k1/k2 clamp semantics
    (Hybridgl_main.py:178-181) supported via traced k scalars.

Flags are small integer enums so one compiled program serves every
sentence (jnp.switch over precomputed predicate tensors, not recompiles).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# enum orders are part of the host<->device contract (lang/ produces them)
RELA_FLAGS = ("none", "left", "right", "up", "down", "big", "small", "within")
DIR_FLAGS = ("none", "left", "right", "middle", "up", "down")

K1_MAX = 3  # reference k1 (Hybridgl_main.py:62)
K2_MAX = 6  # reference k2 (Hybridgl_main.py:63)

NEG = jnp.float32(-1e30)


def rela_flag_id(name: str) -> int:
    return RELA_FLAGS.index(name)


def dir_flag_id(name: str) -> int:
    return DIR_FLAGS.index(name)


# ---------------------------------------------------------------------------
# box relations
# ---------------------------------------------------------------------------


def relation_scores(
    boxes_i: jax.Array,  # [K1, 4] xywh
    boxes_j: jax.Array,  # [K2, 4] xywh
    scores_i: jax.Array,  # [K1]
    scores_j: jax.Array,  # [K2]
    rela_flag: jax.Array,  # scalar int (index into RELA_FLAGS)
    pair_valid: jax.Array,  # [K1, K2] bool
) -> jax.Array:
    """Vectorised ``relation_boxes`` summed over j -> [K1].

    (reference math: utils.py:240-268; driver loop Hybridgl_main.py:185-196.)
    """
    cx_i = boxes_i[:, 0] + boxes_i[:, 2] / 2
    cx_j = boxes_j[:, 0] + boxes_j[:, 2] / 2
    cy_i = boxes_i[:, 1] + boxes_i[:, 3] / 2
    cy_j = boxes_j[:, 1] + boxes_j[:, 3] / 2
    area_i = boxes_i[:, 2] * boxes_i[:, 3]
    area_j = boxes_j[:, 2] * boxes_j[:, 3]

    si_sj = scores_i[:, None] * scores_j[None, :]

    left = si_sj * (cx_i[:, None] < cx_j[None, :])
    right = si_sj * (cx_i[:, None] > cx_j[None, :])
    up = si_sj * (cy_i[:, None] < cy_j[None, :])
    down = si_sj * (cy_i[:, None] > cy_j[None, :])
    big = si_sj * (area_i[:, None] > area_j[None, :])
    small = si_sj * (area_i[:, None] < area_j[None, :])

    # 'within': clamped overlap box area over area_i (utils.py:259-264)
    x1 = jnp.maximum(boxes_i[:, None, 0], boxes_j[None, :, 0])
    x2 = jnp.maximum(
        x1,
        jnp.minimum(
            boxes_i[:, None, 0] + boxes_i[:, None, 2],
            boxes_j[None, :, 0] + boxes_j[None, :, 2],
        ),
    )
    y1 = jnp.maximum(boxes_i[:, None, 1], boxes_j[None, :, 1])
    y2 = jnp.maximum(
        y1,
        jnp.minimum(
            boxes_i[:, None, 1] + boxes_i[:, None, 3],
            boxes_j[None, :, 1] + boxes_j[None, :, 3],
        ),
    )
    within = si_sj * (x2 - x1) * (y2 - y1) / area_i[:, None]

    none = jnp.broadcast_to(scores_i[:, None], si_sj.shape)

    table = jnp.stack([none, left, right, up, down, big, small, within])
    per_pair = table[rela_flag]
    return jnp.where(pair_valid, per_pair, 0.0).sum(axis=1)


# ---------------------------------------------------------------------------
# directional position prior
# ---------------------------------------------------------------------------


def dir_mask(dir_flag: jax.Array, frame: int, hw) -> jax.Array:
    """[frame, frame] position prior over the valid (h, w) region.

    torch.linspace(a,b,n)[j] == a + (b-a) * j/(n-1); 'up'/'down' fall back
    to ones exactly like the reference (its up/down branches are commented
    out, utils.py:147-155).
    """
    w = jnp.asarray(hw[1], jnp.float32)
    j = jnp.arange(frame, dtype=jnp.float32)[None, :]
    j = jnp.broadcast_to(j, (frame, frame))

    left = 1.0 - j / jnp.maximum(w - 1.0, 1.0)
    right = j / jnp.maximum(w - 1.0, 1.0)
    m1 = jnp.floor(w / 2.0)
    m2 = w - m1
    middle = jnp.where(
        j < m1,
        j / jnp.maximum(m1 - 1.0, 1.0),
        1.0 - (j - m1) / jnp.maximum(m2 - 1.0, 1.0),
    )
    ones = jnp.ones((frame, frame), jnp.float32)
    table = jnp.stack([ones, left, right, middle, ones, ones])
    return table[dir_flag]


# ---------------------------------------------------------------------------
# GEM heatmap scoring
# ---------------------------------------------------------------------------


def normalize_heatmap(
    imgattn: jax.Array,  # [frame, frame], zero outside valid
    valid_region: jax.Array,  # [frame, frame] bool
    dir_flag: jax.Array,
) -> jax.Array:
    """min-max normalise -> directional prior -> mean-normalise
    (reference: Hybridgl_main.py:204-209), all over the valid region."""
    big_neg = jnp.where(valid_region, imgattn, jnp.inf)
    big_pos = jnp.where(valid_region, imgattn, -jnp.inf)
    lo = big_neg.min()
    hi = big_pos.max()
    x = (imgattn - lo) / (hi - lo)
    x = jnp.where(valid_region, x, 0.0)
    x = x * dir_mask(dir_flag, imgattn.shape[0], _region_hw(valid_region))
    mean = x.sum() / valid_region.sum()
    return jnp.where(valid_region, x / mean, 0.0)


def _region_hw(valid_region: jax.Array):
    h = valid_region.any(axis=1).sum()
    w = valid_region.any(axis=0).sum()
    return h, w


def gem_mask_scores(
    imgattn: jax.Array,  # [frame, frame] normalised heatmap
    masks: jax.Array,  # [P, frame, frame] bool
    valid_region: jax.Array,  # [frame, frame] bool
    black: jax.Array,  # scalar fg/bg weight (Hybridgl_main.py:211-216)
) -> jax.Array:
    """score = mean_in_mask(attn) * (2-black) - mean_out_of_mask(attn) * black
    (reference: Hybridgl_main.py:218-222) -> [P]."""
    m = (masks & valid_region[None]).astype(jnp.float32)
    inv = (~masks & valid_region[None]).astype(jnp.float32)
    flat_attn = imgattn.reshape(-1)
    m2 = m.reshape(m.shape[0], -1)
    inv2 = inv.reshape(m.shape[0], -1)
    in_sum = m2 @ flat_attn
    out_sum = inv2 @ flat_attn
    in_mean = in_sum / jnp.maximum(m2.sum(-1), 1.0)
    out_mean = out_sum / jnp.maximum(inv2.sum(-1), 1.0)
    return (2.0 - black) * in_mean - black * out_mean


# ---------------------------------------------------------------------------
# selection
# ---------------------------------------------------------------------------


class Selection(NamedTuple):
    pure_index: jax.Array  # argmax of hybrid CLIP score (scalar int32)
    final_index: jax.Array  # after spatial guidance (scalar int32)
    topk_indices: jax.Array  # [K1_MAX]
    topscores: jax.Array  # [K1_MAX] blended guidance scores


def select_candidates(
    score_clip: jax.Array,  # [P]
    score_clip_neg: jax.Array,  # [P]
    boxes_xywh: jax.Array,  # [P, 4]
    gem_scores: jax.Array,  # [P]
    proposal_valid: jax.Array,  # [P] bool
    rela_flag: jax.Array,  # scalar int
    has_other_nouns: jax.Array,  # scalar bool
    k1: jax.Array,  # traced int (sticky-clamped by the driver)
    k2: jax.Array,
    alpha: float = 0.6,
) -> Selection:
    """Per-sentence candidate selection (reference: Hybridgl_main.py:168-228)."""
    P = score_clip.shape[0]
    masked = jnp.where(proposal_valid, score_clip, NEG)
    masked_neg = jnp.where(proposal_valid, score_clip_neg, NEG)

    pure_index = jnp.argmax(masked).astype(jnp.int32)

    # softmax over valid proposals (reference softmaxes the full vector; on
    # padded buckets the -inf entries vanish identically)
    sm = jax.nn.softmax(masked)
    sm_neg = jax.nn.softmax(masked_neg)

    k1_max = min(K1_MAX, P)
    k2_max = min(K2_MAX, P)
    _, maxidxs = jax.lax.top_k(masked, k1_max)
    _, maxneg = jax.lax.top_k(masked_neg, k2_max)

    i_valid = jnp.arange(k1_max) < k1
    j1_valid = jnp.arange(k1_max) < k1  # nouns-empty branch: j over maxidxs
    j2_valid = jnp.arange(k2_max) < k2

    bi = boxes_xywh[maxidxs]
    si = sm[maxidxs]

    # branch A: no other nouns -> pairs over maxidxs with sm scores
    rel_a = relation_scores(
        bi, bi, si, si, rela_flag, i_valid[:, None] & j1_valid[None, :]
    )
    # branch B: other nouns -> pairs vs maxneg with sm_neg scores
    bj = boxes_xywh[maxneg]
    sj = sm_neg[maxneg]
    rel_b = relation_scores(
        bi, bj, si, sj, rela_flag, i_valid[:, None] & j2_valid[None, :]
    )
    topscores = jnp.where(has_other_nouns, rel_b, rel_a)

    # softmax over the k1 valid entries (reference: Hybridgl_main.py:196)
    topscores = jax.nn.softmax(jnp.where(i_valid, topscores, NEG))

    # GEM blend on the top-k1 (reference: Hybridgl_main.py:225-227)
    blended = topscores * (1.0 - alpha) + alpha * gem_scores[maxidxs]
    blended = jnp.where(i_valid, blended, NEG)
    final_index = maxidxs[jnp.argmax(blended)].astype(jnp.int32)

    return Selection(pure_index, final_index, maxidxs, blended)
