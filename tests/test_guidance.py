import numpy as np
import pytest

import jax.numpy as jnp

from hybridgl_tpu.pipeline.guidance import (
    RELA_FLAGS,
    dir_mask,
    gem_mask_scores,
    normalize_heatmap,
    rela_flag_id,
    relation_scores,
    select_candidates,
)


def np_relation_boxes(boxi, boxj, si, sj, rela):
    """Numpy restatement of the reference relation predicate (utils.py:240-268)."""
    if rela == "none":
        return si
    if rela == "left":
        return si * sj * ((boxi[0] + boxi[2] / 2) < (boxj[0] + boxj[2] / 2))
    if rela == "right":
        return si * sj * ((boxi[0] + boxi[2] / 2) > (boxj[0] + boxj[2] / 2))
    if rela == "up":
        return si * sj * ((boxi[1] + boxi[3] / 2) < (boxj[1] + boxj[3] / 2))
    if rela == "down":
        return si * sj * ((boxi[1] + boxi[3] / 2) > (boxj[1] + boxj[3] / 2))
    if rela == "big":
        return si * sj * ((boxi[2] * boxi[3]) > (boxj[2] * boxj[3]))
    if rela == "small":
        return si * sj * ((boxi[2] * boxi[3]) < (boxj[2] * boxj[3]))
    if rela == "within":
        x1 = max(boxi[0], boxj[0])
        x2 = max(x1, min(boxi[0] + boxi[2], boxj[0] + boxj[2]))
        y1 = max(boxi[1], boxj[1])
        y2 = max(y1, min(boxi[1] + boxi[3], boxj[1] + boxj[3]))
        return si * sj * (x2 - x1) * (y2 - y1) / (boxi[2] * boxi[3])
    return si


@pytest.mark.parametrize("rela", RELA_FLAGS)
def test_relation_scores_match_reference(rng, rela):
    k1, k2 = 3, 6
    bi = rng.random((k1, 4)).astype(np.float32) * 50 + 1
    bj = rng.random((k2, 4)).astype(np.float32) * 50 + 1
    si = rng.random(k1).astype(np.float32)
    sj = rng.random(k2).astype(np.float32)
    ours = np.asarray(
        relation_scores(
            jnp.asarray(bi),
            jnp.asarray(bj),
            jnp.asarray(si),
            jnp.asarray(sj),
            jnp.asarray(rela_flag_id(rela)),
            jnp.ones((k1, k2), bool),
        )
    )
    ref = np.array(
        [
            sum(np_relation_boxes(bi[i], bj[j], si[i], sj[j], rela) for j in range(k2))
            for i in range(k1)
        ]
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_dir_mask_matches_linspace():
    import torch

    h, w, frame = 30, 40, 64
    for flag, name in [(1, "left"), (2, "right"), (3, "middle"), (0, "none")]:
        ours = np.asarray(dir_mask(jnp.asarray(flag), frame, (h, w)))[:h, :w]
        if name == "left":
            ref = torch.linspace(1, 0, w).expand(h, w).numpy()
        elif name == "right":
            ref = torch.linspace(0, 1, w).expand(h, w).numpy()
        elif name == "middle":
            ref = (
                torch.cat([torch.linspace(0, 1, w // 2), torch.linspace(1, 0, w - w // 2)])
                .expand(h, w)
                .numpy()
            )
        else:
            ref = np.ones((h, w), np.float32)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_heatmap_normalisation_and_gem_scores(rng):
    frame, h, w = 32, 20, 28
    attn = np.zeros((frame, frame), np.float32)
    attn[:h, :w] = rng.random((h, w)).astype(np.float32) * 3 + 0.5
    valid = np.zeros((frame, frame), bool)
    valid[:h, :w] = True
    out = np.asarray(normalize_heatmap(jnp.asarray(attn), jnp.asarray(valid), jnp.asarray(0)))
    # reference chain on the valid crop (Hybridgl_main.py:204-209)
    a = attn[:h, :w]
    a = (a - a.min()) / (a.max() - a.min())
    a = a / a.mean()
    np.testing.assert_allclose(out[:h, :w], a, atol=1e-5, rtol=1e-5)
    assert np.all(out[h:, :] == 0)

    masks = np.zeros((2, frame, frame), bool)
    masks[0, 2:10, 3:14] = True
    masks[1, :h, :w] = rng.random((h, w)) > 0.5
    black = 1.8
    scores = np.asarray(
        gem_mask_scores(jnp.asarray(out), jnp.asarray(masks), jnp.asarray(valid), jnp.asarray(black))
    )
    for i in range(2):
        m = masks[i, :h, :w]
        ref = (a * (2 - black) * m / m.sum()).sum() - (a * black * (1 - m) / (1 - m).sum()).sum()
        np.testing.assert_allclose(scores[i], ref, atol=1e-5, rtol=1e-4)


def np_select_oracle(score_clip, score_neg, boxes_xywh, gem, rela, has_other, k1, k2, alpha):
    """Numpy restatement of the selection path (Hybridgl_main.py:168-228)."""

    def softmax(x):
        e = np.exp(x - x.max())
        return e / e.sum()

    pure = int(np.argmax(score_clip))
    sm, smn = softmax(score_clip), softmax(score_neg)
    maxidxs = np.argsort(-sm, kind="stable")[:k1]
    maxneg = np.argsort(-smn, kind="stable")[:k2]
    top = np.zeros(k1)
    for i in range(k1):
        js, sj = (maxidxs, sm) if not has_other else (maxneg, smn)
        for j in js:
            top[i] += np_relation_boxes(
                boxes_xywh[maxidxs[i]], boxes_xywh[j], sm[maxidxs[i]], sj[j], rela
            )
    top = softmax(top)
    for i in range(k1):
        top[i] = top[i] * (1 - alpha) + alpha * gem[maxidxs[i]]
    return pure, int(maxidxs[np.argmax(top)])


@pytest.mark.parametrize("rela", ["none", "left", "big", "within"])
@pytest.mark.parametrize("has_other", [False, True])
def test_select_candidates_matches_reference(rng, rela, has_other):
    P = 12
    score = rng.standard_normal(P).astype(np.float32)
    score_neg = rng.standard_normal(P).astype(np.float32)
    boxes = rng.random((P, 4)).astype(np.float32) * 60 + 1
    gem = rng.standard_normal(P).astype(np.float32)
    sel = select_candidates(
        jnp.asarray(score),
        jnp.asarray(score_neg),
        jnp.asarray(boxes),
        jnp.asarray(gem),
        jnp.ones(P, bool),
        jnp.asarray(rela_flag_id(rela)),
        jnp.asarray(has_other),
        jnp.asarray(3),
        jnp.asarray(6),
        alpha=0.6,
    )
    pure, final = np_select_oracle(
        score, score_neg, boxes, gem, rela, has_other, 3, 6, 0.6
    )
    assert int(sel.pure_index) == pure
    assert int(sel.final_index) == final


def test_select_with_few_valid_proposals(rng):
    # k1/k2 clamped to the valid count (sticky-clamp semantics live host-side)
    P = 8
    score = rng.standard_normal(P).astype(np.float32)
    score_neg = rng.standard_normal(P).astype(np.float32)
    boxes = rng.random((P, 4)).astype(np.float32) * 60 + 1
    gem = rng.standard_normal(P).astype(np.float32)
    valid = np.zeros(P, bool)
    valid[:2] = True  # only 2 proposals
    sel = select_candidates(
        jnp.asarray(score),
        jnp.asarray(score_neg),
        jnp.asarray(boxes),
        jnp.asarray(gem),
        jnp.asarray(valid),
        jnp.asarray(0),
        jnp.asarray(False),
        jnp.asarray(2),
        jnp.asarray(2),
    )
    pure, final = np_select_oracle(
        score[:2], score_neg[:2], boxes[:2], gem[:2], "none", False, 2, 2, 0.6
    )
    assert int(sel.pure_index) == pure
    assert int(sel.final_index) == final
