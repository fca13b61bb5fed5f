"""Full-driver selection-parity battery.

Restates the reference's entire per-image/per-sentence loop
(reference: Hybridgl_main.py:79-231) in torch (tests/torch_ref_driver.py)
and asserts per-sentence SELECTION IDENTITY — pure_index and final_index,
not tolerances — against our pipeline's ``_score_image`` over a matrix of
synthetic scenes covering:

  * all six fusion modes (crop/token_masking/attn_masking/L2G/G2L/G2L&L2G)
  * every dir flag and rela flag (incl. 'right', reachable here because the
    flags are shared inputs; the parser-level right-bug is tests/test_lang.py)
  * other-noun and no-other-noun branches
  * sticky k1/k2 clamp transitions across images (Hybridgl_main.py:178-181)
  * images smaller than the GEM frame (antialiased heatmap downsample)
  * a zero-proposal image (ours records a miss; the reference would crash)

Both sides share: converted random weights, REAL BPE tokens (the canonical
vocab, resolved at runtime), proposals, and parsed-expression fields. What
is under test is the COMPOSITION: crop prep -> fusion -> text ensemble ->
scoring -> softmax/topk -> relation loop -> GEM heatmap/dir prior ->
blend -> argmax. Compensating errors between stages are exactly what the
per-component oracles cannot catch.
"""

import dataclasses
import os
import zlib

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from hybridgl_tpu.core.config import AmgConfig, GemConfig, PipelineConfig, clip_preset
from hybridgl_tpu.core.convert import convert_clip
from hybridgl_tpu.core.params import init_sam
from hybridgl_tpu.eval.parity import ParityLog, SelectionRecord, compare
from hybridgl_tpu.lang.base import ParsedExpression
from hybridgl_tpu.models.clip import tokenizer as tok
from hybridgl_tpu.models.sam.amg import Proposals
from hybridgl_tpu.pipeline.runner import HybridGLPipeline, ImageSample, materialize_results

from torch_ref import TinyCLIP
from torch_ref_driver import DriverState, ParsedFields, torch_driver_image
from torch_ref_sam import tiny_sam_config

pytest.importorskip("cv2")

C = 64  # canonical frame
TIE_EPS = 5e-4  # decision margins below this are float-noise ties
P = 16  # proposal slots
GEM_SIZE = 32
GEM_DEPTH = 2


def battery_clip_config():
    """Tiny CLIP but with the REAL BPE vocab size and 77-token context so
    canonical tokenization drives both sides."""
    return dataclasses.replace(
        clip_preset("test-tiny"), vocab_size=49408, context_length=77
    )


@pytest.fixture(scope="module")
def shared():
    try:
        tokenizer = tok.default_tokenizer()
    except FileNotFoundError:
        pytest.skip("BPE vocab not resolvable in this environment")
    cfg = battery_clip_config()
    torch.manual_seed(3)
    model = TinyCLIP(cfg).eval()
    params = convert_clip(model.openai_state_dict(), cfg)
    return cfg, model, params, tokenizer


class ScriptedParser:
    """Deterministic parse table: spaCy outputs are shared battery inputs."""

    def __init__(self, table):
        self.table = table

    def parse(self, sentence: str) -> ParsedExpression:
        return self.table[sentence]


# --------------------------------------------------------------------------
# scene battery
# --------------------------------------------------------------------------

SIZES = [(48, 64), (64, 48), (40, 40), (24, 56), (64, 64), (20, 28)]
COUNTS = [5, 3, 8, 2, 6, 4]  # <= 8 keeps one jit bucket per mode
DIRS = ["none", "left", "right", "middle", "up", "down"]
RELAS = ["none", "left", "right", "up", "down", "big", "small", "within"]
NOUNS = ["cat", "table", "person", "bottle"]


def gen_masks(rng, n, h, w):
    masks = np.zeros((n, h, w), bool)
    for i in range(n):
        while True:
            y0 = int(rng.integers(0, h - 4))
            x0 = int(rng.integers(0, w - 4))
            y1 = int(rng.integers(y0 + 3, min(y0 + 3 + h // 2, h)))
            x1 = int(rng.integers(x0 + 3, min(x0 + 3 + w // 2, w)))
            m = np.zeros((h, w), bool)
            m[y0:y1, x0:x1] = True
            if i % 3 == 2:  # some non-rectangular masks
                yy, xx = np.ogrid[:h, :w]
                cy, cx = (y0 + y1) / 2, (x0 + x1) / 2
                m &= ((yy - cy) / max(y1 - y0, 2)) ** 2 + (
                    (xx - cx) / max(x1 - x0, 2)
                ) ** 2 < 0.5
            if m.any() and not m.all():
                masks[i] = m
                break
    return masks


def make_scene(rng, idx):
    h, w = SIZES[idx % len(SIZES)]
    n = COUNTS[idx % len(COUNTS)]
    image = rng.integers(0, 255, (h, w, 3), np.uint8)
    masks = gen_masks(rng, n, h, w)

    sentences = []
    for s in range(2):
        k = idx * 2 + s
        dir_flag = DIRS[k % len(DIRS)]
        rela = RELAS[k % len(RELAS)]
        has_other = k % 3 != 0
        others = [NOUNS[(k + t) % len(NOUNS)] for t in range(1 + k % 2)] if has_other else []
        sent = f"scene {idx} the {NOUNS[k % len(NOUNS)]} sample {s} {dir_flag} {rela}"
        sentences.append(
            dict(
                sentence=sent,
                noun_phrase=f"the {NOUNS[k % len(NOUNS)]}",
                others=[f"{o} thing" for o in others],
                nouns=list(others),
                dir_flag=dir_flag,
                rela_flag=rela,
            )
        )
    return dict(h=h, w=w, n=n, image=image, masks=masks, sentences=sentences)


def to_props(scene):
    h, w, n = scene["h"], scene["w"], scene["n"]
    masksC = np.zeros((P, C, C), bool)
    masksC[:n, :h, :w] = scene["masks"]
    boxes = np.zeros((P, 4), np.float32)
    for i in range(n):
        ys, xs = np.nonzero(scene["masks"][i])
        boxes[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
    valid = np.zeros(P, bool)
    valid[:n] = True
    return Proposals(
        masks=jnp.asarray(masksC),
        boxes_xyxy=jnp.asarray(boxes),
        iou_preds=jnp.asarray(valid, jnp.float32),
        stability=jnp.asarray(valid, jnp.float32),
        points=jnp.zeros((P, 2), jnp.float32),
        areas=jnp.asarray(masksC.sum((-2, -1)), jnp.float32),
        valid=jnp.asarray(valid),
        num=jnp.asarray(n, jnp.int32),
    )


def boxes_xywh_np(scene):
    n = scene["n"]
    out = np.zeros((n, 4), np.float32)
    for i in range(n):
        ys, xs = np.nonzero(scene["masks"][i])
        out[i] = [xs.min(), ys.min(), xs.max() - xs.min(), ys.max() - ys.min()]
    return out


def build_pipeline(clip_cfg, params, parser, tokenizer, fusion_mode):
    sam_cfg = tiny_sam_config()
    cfg = PipelineConfig(
        clip_config=clip_cfg,
        sam_config=sam_cfg,
        fusion_mode=fusion_mode,
        canonical_size=C,
        crop_size=clip_cfg.image_size,
        amg=AmgConfig(
            points_per_side=4,
            points_per_batch=8,
            pred_iou_thresh=0.0,
            stability_score_thresh=0.0,
            min_mask_region_area=0,
            max_proposals=P,
        ),
        gem=GemConfig(img_size=GEM_SIZE, depth=GEM_DEPTH, ss_attn_iters=1),
    )
    cfg = cfg.replace(
        guidance=cfg.guidance.__class__(masking_block=clip_cfg.vision_layers - 2)
    )
    sam_params = init_sam(jax.random.PRNGKey(0), sam_cfg)
    return HybridGLPipeline(
        cfg, sam_params, {**params}, parser=parser, tokenizer=tokenizer
    )


def run_battery(shared, fusion_mode, n_scenes, with_zero_proposal=True):
    clip_cfg, model, params, tokenizer = shared
    rng = np.random.default_rng(zlib.crc32(fusion_mode.encode()))
    scenes = [make_scene(rng, i) for i in range(n_scenes)]

    table = {}
    for sc in scenes:
        for sp in sc["sentences"]:
            table[sp["sentence"]] = ParsedExpression(
                sentence=sp["sentence"],
                noun_phrase=sp["noun_phrase"],
                head_noun=sp["noun_phrase"].split()[-1],
                other_noun_phrases=sp["others"],
                nouns=sp["nouns"],
                dir_flag=sp["dir_flag"],
                rela_flag=sp["rela_flag"],
            )
    pipe = build_pipeline(clip_cfg, params, ScriptedParser(table), tokenizer, fusion_mode)
    mb = clip_cfg.vision_layers - 2

    def tokenize1(text):
        return torch.from_numpy(
            np.asarray(
                tok.tokenize(text, tokenizer=tokenizer, context_length=77, truncate=True),
                np.int64,
            )
        )

    ours_log, ref_log = ParityLog(meta={"mode": fusion_mode}), ParityLog(meta={"mode": fusion_mode})
    ties = 0
    state = pipe.init_state()
    tstate = DriverState(k1=3, k2=6)

    for si, sc in enumerate(scenes):
        h, w = sc["h"], sc["w"]
        imgc = np.zeros((C, C, 3), np.uint8)
        imgc[:h, :w] = sc["image"]
        gt = np.zeros((C, C), bool)
        gt[: h // 2, : w // 2] = True
        sample = ImageSample(
            image_1024=np.zeros((pipe.cfg.sam.img_size,) * 2 + (3,), np.uint8),
            rh=pipe.cfg.sam.img_size,
            rw=pipe.cfg.sam.img_size,
            image_canonical=imgc,
            h=h,
            w=w,
            gt_mask=gt,
            sentences=[sp["sentence"] for sp in sc["sentences"]],
        )
        results = materialize_results(
            pipe._score_image(sample, to_props(sc), state)
        )
        parsed = [
            ParsedFields(
                sentence=sp["sentence"],
                noun_phrase=sp["noun_phrase"],
                other_noun_phrases=sp["others"],
                nouns=sp["nouns"],
                dir_flag=sp["dir_flag"],
                rela_flag=sp["rela_flag"],
            )
            for sp in sc["sentences"]
        ]
        ref = torch_driver_image(
            model,
            tokenize1,
            sc["image"],
            sc["masks"],
            boxes_xywh_np(sc),
            parsed,
            tstate,
            fusion_mode,
            masking_block=mb,
            gem_depth=GEM_DEPTH,
            gem_iters=1,
            gem_size=GEM_SIZE,
            crop=clip_cfg.image_size,
        )
        assert (state.k1, state.k2) == (tstate.k1, tstate.k2), (
            f"sticky clamp diverged at scene {si}: ours {(state.k1, state.k2)} "
            f"vs reference {(tstate.k1, tstate.k2)}"
        )
        for r, (tp, tf, diag), sp in zip(results, ref, sc["sentences"]):
            ours_log.add(SelectionRecord(si, sp["sentence"], r.pure_index, r.final_index, r.pure_iou, r.final_iou))
            ref_log.add(SelectionRecord(si, sp["sentence"], tp, tf, 0.0, 0.0))
            # Identity is required except when the torch side's own decision
            # margin is below cross-framework float noise (a numeric tie:
            # ~1e-6 jax-vs-torch drift flips it; no semantic meaning).
            if r.pure_index != tp:
                assert diag["pure_margin"] < TIE_EPS, (
                    f"pure selection diverged (margin {diag['pure_margin']:.2e}): "
                    f"scene {si} '{sp['sentence']}' ours {r.pure_index} vs torch {tp}"
                )
                ties += 1
            if r.final_index != tf:
                margin = min(diag["topk_margin"], diag["final_margin"])
                assert margin < TIE_EPS, (
                    f"final selection diverged (margin {margin:.2e}): "
                    f"scene {si} '{sp['sentence']}' ours {r.final_index} vs torch {tf}"
                )
                ties += 1

    if with_zero_proposal:
        # zero proposals: the reference would crash at torch.stack([]); ours
        # must record a miss and leave the sticky clamp untouched
        k_before = (state.k1, state.k2)
        empty = Proposals(
            masks=jnp.zeros((P, C, C), bool),
            boxes_xyxy=jnp.zeros((P, 4), jnp.float32),
            iou_preds=jnp.zeros(P, jnp.float32),
            stability=jnp.zeros(P, jnp.float32),
            points=jnp.zeros((P, 2), jnp.float32),
            areas=jnp.zeros(P, jnp.float32),
            valid=jnp.zeros(P, bool),
            num=jnp.asarray(0, jnp.int32),
        )
        sample = ImageSample(
            image_1024=np.zeros((pipe.cfg.sam.img_size,) * 2 + (3,), np.uint8),
            rh=pipe.cfg.sam.img_size,
            rw=pipe.cfg.sam.img_size,
            image_canonical=np.zeros((C, C, 3), np.uint8),
            h=32,
            w=32,
            gt_mask=np.zeros((C, C), bool),
            sentences=[scenes[0]["sentences"][0]["sentence"]],
        )
        res = pipe._score_image(sample, empty, state)
        assert res[0].pure_index == -1 and res[0].final_index == -1
        assert (state.k1, state.k2) == k_before

    agg = compare(ours_log, ref_log)
    # every surviving disagreement was proven a numeric tie above; they must
    # also stay rare or the battery loses its power
    assert ties <= max(2, agg["n"] // 20), f"too many tie-flips: {ties} of {agg['n']}"
    assert agg["pure_agreement"] >= 1.0 - ties / agg["n"]
    assert agg["final_agreement"] >= 1.0 - ties / agg["n"]
    return agg


def test_driver_parity_g2l(shared):
    agg = run_battery(shared, "G2L", n_scenes=18)
    assert agg["n"] == 36


@pytest.mark.slow
@pytest.mark.parametrize(
    "mode", ["crop", "token_masking", "attn_masking", "L2G", "G2L&L2G"]
)
def test_driver_parity_other_modes(shared, mode):
    agg = run_battery(shared, mode, n_scenes=12, with_zero_proposal=False)
    assert agg["n"] == 24
