"""Torch restatement of the reference's ENTIRE per-image/per-sentence driver
loop (reference: Hybridgl_main.py:79-231) on TinyCLIP, from proposals onward:

  crop prep (cv2 blur + composites, :92-125) -> hybrid fusion (:128) ->
  text ensemble + negatives (:146-166) -> pure argmax (:168-171) ->
  softmax/topk with the sticky k1/k2 clamp (:173-183) -> relation
  double loop (:185-196) -> GEM heatmap + direction prior + per-mask
  scoring (:198-222) -> blend + final argmax (:225-228)

Used by tests/test_driver_parity.py to assert per-sentence SELECTION
IDENTITY (pure_index / final_index, not tolerance) against our pipeline's
``_score_image`` across all five fusion modes — the composition check the
per-component oracles cannot provide (compensating errors between stages).

SAM proposal generation is outside this restatement (it has its own e2e
diff, tests/test_amg_multicrop.py); proposals are shared inputs. The spaCy
outputs (noun phrase, other nouns, dir/rela flags) are likewise shared
inputs — parser parity is tests/test_lang.py's domain.
"""

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np
import torch
import torch.nn.functional as F

from test_guidance import np_relation_boxes
from torch_ref import torch_hybrid_forward
from torch_ref_gem import torch_gem_features

IMAGENET_MEAN = torch.tensor([0.485, 0.456, 0.406])
IMAGENET_STD = torch.tensor([0.229, 0.224, 0.225])
CLIP_PIXEL_MEAN = torch.tensor([0.48145466, 0.4578275, 0.40821073])
GEM_MEAN = torch.tensor([0.48145466, 0.4578275, 0.40821073])
GEM_STD = torch.tensor([0.26862954, 0.26130258, 0.27577711])


def _resize_chw(x: torch.Tensor, size: int) -> torch.Tensor:
    """T.Resize((size, size), antialias=None) on a [C, H, W] tensor ==
    plain bilinear interpolate (reference: Hybridgl_main.py:116,121)."""
    return F.interpolate(
        x[None], (size, size), mode="bilinear", align_corners=False
    )[0]


@torch.no_grad()
def torch_build_crops(image_u8: np.ndarray, masks: np.ndarray, crop: int, blur_ksize: int = 15):
    """Global/local crop prep (reference: Hybridgl_main.py:92-125).

    image_u8: [h, w, 3] uint8 (the original-resolution image; see
    docs/DESIGN.md "Pinned reference findings" — image['image'] is the
    original resolution, no 480 resize). masks: [P, h, w] bool.
    Returns (global_imgs, local_imgs) as [P, 3, crop, crop] float tensors.
    """
    import cv2

    blurred = cv2.GaussianBlur(image_u8.copy(), (blur_ksize, blur_ksize), 0)
    original = torch.from_numpy(image_u8).permute(2, 0, 1).float() / 255.0
    original = (original - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]
    pixel_mean = CLIP_PIXEL_MEAN[:, None, None]

    globals_, locals_ = [], []
    for m in masks:
        mask = m.astype(np.uint8)
        sharp = cv2.bitwise_and(image_u8, image_u8, mask=np.clip(mask, 0, 255).astype(np.uint8))
        inv = 1 - mask
        blurred_region = (blurred * inv[:, :, None]).astype(np.uint8)
        g = cv2.add(sharp, blurred_region)
        g = torch.from_numpy(g).permute(2, 0, 1).float() / 255.0  # ToTensor
        g = _resize_chw(g, crop)
        g = (g - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]
        globals_.append(g)

        mt = torch.from_numpy(mask).float()
        local = original * mt[None] + (1 - mt[None]) * pixel_mean
        locals_.append(_resize_chw(local, crop))
    return torch.stack(globals_), torch.stack(locals_)


def np_dir_mask(dirflag: str, h: int, w: int) -> torch.Tensor:
    """gen_dir_mask (reference: utils.py:135-161; up/down commented out
    upstream so they fall through to ones)."""
    if dirflag == "left":
        return torch.linspace(1, 0, w).expand(h, w)
    if dirflag == "right":
        return torch.linspace(0, 1, w).expand(h, w)
    if dirflag == "middle":
        return torch.cat(
            [torch.linspace(0, 1, w // 2), torch.linspace(1, 0, w - w // 2)]
        ).expand(h, w)
    return torch.ones(h, w)


@torch.no_grad()
def torch_gem_heatmap(model, image_u8: np.ndarray, np_feat: torch.Tensor, gem_size: int, depth: int, iters: int):
    """GEM heatmap for one noun phrase (reference: Hybridgl_main.py:200-201).

    Mirrors our pipeline's input construction (bilinear squash resize +
    uint8 round; the PIL-bicubic input deviation is documented in
    docs/DESIGN.md) then restates the heatmap math: normalized patch
    features @ normalized text feature -> grid -> bilinear to the GEM frame
    -> ANTIALIASED resize to the image size (T.Resize(..., antialias=True)).
    """
    h, w = image_u8.shape[:2]
    img = torch.from_numpy(image_u8).float()
    gem_in = F.interpolate(
        img.permute(2, 0, 1)[None], (gem_size, gem_size), mode="bilinear", align_corners=False
    )[0]
    gem_in = torch.round(gem_in).to(torch.uint8).float() / 255.0
    gem_in = (gem_in - GEM_MEAN[:, None, None]) / GEM_STD[:, None, None]
    pf, _ = torch_gem_features(model, gem_in[None], depth, iters)
    pf = pf[0] / pf.norm(dim=-1, keepdim=True).clamp_min(1e-6)
    tn = np_feat / np_feat.norm().clamp_min(1e-6)
    G = gem_size // model.cfg.patch_size
    rel = (pf @ tn).reshape(G, G)
    heat = F.interpolate(rel[None, None], (gem_size, gem_size), mode="bilinear", align_corners=False)
    heat = F.interpolate(heat, (h, w), mode="bilinear", align_corners=False, antialias=True)
    return heat[0, 0]


@dataclass
class DriverState:
    """The reference's driver-scope mutable k1/k2 (Hybridgl_main.py:61-63,
    178-181: once clamped they stay clamped for the rest of the run)."""

    k1: int = 3
    k2: int = 6


@dataclass
class ParsedFields:
    """spaCy-derived inputs, shared verbatim with our pipeline."""

    sentence: str
    noun_phrase: str
    other_noun_phrases: List[str]
    nouns: List[str]
    dir_flag: str = "none"
    rela_flag: str = "none"


@torch.no_grad()
def torch_driver_image(
    model,
    tokenize,  # callable(text) -> [1, L] int tensor (the real BPE path)
    image_u8: np.ndarray,  # [h, w, 3] uint8
    masks: np.ndarray,  # [P, h, w] bool, all live
    boxes_xywh: np.ndarray,  # [P, 4] (AMG bbox convention)
    parsed: Sequence[ParsedFields],
    state: DriverState,
    fusion_mode: str,
    masking_block: int,
    gem_depth: int,
    gem_iters: int,
    gem_size: int,
    crop: int,
    r: float = 0.5,
    alpha: float = 0.6,
):
    """One image of the reference driver loop; returns
    [(pure_index, final_index)] per sentence and mutates ``state``."""
    globals_, locals_ = torch_build_crops(image_u8, masks, crop)
    masks_t = torch.from_numpy(masks)
    hybrid = torch_hybrid_forward(
        model, locals_, globals_, masks_t.float(), fusion_mode, masking_block=masking_block
    )

    out = []
    for pf in parsed:
        sent_f = model.encode_text(tokenize(pf.sentence))
        np_f = model.encode_text(tokenize(pf.noun_phrase))
        text_ensemble = r * sent_f + (1 - r) * np_f

        def calc(tf):  # backbone.py:74-87
            im = hybrid / hybrid.norm(dim=1, keepdim=True)
            tx = tf / tf.norm(dim=1, keepdim=True)
            return model.logit_scale.exp() * im @ tx.t()

        score_clip = calc(text_ensemble)  # [P, 1]

        other_f = torch.zeros(1, model.cfg.embed_dim)
        cnt = 0
        for noun in pf.other_noun_phrases:
            other_f = other_f + model.encode_text(tokenize("a photo of " + noun))
            cnt += 1
        if cnt:
            other_f = other_f / cnt
        score_neg = calc(other_f)  # NaN when cnt == 0 (unused branch then)

        pure = int(torch.argmax(score_clip))
        raw_sorted = torch.sort(score_clip.view(-1), descending=True).values

        score_clip = torch.softmax(score_clip, dim=0)
        score_neg = torch.softmax(score_neg, dim=0)

        if state.k1 > len(score_clip):
            state.k1 = len(score_clip)
        if state.k2 > len(score_neg):
            state.k2 = len(score_neg)
        k1, k2 = state.k1, state.k2
        _, maxidxs = torch.topk(score_clip.view(-1), k=k1)
        _, maxneg = torch.topk(score_neg.view(-1), k=k2)

        top = np.zeros(k1)
        if len(pf.nouns) == 0:
            for i in range(k1):
                for j in maxidxs:
                    top[i] += np_relation_boxes(
                        boxes_xywh[maxidxs[i]], boxes_xywh[j],
                        float(score_clip[maxidxs[i]][0]), float(score_clip[j][0]),
                        pf.rela_flag,
                    )
        else:
            for i in range(k1):
                for j in maxneg:
                    top[i] += np_relation_boxes(
                        boxes_xywh[maxidxs[i]], boxes_xywh[j],
                        float(score_clip[maxidxs[i]][0]), float(score_neg[j][0]),
                        pf.rela_flag,
                    )
        top = torch.softmax(torch.tensor(top, dtype=torch.float32), dim=0)

        heat = torch_gem_heatmap(model, image_u8, np_f[0], gem_size, gem_depth, gem_iters)
        heat = (heat - heat.min()) / (heat.max() - heat.min())
        heat = heat * np_dir_mask(pf.dir_flag, heat.shape[0], heat.shape[1])
        heat = heat / heat.mean()

        black = {"big": 1.95, "small": 1.5}.get(pf.rela_flag, 1.8)
        gem_scores = []
        for m in masks_t:
            m = m.to(torch.uint8)
            s = (heat * (2 - black) * m / m.sum()).sum() - (
                heat * black * (1 - m) / (1 - m).sum()
            ).sum()
            gem_scores.append(s)
        gem_scores = torch.stack(gem_scores)

        top = top.clone()
        for i in range(k1):
            top[i] = top[i] * (1 - alpha) + alpha * gem_scores[maxidxs[i]]
        final = int(maxidxs[torch.argmax(top)])

        # decision margins: how far each argmax/topk decision is from a tie.
        # Cross-framework float noise (~1e-6) can legitimately flip a
        # decision whose margin is below it; the parity test treats those
        # as degenerate rather than as semantic divergence.
        pure_margin = float(raw_sorted[0] - raw_sorted[1]) if len(raw_sorted) > 1 else 1.0
        sm = torch.sort(score_clip.view(-1), descending=True).values
        topk_margin = float(sm[k1 - 1] - sm[k1]) if len(sm) > k1 else 1.0
        top_sorted = torch.sort(top, descending=True).values
        final_margin = float(top_sorted[0] - top_sorted[1]) if len(top_sorted) > 1 else 1.0
        out.append(
            (pure, final, dict(pure_margin=pure_margin, topk_margin=topk_margin, final_margin=final_margin))
        )
    return out
