"""Dataset adapters: REFER / PhraseCut -> ImageSample host bundles.

Replaces the reference's torch Datasets
(reference: data/dataset_refer_bert.py:18-161, data/dataset_phrasecut.py:9-122)
with framework-free iterators that produce the fixed-frame numpy bundles
the device pipeline consumes (pipeline/runner.ImageSample). Use
data/prefetch.py to overlap host decode with device compute.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional

import numpy as np
from PIL import Image

from ..pipeline.runner import ImageSample
from . import rle as rle_codec
from .refer import REFER


def longest_side_resize(img: np.ndarray, target: int) -> np.ndarray:
    """PIL bilinear longest-side resize (matches the reference SAM
    transform, utils/transforms.py:26-31 + get_preprocess_shape)."""
    h, w = img.shape[:2]
    scale = target / max(h, w)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    pil = Image.fromarray(img)
    return np.asarray(pil.resize((nw, nh), Image.BILINEAR))


def to_padded_frame(img: np.ndarray, frame: int) -> np.ndarray:
    out = np.zeros((frame, frame) + img.shape[2:], img.dtype)
    out[: img.shape[0], : img.shape[1]] = img
    return out


def build_image_sample(
    image_rgb: np.ndarray,  # [h, w, 3] uint8
    sentences: List[str],
    gt_mask: Optional[np.ndarray],  # [h, w] bool/uint8 or None
    sam_img_size: int,
    canonical: int,
) -> ImageSample:
    h, w = image_rgb.shape[:2]
    if max(h, w) > canonical:
        # clamp oversized images (e.g. PhraseCut/VG) into the canonical frame
        scale = canonical / max(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        image_rgb = np.asarray(
            Image.fromarray(image_rgb).resize((nw, nh), Image.BILINEAR)
        )
        if gt_mask is not None:
            gt_mask = np.asarray(
                Image.fromarray(gt_mask.astype(np.uint8) * 255).resize(
                    (nw, nh), Image.BILINEAR
                )
            ) > 127
        h, w = nh, nw
    resized = longest_side_resize(image_rgb, sam_img_size)
    rh, rw = resized.shape[:2]
    return ImageSample(
        image_1024=to_padded_frame(resized, sam_img_size),
        rh=rh,
        rw=rw,
        image_canonical=to_padded_frame(image_rgb, canonical),
        h=h,
        w=w,
        gt_mask=(
            to_padded_frame(gt_mask.astype(bool), canonical)
            if gt_mask is not None
            else None
        ),
        sentences=sentences,
    )


class ReferDataset:
    """RefCOCO/+/g eval dataset: one ImageSample per ref (all sentences).

    (reference: data/dataset_refer_bert.py — minus the torch plumbing; text
    tokenisation happens lazily in the pipeline rather than at init.)

    Optional branches mirroring the reference's constructor surface:

    * ``prompt_ensemble`` (reference: data/dataset_refer_bert.py:68-70):
      each sentence expands to a set of prompt-template variants via
      :meth:`ensemble_sentences`. NOTE: the reference's branch is broken as
      committed — it formats ``ReferDataset.templates``, which is never
      defined anywhere in the repo (AttributeError if enabled) — so the
      template set here is the standard CLIP prompt-engineering subset the
      flag plainly intended.
    * ``coco_instance_gt`` (reference: data/dataset_refer_bert.py:80-91,
      125-147): per-image COCO instance ground truth (masks, boxes,
      category names) via :meth:`instance_annotations`, decoded from the
      same instances.json the REFER annotations come from.
    """

    templates = (
        "a photo of a {}.",
        "a photo of the {}.",
        "a bad photo of a {}.",
        "a photo of one {}.",
        "a bright photo of the {}.",
        "a cropped photo of a {}.",
        "a close-up photo of the {}.",
    )

    def __init__(
        self,
        refer_data_root: str,
        dataset: str = "refcoco",
        splitBy: str = "unc",
        split: str = "val",
        sam_img_size: int = 1024,
        canonical: int = 640,
        prompt_ensemble: bool = False,
        coco_instance_gt: bool = False,
    ):
        self.refer = REFER(refer_data_root, dataset, splitBy)
        self.ref_ids = self.refer.getRefIds(split=split)
        self.sam_img_size = sam_img_size
        self.canonical = canonical
        self.prompt_ensemble = prompt_ensemble
        self.coco_instance_gt = coco_instance_gt

    def __len__(self) -> int:
        return len(self.ref_ids)

    def sentences(self, index: int) -> List[str]:
        ref = self.refer.Refs[self.ref_ids[index]]
        return [s["raw"] for s in ref["sentences"]]

    def ensemble_sentences(self, index: int) -> List[List[str]]:
        """Per-sentence prompt-template expansions (the prompt_ensemble
        branch; reference: data/dataset_refer_bert.py:68-70 intent)."""
        return [
            [t.format(s) for t in self.templates] for s in self.sentences(index)
        ]

    def instance_annotations(self, index: int) -> Dict:
        """All COCO instance annotations of this ref's image
        (reference: data/dataset_refer_bert.py:125-147): decoded masks at
        image resolution, xywh boxes, category names."""
        ref = self.refer.Refs[self.ref_ids[index]]
        img_info = self.refer.Imgs[ref["image_id"]]
        h, w = img_info["height"], img_info["width"]
        masks, boxes, cat_names = [], [], []
        for ann in self.refer.imgToAnns.get(ref["image_id"], []):
            seg = ann["segmentation"]
            if isinstance(seg, list) and seg and isinstance(seg[0], list):
                m = rle_codec.polygon_to_mask(seg, h, w)
            else:
                r = seg if isinstance(seg, dict) else {"size": [h, w], "counts": seg}
                m = rle_codec.decode(r)
            masks.append(m.astype(bool))
            boxes.append(np.asarray(ann["bbox"], np.float32))
            cat_names.append(self.refer.Cats[ann["category_id"]])
        return {"masks": masks, "boxes": boxes, "cat_names": cat_names}

    def __getitem__(self, index: int) -> ImageSample:
        ref_id = self.ref_ids[index]
        ref = self.refer.Refs[ref_id]
        img_info = self.refer.Imgs[ref["image_id"]]
        path = os.path.join(self.refer.IMAGE_DIR, img_info["file_name"])
        image = np.asarray(Image.open(path).convert("RGB"))
        gt = self.refer.getMask(ref)["mask"] > 0
        return build_image_sample(
            image,
            self.sentences(index),
            gt,
            self.sam_img_size,
            self.canonical,
        )

    def __iter__(self) -> Iterator[ImageSample]:
        for i in range(len(self)):
            yield self[i]


# the 80 COCO class names the reference uses to split PhraseCut tasks into
# seen (COCO) vs unseen categories (reference: data/dataset_phrasecut.py:14-27)
COCO_CLASSES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus",
    "train", "truck", "boat", "traffic light", "fire hydrant",
    "stop sign", "parking meter", "bench", "bird", "cat", "dog",
    "horse", "sheep", "cow", "elephant", "bear", "zebra", "giraffe",
    "backpack", "umbrella", "handbag", "tie", "suitcase", "frisbee",
    "skis", "snowboard", "sports ball", "kite", "baseball bat",
    "baseball glove", "skateboard", "surfboard", "tennis racket",
    "bottle", "wine glass", "cup", "fork", "knife", "spoon", "bowl",
    "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "couch",
    "potted plant", "bed", "dining table", "toilet", "tv", "laptop",
    "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock",
    "vase", "scissors", "teddy bear", "hair drier", "toothbrush",
)


def _task_category(task: Dict) -> Optional[str]:
    """The task's instance category name (what the reference reads from the
    loader's ``img_ins_cats``; in the release files it is the phrase
    structure's name)."""
    if "category_name" in task:
        return task["category_name"]
    ps = task.get("phrase_structure")
    if isinstance(ps, dict):
        return ps.get("name")
    return None


class PhraseCutDataset:
    """PhraseCut eval dataset: one ImageSample per (image, phrase) pair.

    Loads the PhraseCut release files directly
    (refer_<split>.json + VG images; reference consumed them through the
    external PhraseCutDataset repo, data/dataset_phrasecut.py:5). Each task
    contributes its phrase as a single 'sentence'; GT is the union of the
    task's polygon regions (reference: data/dataset_phrasecut.py:109-122).

    ``seen_mode`` restricts eval to tasks whose category is one of the 80
    COCO classes; ``unseen_mode`` to the complement
    (reference: data/dataset_phrasecut.py:65-68 — unseen wins if both are
    set, matching the reference's if/elif order).
    """

    def __init__(
        self,
        data_root: str,
        split: str = "test",
        sam_img_size: int = 1024,
        canonical: int = 1024,
        seen_mode: bool = False,
        unseen_mode: bool = False,
    ):
        import json

        self.data_root = data_root
        with open(os.path.join(data_root, f"refer_{split}.json")) as f:
            self.tasks = json.load(f)
        if seen_mode or unseen_mode:
            kept = []
            for t in self.tasks:
                cat = _task_category(t)
                if unseen_mode and cat in COCO_CLASSES:
                    continue
                if not unseen_mode and seen_mode and cat not in COCO_CLASSES:
                    continue
                kept.append(t)
            self.tasks = kept
        self.seen_mode = seen_mode
        self.unseen_mode = unseen_mode
        self.sam_img_size = sam_img_size
        self.canonical = canonical

    def __len__(self) -> int:
        return len(self.tasks)

    def _image_path(self, image_id: int) -> str:
        for sub in ("images/VG_100K", "images/VG_100K_2", "images"):
            p = os.path.join(self.data_root, sub, f"{image_id}.jpg")
            if os.path.exists(p):
                return p
        raise FileNotFoundError(f"VG image {image_id} under {self.data_root}")

    def __getitem__(self, index: int) -> ImageSample:
        task = self.tasks[index]
        image = np.asarray(
            Image.open(self._image_path(task["image_id"])).convert("RGB")
        )
        h, w = image.shape[:2]
        gt = np.zeros((h, w), bool)
        for polygons in task["Polygons"]:
            for poly in polygons:
                flat = [c for pt in poly for c in pt]
                gt |= rle_codec.polygon_to_mask([flat], h, w)
        return build_image_sample(
            image, [task["phrase"]], gt, self.sam_img_size, self.canonical
        )

    def __iter__(self) -> Iterator[ImageSample]:
        for i in range(len(self)):
            yield self[i]
