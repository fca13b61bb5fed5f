import json

import numpy as np
import pytest
from PIL import Image

from hybridgl_tpu.data.datasets import PhraseCutDataset


@pytest.fixture(scope="module")
def pc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("phrasecut")
    (root / "images" / "VG_100K").mkdir(parents=True)
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (40, 60, 3), np.uint8)).save(
        root / "images" / "VG_100K" / "123.jpg"
    )
    tasks = [
        {
            "task_id": "123__1",
            "image_id": 123,
            "phrase": "red box on the left",
            "Polygons": [[[[5, 5], [25, 5], [25, 25], [5, 25]]]],
        },
        {
            "task_id": "123__2",
            "image_id": 123,
            "phrase": "blue thing",
            "Polygons": [
                [[[30, 10], [50, 10], [50, 30], [30, 30]]],
                [[[2, 30], [10, 30], [10, 38], [2, 38]]],
            ],
        },
    ]
    with open(root / "refer_test.json", "w") as f:
        json.dump(tasks, f)
    return str(root)


def test_phrasecut_dataset(pc_root):
    ds = PhraseCutDataset(pc_root, split="test", sam_img_size=64, canonical=64)
    assert len(ds) == 2
    s0 = ds[0]
    assert s0.sentences == ["red box on the left"]
    assert s0.h == 40 and s0.w == 60
    assert s0.gt_mask[10, 10] and not s0.gt_mask[35, 55]
    s1 = ds[1]
    # union of two polygon regions
    assert s1.gt_mask[20, 40] and s1.gt_mask[34, 6]
    assert not s1.gt_mask[5, 5]


def test_phrasecut_missing_image_raises(pc_root):
    ds = PhraseCutDataset(pc_root, split="test", sam_img_size=64, canonical=64)
    ds.tasks.append({"image_id": 999, "phrase": "x", "Polygons": []})
    with pytest.raises(FileNotFoundError):
        ds[2]


def test_phrasecut_seen_unseen_filtering(pc_root):
    """seen/unseen COCO-class task filtering
    (reference: data/dataset_phrasecut.py:65-68)."""
    tasks = [
        {"task_id": "1__1", "image_id": 123, "phrase": "the dog",
         "phrase_structure": {"name": "dog"}, "Polygons": [[[[1, 1], [5, 1], [5, 5]]]]},
        {"task_id": "1__2", "image_id": 123, "phrase": "a tree",
         "phrase_structure": {"name": "tree"}, "Polygons": [[[[1, 1], [5, 1], [5, 5]]]]},
        {"task_id": "1__3", "image_id": 123, "phrase": "mystery",
         "Polygons": [[[[1, 1], [5, 1], [5, 5]]]]},  # no category info
    ]
    import os
    with open(os.path.join(pc_root, "refer_modes.json"), "w") as f:
        json.dump(tasks, f)

    all_ds = PhraseCutDataset(pc_root, split="modes", sam_img_size=64, canonical=64)
    assert [t["phrase"] for t in all_ds.tasks] == ["the dog", "a tree", "mystery"]

    seen = PhraseCutDataset(pc_root, split="modes", sam_img_size=64, canonical=64, seen_mode=True)
    assert [t["phrase"] for t in seen.tasks] == ["the dog"]

    unseen = PhraseCutDataset(pc_root, split="modes", sam_img_size=64, canonical=64, unseen_mode=True)
    assert [t["phrase"] for t in unseen.tasks] == ["a tree", "mystery"]

    # both set: unseen wins (the reference's if/elif order)
    both = PhraseCutDataset(pc_root, split="modes", sam_img_size=64, canonical=64, seen_mode=True, unseen_mode=True)
    assert [t["phrase"] for t in both.tasks] == ["a tree", "mystery"]
