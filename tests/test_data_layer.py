import json
import os
import pickle

import numpy as np
import pytest

from hybridgl_tpu.core.params import init_clip
from hybridgl_tpu.core import checkpoint
from hybridgl_tpu.data import rle
from hybridgl_tpu.data.datasets import ReferDataset, build_image_sample
from hybridgl_tpu.data.prefetch import IndexedPrefetcher, prefetch
from hybridgl_tpu.data.refer import REFER


# ---------------------------------------------------------------- RLE codec


def test_rle_roundtrip(rng):
    m = rng.random((37, 53)) > 0.7
    r = rle.encode(m)
    np.testing.assert_array_equal(rle.decode(r), m)
    assert rle.area(r) == int(m.sum())


def test_rle_empty_and_full():
    z = np.zeros((5, 7), bool)
    np.testing.assert_array_equal(rle.decode(rle.encode(z)), z)
    o = np.ones((5, 7), bool)
    np.testing.assert_array_equal(rle.decode(rle.encode(o)), o)
    assert rle.encode(o)["counts"][0] == 0  # starts with a zero-run count


def test_compressed_counts_roundtrip(rng):
    m = rng.random((64, 48)) > 0.5
    counts = rle.encode(m)["counts"]
    s = rle.compress_counts(counts)
    assert rle.decompress_counts(s) == list(counts)
    # decode straight from the compressed form
    np.testing.assert_array_equal(
        rle.decode({"size": [64, 48], "counts": s}), m
    )


def test_rle_fortran_order():
    # column-major flattening: a single column run encodes contiguously
    m = np.zeros((4, 3), bool)
    m[:, 1] = True
    r = rle.encode(m)
    assert r["counts"] == [4, 4, 4]


def test_polygon_to_mask_square():
    # a 10x10 axis-aligned square
    poly = [2, 2, 12, 2, 12, 12, 2, 12]
    m = rle.polygon_to_mask([poly], 20, 20)
    assert m[7, 7]
    assert not m[0, 0] and not m[15, 15]
    area = m.sum()
    assert 90 <= area <= 130  # ~(10+1)^2 boundary-inclusive


def test_rle_merge_and_iou():
    a = np.zeros((8, 8), bool)
    b = np.zeros((8, 8), bool)
    a[:4] = True
    b[2:6] = True
    ra, rb = rle.encode(a), rle.encode(b)
    assert abs(rle.iou(ra, rb) - (2 / 6)) < 1e-9
    merged = rle.decode(rle.merge([ra, rb]))
    np.testing.assert_array_equal(merged, a | b)


# ---------------------------------------------------------------- REFER API


@pytest.fixture(scope="module")
def refer_root(tmp_path_factory):
    """Synthetic refcoco-shaped dataset: 2 images, 3 refs."""
    root = tmp_path_factory.mktemp("refer_data")
    ds = root / "refcoco"
    ds.mkdir()
    img_dir = root / "images/mscoco/images/train2014"
    img_dir.mkdir(parents=True)

    from PIL import Image

    rng = np.random.default_rng(0)
    images, annotations, refs = [], [], []
    for i, (h, w) in enumerate([(48, 64), (32, 40)], start=1):
        fname = f"COCO_train2014_{i:012d}.jpg"
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(img_dir / fname)
        images.append({"id": i, "file_name": fname, "height": h, "width": w})
    # ann 1: polygon; ann 2: RLE
    annotations.append(
        {
            "id": 11,
            "image_id": 1,
            "category_id": 1,
            "bbox": [5, 5, 20, 20],
            "segmentation": [[5, 5, 25, 5, 25, 25, 5, 25]],
            "area": 400,
        }
    )
    mask = np.zeros((32, 40), bool)
    mask[10:20, 5:15] = True
    r = rle.encode(mask)
    annotations.append(
        {
            "id": 12,
            "image_id": 2,
            "category_id": 2,
            "bbox": [5, 10, 10, 10],
            "segmentation": {"size": r["size"], "counts": rle.compress_counts(r["counts"])},
            "area": 100,
        }
    )
    refs = [
        {
            "ref_id": 101,
            "ann_id": 11,
            "image_id": 1,
            "category_id": 1,
            "split": "val",
            "sentences": [
                {"sent_id": 1, "raw": "the left square", "tokens": ["the", "left", "square"]}
            ],
            "sent_ids": [1],
        },
        {
            "ref_id": 102,
            "ann_id": 12,
            "image_id": 2,
            "category_id": 2,
            "split": "testA",
            "sentences": [
                {"sent_id": 2, "raw": "small box", "tokens": ["small", "box"]}
            ],
            "sent_ids": [2],
        },
        {
            "ref_id": 103,
            "ann_id": 11,
            "image_id": 1,
            "category_id": 1,
            "split": "train",
            "sentences": [
                {"sent_id": 3, "raw": "square again", "tokens": ["square", "again"]}
            ],
            "sent_ids": [3],
        },
    ]
    with open(ds / "refs(unc).p", "wb") as f:
        pickle.dump(refs, f)
    with open(ds / "instances.json", "w") as f:
        json.dump(
            {
                "images": images,
                "annotations": annotations,
                "categories": [{"id": 1, "name": "square"}, {"id": 2, "name": "box"}],
            },
            f,
        )
    return str(root)


def test_refer_api(refer_root):
    refer = REFER(refer_root, "refcoco", "unc")
    assert set(refer.getRefIds()) == {101, 102, 103}
    assert refer.getRefIds(split="val") == [101]
    assert refer.getRefIds(split="testA") == [102]
    assert refer.getRefIds(split="train") == [103]
    assert refer.getImgIds([101]) == [1]
    assert refer.loadCats(1) == ["square"]
    assert refer.getRefBox(102) == [5, 10, 10, 10]

    m = refer.getMask(refer.Refs[101])
    assert m["mask"].shape == (48, 64)
    assert m["mask"][10, 10] == 1 and m["mask"][40, 40] == 0

    m2 = refer.getMask(refer.Refs[102])
    assert m2["mask"][15, 10] == 1
    assert m2["area"] == 100


def test_refer_dataset_samples(refer_root):
    ds = ReferDataset(refer_root, "refcoco", "unc", "val", sam_img_size=64, canonical=64)
    assert len(ds) == 1
    sample = ds[0]
    assert sample.image_1024.shape == (64, 64, 3)
    assert sample.image_canonical.shape == (64, 64, 3)
    assert sample.h == 48 and sample.w == 64
    assert sample.rh == 48 and sample.rw == 64
    assert sample.gt_mask.shape == (64, 64)
    assert sample.sentences == ["the left square"]


def test_build_image_sample_downscales_oversized():
    img = np.zeros((200, 100, 3), np.uint8)
    gt = np.zeros((200, 100), bool)
    gt[50:100] = True
    s = build_image_sample(img, ["x"], gt, sam_img_size=64, canonical=128)
    assert s.h == 128 and s.w == 64
    assert s.gt_mask.shape == (128, 128)


def test_prefetchers(refer_root):
    ds = ReferDataset(refer_root, "refcoco", "unc", "val", sam_img_size=64, canonical=64)
    items = list(IndexedPrefetcher(ds, workers=2, depth=2))
    assert len(items) == 1
    items2 = list(prefetch(iter(ds)))
    assert len(items2) == 1
    np.testing.assert_array_equal(items[0].image_1024, items2[0].image_1024)


# ------------------------------------------------------------- checkpointing


def test_checkpoint_npz_roundtrip(tmp_path):
    import jax

    from torch_ref import tiny_clip_config

    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "clip.npz")
    checkpoint.save(path, params)
    loaded = checkpoint.load(path)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_orbax_roundtrip(tmp_path):
    import jax

    from torch_ref import tiny_clip_config

    pytest.importorskip("orbax.checkpoint")
    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "orbax_ckpt")
    checkpoint.save(path, params)
    loaded = checkpoint.load(path)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise ValueError("boom")

    out = []
    with pytest.raises(ValueError, match="boom"):
        for x in prefetch(gen()):
            out.append(x)
    assert out == [1]


def test_indexed_prefetcher_order(refer_root):
    class Dummy:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            import time

            time.sleep(0.01 * (7 - i))  # later items finish sooner
            return i

    assert list(IndexedPrefetcher(Dummy(), workers=3, depth=3)) == list(range(7))


def test_refer_dataset_prompt_ensemble_and_instance_gt(refer_root):
    from hybridgl_tpu.data.datasets import ReferDataset

    ds = ReferDataset(
        refer_root, "refcoco", "unc", split="val",
        sam_img_size=64, canonical=64,
        prompt_ensemble=True, coco_instance_gt=True,
    )
    assert len(ds) == 1
    ens = ds.ensemble_sentences(0)
    assert len(ens) == 1  # one sentence
    assert len(ens[0]) == len(ReferDataset.templates)
    assert "the left square" in ens[0][0]
    assert ens[0][0] != ens[0][1]  # distinct templates

    inst = ds.instance_annotations(0)
    # image 1 has exactly one annotation (the 20x20 polygon square)
    assert len(inst["masks"]) == 1
    assert inst["cat_names"] == ["square"]
    m = inst["masks"][0]
    assert m.shape == (48, 64)
    assert m[10, 10] and not m[40, 60]
    np.testing.assert_allclose(inst["boxes"][0], [5, 5, 20, 20])
