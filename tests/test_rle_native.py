"""Native C++ RLE codec vs the numpy implementation."""

import numpy as np
import pytest

from hybridgl_tpu.data import rle, rle_native


pytestmark = pytest.mark.skipif(
    not rle_native.available(), reason="native codec not built (no toolchain)"
)


def _np_encode_counts(mask):
    flat = np.asfortranarray(mask.astype(bool)).reshape(-1, order="F")
    diff = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    boundaries = np.concatenate([[0], diff, [flat.size]])
    counts = np.diff(boundaries).tolist()
    if flat.size and flat[0]:
        counts = [0] + counts
    return counts


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_encode_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    m = rng.random((123, 77)) > 0.6
    assert rle_native.encode_counts(m) == _np_encode_counts(m)


def test_native_decode_roundtrip(rng):
    m = rng.random((97, 41)) > 0.4
    counts = rle_native.encode_counts(m)
    out = rle_native.decode_counts(counts, 97, 41)
    np.testing.assert_array_equal(out, m)


def test_native_compress_roundtrip(rng):
    m = rng.random((64, 64)) > 0.5
    counts = rle_native.encode_counts(m)
    s = rle_native.compress(counts)
    assert rle_native.decompress(s) == counts


def test_native_overlap_area(rng):
    a = rng.random((50, 50)) > 0.5
    b = rng.random((50, 50)) > 0.5
    ca = rle_native.encode_counts(a)
    cb = rle_native.encode_counts(b)
    assert rle_native.overlap_area(ca, cb, union=False) == int(np.logical_and(a, b).sum())
    assert rle_native.overlap_area(ca, cb, union=True) == int(np.logical_or(a, b).sum())


def test_highlevel_uses_native_consistently(rng):
    m = rng.random((200, 160)) > 0.7
    r = rle.encode(m)
    np.testing.assert_array_equal(rle.decode(r), m)
    s = rle.compress_counts(r["counts"])
    assert rle.decompress_counts(s) == list(r["counts"])
    m2 = rng.random((200, 160)) > 0.7
    got = rle.iou(r, rle.encode(m2))
    want_i = np.logical_and(m, m2).sum()
    want_u = np.logical_or(m, m2).sum()
    assert abs(got - want_i / want_u) < 1e-12
