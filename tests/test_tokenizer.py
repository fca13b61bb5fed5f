import numpy as np
import pytest

from hybridgl_tpu.models.clip import tokenizer as tok


def _have_vocab():
    try:
        tok.find_vocab()
        return True
    except FileNotFoundError:
        return False


pytestmark = pytest.mark.skipif(not _have_vocab(), reason="BPE vocab not available")


def test_shape_and_frame_tokens():
    out = tok.tokenize(["the cat on the left", "a photo of a dog"])
    assert out.shape == (2, 77)
    tk = tok.default_tokenizer()
    assert out[0, 0] == tk.sot_token
    # EOT is the max token id in each row (CLIP pools at argmax)
    assert out[0].max() == tk.eot_token
    assert out[1].max() == tk.eot_token


def test_roundtrip():
    tk = tok.default_tokenizer()
    text = "man in a red shirt holding an umbrella"
    ids = tk.encode(text)
    assert tk.decode(ids).strip() == text


def test_known_token_ids():
    # "a photo of a" is a canonical CLIP prompt; its BPE ids are stable
    # public constants (a=320, photo=1125, of=539).
    tk = tok.default_tokenizer()
    ids = tk.encode("a photo of a")
    assert ids == [320, 1125, 539, 320]


def test_eot_position_matches_length():
    out = tok.tokenize("left guy")
    tk = tok.default_tokenizer()
    n = len(tk.encode("left guy"))
    assert out[0, n + 1] == tk.eot_token
    assert np.all(out[0, n + 2 :] == 0)


def test_clip_image_preprocess():
    import numpy as np

    from hybridgl_tpu.models.clip.preprocess import clip_image_preprocess

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (300, 400, 3), dtype=np.uint8)
    out = clip_image_preprocess(img, 224)
    assert out.shape == (224, 224, 3)
    assert out.dtype == np.float32
    # normalized range sanity
    assert -3.0 < out.min() < 0.5 and 0.0 < out.max() < 3.0
    # square input: no crop distortion of center pixel ordering
    sq = clip_image_preprocess(img[:300, :300], 224)
    assert sq.shape == (224, 224, 3)
