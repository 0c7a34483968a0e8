"""Native C++ runtime: builds, and matches the Python implementations."""

import numpy as np
import pytest

from tpu_captioner.native.lib import native_available


requires_native = pytest.mark.skipif(
    not native_available(), reason="native lib failed to build"
)


@requires_native
def test_native_bleu_matches_python_and_nltk():
    from tpu_captioner.eval.bleu import corpus_bleu as py_bleu
    from tpu_captioner.native.bleu_native import bleu_1_to_4

    rng = np.random.default_rng(5)
    refs, hyps = [], []
    for i in range(60):
        rs = [list(rng.integers(1, 40, rng.integers(4, 16))) for _ in range(5)]
        if i % 3 == 0:
            h = list(rs[0])
        elif i % 3 == 1:
            h = list(rng.integers(1, 40, rng.integers(1, 12)))
        else:
            h = list(rng.integers(100, 110, 3))  # no overlap
        refs.append(rs)
        hyps.append(h)
    got = bleu_1_to_4(refs, hyps)
    from tpu_captioner.eval.bleu import BLEU_WEIGHTS

    for i, n in enumerate((1, 2, 3, 4)):
        want = py_bleu(refs, hyps, BLEU_WEIGHTS[n])
        np.testing.assert_allclose(got[i], want, rtol=1e-12, atol=1e-300)


@requires_native
def test_native_bleu_degenerate_zero_unigrams():
    from tpu_captioner.native.bleu_native import bleu_1_to_4

    refs = [[[1, 2, 3]]]
    hyps = [[9, 9, 9]]
    assert bleu_1_to_4(refs, hyps) == (0.0, 0.0, 0.0, 0.0)


@requires_native
def test_native_gather_matches_numpy():
    from tpu_captioner.native.gather import gather_batch_native

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (10, 8, 8, 3), dtype=np.uint8)
    captions = rng.integers(0, 50, (50, 12)).astype(np.int32)
    caplens = rng.integers(2, 12, (50,)).astype(np.int32)
    cap_idx = np.array([3, 17, 42, 0, 49])
    img_idx = cap_idx // 5
    gi, gc, gl = gather_batch_native(images, captions, caplens, img_idx, cap_idx)
    np.testing.assert_array_equal(gi, images[img_idx])
    np.testing.assert_array_equal(gc, captions[cap_idx])
    np.testing.assert_array_equal(gl, caplens[cap_idx])


def test_fallback_paths_work(monkeypatch):
    import tpu_captioner.native.lib as nlib

    monkeypatch.setattr(nlib, "_lib", None)
    monkeypatch.setattr(nlib, "_failed", True)
    from tpu_captioner.native.bleu_native import bleu_1_to_4
    from tpu_captioner.native.gather import gather_batch_native

    refs = [[[1, 2, 3, 4]]]
    hyps = [[1, 2, 3, 4]]
    assert all(abs(b - 1.0) < 1e-12 for b in bleu_1_to_4(refs, hyps))
    images = np.zeros((2, 4, 4, 3), dtype=np.uint8)
    captions = np.zeros((10, 5), dtype=np.int32)
    caplens = np.ones((10,), dtype=np.int32)
    gi, gc, gl = gather_batch_native(
        images, captions, caplens, np.array([0, 1]), np.array([0, 5])
    )
    assert gi.shape == (2, 4, 4, 3)
