"""Pretrained word-embedding pipeline: format parsing, OOV zeros, padding-row
pinning, freeze semantics."""

import gzip
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_captioner.core.config import ModelConfig, TrainConfig
from tpu_captioner.models.embeddings import (
    extract_embeddings_npz,
    load_pretrained_word_embeddings,
)

WM = {"<pad>": 0, "dog": 1, "cat": 2, "zzz": 3, "<unk>": 4, "<start>": 5, "<end>": 6}


def write_glove(path, gz=False):
    lines = "dog 1.0 2.0 3.0\ncat -1.0 0.5 0.25\nextra 9 9 9\n"
    if gz:
        with gzip.open(path, "wt") as f:
            f.write(lines)
    else:
        with open(path, "w") as f:
            f.write(lines)


def test_glove_text_loader(tmp_path):
    p = str(tmp_path / "glove.txt")
    write_glove(p)
    m = load_pretrained_word_embeddings(WM, p, 3)
    np.testing.assert_allclose(m[1], [1, 2, 3])
    np.testing.assert_allclose(m[2], [-1, 0.5, 0.25])
    assert np.all(m[3] == 0) and np.all(m[0] == 0)  # OOV + pad rows zero


def test_glove_gz_and_npz_cache(tmp_path):
    p = str(tmp_path / "glove.gz")
    write_glove(p, gz=True)
    out = str(tmp_path / "emb.npz")
    extract_embeddings_npz(p, WM, 3, out)
    m = load_pretrained_word_embeddings(WM, out, 3)
    np.testing.assert_allclose(m[1], [1, 2, 3])
    assert np.all(m[3] == 0)


def test_word2vec_binary_loader(tmp_path):
    p = str(tmp_path / "word2vec-test.bin")
    with open(p, "wb") as f:
        f.write(b"2 3\n")
        f.write(b"dog " + np.asarray([7, 8, 9], np.float32).tobytes())
        f.write(b"cat " + np.asarray([1, 1, 1], np.float32).tobytes())
    m = load_pretrained_word_embeddings(WM, p, 3)
    np.testing.assert_allclose(m[1], [7, 8, 9])
    np.testing.assert_allclose(m[2], [1, 1, 1])


def test_pretrained_embedding_pad_pinning_and_freeze(tmp_path):
    from tpu_captioner.train.model import CaptionModel
    from tpu_captioner.train.state import TrainState, make_optimizer
    from tpu_captioner.train.steps import make_train_step

    p = str(tmp_path / "glove4.txt")
    with open(p, "w") as f:
        f.write("dog 1.0 2.0 3.0 4.0\ncat -1.0 0.5 0.25 2.0\n")
    cfg = ModelConfig(
        decoder="transformer", vocab_size=len(WM), embed_dim=4, decoder_dim=8,
        num_heads=1, num_layers=1, max_len=6, encoder_dim=8,
        encoder_depths=(1,), encoder_dims=(8,),
        embedding_path=p, fine_tune_embeddings=False,
    )
    model = CaptionModel(cfg)
    matrix = load_pretrained_word_embeddings(WM, p, 4)
    params = model.init_params(
        jax.random.PRNGKey(0), image_size=32, pretrained_embeddings=matrix
    )
    np.testing.assert_allclose(np.asarray(params["decoder"]["embedding"]), matrix)

    fc_before = np.asarray(params["decoder"]["fc_out"]["w"]).copy()
    tc = TrainConfig(batch_size=4, max_decode_len=5)
    opt = make_optimizer(1e-2, 5.0)
    state = TrainState.create(params, opt, opt)  # step donates this state
    step = make_train_step(
        model, tc, {n: WM[n] for n in ("<pad>", "<unk>", "<start>", "<end>")},
        opt, opt, teacher_forcing=True, train_encoder=False,
    )
    batch = {
        "images": jnp.zeros((4, 32, 32, 3), jnp.uint8),
        "captions": jnp.asarray(
            np.array([[5, 1, 2, 6, 0, 0]] * 4, dtype=np.int32)
        ),
        "caplens": jnp.full((4,), 4, jnp.int32),
        "valid": jnp.ones((4,), bool),
    }
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    # Frozen: embedding table unchanged after an update step.
    np.testing.assert_allclose(
        np.asarray(state.params["decoder"]["embedding"]), matrix
    )
    # fc_out did move.
    assert not np.allclose(
        np.asarray(state.params["decoder"]["fc_out"]["w"]), fc_before
    )
