"""Parity tests for the fused LSTM+attention decode-step kernel
(ops/lstm_step.py).

The kernel (interpret mode on CPU) must reproduce the XLA LSTM decode path
— DecoderWithAttention.step / rollout — which is itself torch-oracle
parity-tested in tests/test_lstm.py.  Covers: single step, row tiling with
a ragged tile, full greedy-rollout equality (sequences exact, logits and
attention maps numeric), and the beam adapter's fused path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_captioner.core.config import ModelConfig
from tpu_captioner.models.layers import linear
from tpu_captioner.models.lstm import DecoderWithAttention, _flatten_pixels
from tpu_captioner.ops.lstm_step import fused_lstm_step, prepare_lstm_weights


def small_cfg(**kw):
    base = dict(
        decoder="lstm",
        vocab_size=61,
        embed_dim=48,
        decoder_dim=56,
        encoder_dim=40,
        attention_dim=36,
        max_len=16,
        dropout=0.5,  # inactive in deterministic mode
        encoded_image_size=2,
        encoder_depths=(1, 1),
        encoder_dims=(8, 40),
    )
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    dec = DecoderWithAttention(cfg)
    p = dec.init_params(jax.random.PRNGKey(0))
    B = 5
    enc_out = jax.random.normal(
        jax.random.PRNGKey(1),
        (B, cfg.encoded_image_size, cfg.encoded_image_size, cfg.encoder_dim),
    )
    return cfg, dec, p, enc_out


def test_single_step_parity(setup):
    cfg, dec, p, enc_out = setup
    enc = _flatten_pixels(enc_out)
    att1 = linear(p["attention"]["encoder_att"], enc)
    h, c = dec.init_hidden_state(p, enc)
    kw = prepare_lstm_weights(p, cfg.embed_dim)
    rng = np.random.default_rng(3)
    for _ in range(3):
        toks = jnp.asarray(rng.integers(1, cfg.vocab_size, enc.shape[0]),
                           jnp.int32)
        emb = p["embedding"][toks]
        h_ref, c_ref, alpha_ref = dec.step(p, h, c, emb, enc, att1)
        h_k, c_k, alpha_k = fused_lstm_step(
            kw, emb, h, c, enc, att1, interpret=True
        )
        np.testing.assert_allclose(h_k, h_ref, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(c_k, c_ref, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(alpha_k, alpha_ref, rtol=2e-5, atol=2e-6)
        h, c = h_ref, c_ref  # evolve state through the reference path


def test_row_tiled_matches_single_tile(setup):
    cfg, dec, p, enc_out = setup
    enc = _flatten_pixels(enc_out)  # B=5 -> row_tile=2 gives 2+2+ragged 1
    att1 = linear(p["attention"]["encoder_att"], enc)
    h, c = dec.init_hidden_state(p, enc)
    kw = prepare_lstm_weights(p, cfg.embed_dim)
    emb = p["embedding"][jnp.asarray([4, 9, 1, 7, 2], jnp.int32)]
    ref = fused_lstm_step(kw, emb, h, c, enc, att1, interpret=True)
    got = fused_lstm_step(kw, emb, h, c, enc, att1, interpret=True,
                          row_tile=2)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_fused_rollout_equality(setup):
    cfg, dec, p, enc_out = setup
    start, end = cfg.vocab_size - 2, cfg.vocab_size - 1
    L = 9
    logits_ref, alphas_ref, seqs_ref = dec.rollout(
        p, enc_out, start, end, L, deterministic=True
    )
    logits, alphas, seqs = dec.fused_rollout(
        p, enc_out, start, end, L, interpret=True
    )
    np.testing.assert_array_equal(seqs, seqs_ref)
    np.testing.assert_allclose(logits, logits_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(alphas, alphas_ref, rtol=2e-5, atol=2e-6)


def test_fused_rollout_scheduled_sampling(setup):
    """Scheduled sampling (same rng -> same teacher/model coin flips) must
    agree between the XLA and fused rollouts."""
    cfg, dec, p, enc_out = setup
    start, end = cfg.vocab_size - 2, cfg.vocab_size - 1
    L = 8
    B = enc_out.shape[0]
    teacher = jax.random.randint(jax.random.PRNGKey(9), (B, L), 1,
                                 cfg.vocab_size)
    rng = jax.random.PRNGKey(4)
    _, _, seqs_ref = dec.rollout(
        p, enc_out, start, end, L, deterministic=True,
        rng=rng, teacher_tokens=teacher, teacher_prob=0.5,
    )
    _, _, seqs = dec.fused_rollout(
        p, enc_out, start, end, L,
        rng=rng, teacher_tokens=teacher, teacher_prob=0.5,
    )
    np.testing.assert_array_equal(seqs, seqs_ref)


def test_beam_fused_path_matches_xla(setup):
    """The beam adapter's fused step must give the same captions as the XLA
    adapter (decode_kernel='off')."""
    import dataclasses

    from tpu_captioner.infer.beam import beam_search_batch
    from tpu_captioner.train.model import CaptionModel

    cfg, dec, p, enc_out = setup
    start, end = cfg.vocab_size - 2, cfg.vocab_size - 1
    m_off = CaptionModel(dataclasses.replace(cfg, decode_kernel="off"))
    m_on = CaptionModel(dataclasses.replace(cfg, decode_kernel="on"))
    params = {
        "encoder": m_off.init_params(jax.random.PRNGKey(0),
                                     image_size=32)["encoder"],
        "decoder": p,
    }
    images = jnp.asarray(
        np.random.default_rng(5).integers(0, 256, (3, 32, 32, 3), np.uint8)
    )
    r_off = beam_search_batch(m_off, params, images, beam_size=3,
                              max_steps=8, start_id=start, end_id=end)
    r_on = beam_search_batch(m_on, params, images, beam_size=3,
                             max_steps=8, start_id=start, end_id=end)
    np.testing.assert_array_equal(r_on.sequence, r_off.sequence)
    np.testing.assert_allclose(r_on.score, r_off.score, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(r_on.alphas, r_off.alphas, rtol=2e-5,
                               atol=2e-6)
