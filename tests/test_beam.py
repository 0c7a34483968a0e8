"""Beam search: beam-1 == greedy, batched == single, and full parity with a
Python transcription of the reference's shrink-harvest beam algorithm
(caption.py:96-155) driven by the already-verified full forward pass."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_captioner.core.config import ModelConfig
from tpu_captioner.infer.beam import beam_search_batch, beam_search_encoded
from tpu_captioner.train.model import CaptionModel

V = 31
MAXSTEPS = 9  # keep loops small on CPU


def tiny_model(decoder):
    cfg = ModelConfig(
        decoder=decoder,
        vocab_size=V,
        embed_dim=16,
        attention_dim=12,
        decoder_dim=20,
        num_heads=4,
        num_layers=2,
        max_len=MAXSTEPS + 2,
        encoder_dim=24,
        encoder_depths=(1, 1),
        encoder_dims=(8, 24),
    )
    model = CaptionModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), image_size=32)
    return model, params


START, END = V - 2, V - 1


@pytest.mark.parametrize(
    "decoder", ["lstm", "lstm_no_attention", "transformer", "transformer_attvis"]
)
def test_beam1_matches_greedy_rollout(decoder):
    model, params = tiny_model(decoder)
    enc_out = model.encode(params, jnp.zeros((1, 32, 32, 3), jnp.uint8) + 37)
    res = beam_search_encoded(
        model, params, enc_out,
        beam_size=1, max_steps=MAXSTEPS, start_id=START, end_id=END,
    )
    _, seqs, _ = model.rollout(params, enc_out, START, END, MAXSTEPS + 1)
    greedy = np.asarray(seqs[0])
    got = np.asarray(res.sequence)
    assert got[0] == START
    n = int(res.length) - 1  # tokens after <start>
    np.testing.assert_array_equal(got[1 : 1 + n], greedy[:n])


@pytest.mark.parametrize("decoder", ["lstm", "transformer"])
def test_batched_beam_matches_single(decoder):
    model, params = tiny_model(decoder)
    imgs = (np.arange(2 * 32 * 32 * 3).reshape(2, 32, 32, 3) % 251).astype(np.uint8)
    batched = beam_search_batch(
        model, params, jnp.asarray(imgs),
        beam_size=3, max_steps=MAXSTEPS, start_id=START, end_id=END,
    )
    for b in range(2):
        enc = model.encode(params, jnp.asarray(imgs[b : b + 1]))
        single = beam_search_encoded(
            model, params, enc,
            beam_size=3, max_steps=MAXSTEPS, start_id=START, end_id=END,
        )
        np.testing.assert_array_equal(
            np.asarray(batched.sequence[b]), np.asarray(single.sequence)
        )
        np.testing.assert_allclose(
            float(batched.score[b]), float(single.score), rtol=1e-5
        )


def _reference_beam_oracle(model, params, enc_out, k, max_steps):
    """Literal Python transcription of the reference beam algorithm
    (caption.py:96-155) using the full TF forward (no cache) per step."""
    dec = model.decoder
    prefixes = np.full((k, 1), START, dtype=np.int64)
    top_scores = np.zeros(k)
    complete, complete_scores = [], []
    step = 1
    while True:
        kk = prefixes.shape[0]
        enc_k = jnp.broadcast_to(enc_out, (kk,) + enc_out.shape[1:])
        logits, _ = dec.tf_forward(params["decoder"], enc_k, jnp.asarray(prefixes))
        logp = np.asarray(jax.nn.log_softmax(logits[:, -1, :], axis=-1), dtype=np.float64)
        scores = top_scores[:, None] + logp
        flat = scores[0] if step == 1 else scores.reshape(-1)
        top_idx = np.argsort(-flat, kind="stable")[:kk]
        tk_scores = flat[top_idx]
        prev = np.zeros(kk, dtype=np.int64) if step == 1 else top_idx // V
        words = top_idx % V
        new_prefixes = np.concatenate([prefixes[prev], words[:, None]], axis=1)
        incomplete = [i for i in range(kk) if words[i] != END]
        done = [i for i in range(kk) if words[i] == END]
        for i in done:
            complete.append(new_prefixes[i].tolist())
            complete_scores.append(tk_scores[i])
        kk_next = kk - len(done)
        if kk_next == 0:
            break
        prefixes = new_prefixes[incomplete]
        top_scores = tk_scores[incomplete]
        if step > max_steps:
            break
        step += 1
    if complete_scores:
        i = int(np.argmax(complete_scores))
        return complete[i], complete_scores[i]
    return None, None


@pytest.mark.slow
def test_transformer_beam_matches_reference_algorithm():
    model, params = tiny_model("transformer")
    enc_out = model.encode(params, jnp.zeros((1, 32, 32, 3), jnp.uint8) + 91)
    want_seq, want_score = _reference_beam_oracle(model, params, enc_out, 4, MAXSTEPS)
    res = beam_search_encoded(
        model, params, enc_out,
        beam_size=4, max_steps=MAXSTEPS, start_id=START, end_id=END,
    )
    got_seq = np.asarray(res.sequence)[: int(res.length)].tolist()
    if want_seq is not None:
        assert got_seq == want_seq
        np.testing.assert_allclose(float(res.score), want_score, rtol=1e-4)


def test_attvis_beam_alphas_are_attention_maps():
    model, params = tiny_model("transformer_attvis")
    enc_out = model.encode(params, jnp.zeros((1, 32, 32, 3), jnp.uint8) + 7)
    res = beam_search_encoded(
        model, params, enc_out,
        beam_size=3, max_steps=MAXSTEPS, start_id=START, end_id=END,
    )
    n = int(res.length)
    alphas = np.asarray(res.alphas)[1:n]  # step 0 is the <start> placeholder
    # Each emitted token's map is an average of softmaxes -> sums to 1.
    np.testing.assert_allclose(alphas.sum(-1), 1.0, atol=1e-5)
