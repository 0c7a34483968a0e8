"""LSTM decoder family: torch-oracle parity for TF forward and greedy rollout.

The torch oracle recreates the reference DecoderWithAttention data path
(models/decoder.py:34-163) from public torch primitives (Linear, LSTMCell,
softmax attention), weights ported into the functional JAX decoder.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tpu_captioner.core.config import ModelConfig
from tpu_captioner.models.lstm import DecoderWithAttention, DecoderWithoutAttention

V, E, A, D, ENC = 29, 12, 10, 14, 16
B, P, T = 3, 49, 8


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def cfg():
    return ModelConfig(
        vocab_size=V, embed_dim=E, attention_dim=A, decoder_dim=D, encoder_dim=ENC
    )


class TorchAttnOracle(torch.nn.Module):
    def __init__(self):
        super().__init__()
        torch.manual_seed(0)
        self.embedding = torch.nn.Embedding(V, E)
        self.enc_att = torch.nn.Linear(ENC, A)
        self.dec_att = torch.nn.Linear(D, A)
        self.full_att = torch.nn.Linear(A, 1)
        self.init_h = torch.nn.Linear(ENC, D)
        self.init_c = torch.nn.Linear(ENC, D)
        self.f_beta = torch.nn.Linear(D, ENC)
        self.cell = torch.nn.LSTMCell(E + ENC, D)
        self.fc = torch.nn.Linear(D, V)

    def attend(self, enc_out, h):
        att = self.full_att(
            torch.relu(self.enc_att(enc_out) + self.dec_att(h).unsqueeze(1))
        ).squeeze(2)
        alpha = torch.softmax(att, dim=1)
        ctx = (enc_out * alpha.unsqueeze(2)).sum(dim=1)
        return ctx, alpha

    def step(self, enc_out, h, c, emb):
        ctx, alpha = self.attend(enc_out, h)
        gate = torch.sigmoid(self.f_beta(h))
        h2, c2 = self.cell(torch.cat([emb, gate * ctx], dim=1), (h, c))
        return h2, c2, self.fc(h2), alpha

    def init_state(self, enc_out):
        m = enc_out.mean(dim=1)
        return self.init_h(m), self.init_c(m)


def port(oracle):
    def lin(m):
        return {"w": t2j(m.weight).T, "b": t2j(m.bias)}

    return {
        "embedding": t2j(oracle.embedding.weight),
        "attention": {
            "encoder_att": lin(oracle.enc_att),
            "decoder_att": lin(oracle.dec_att),
            "full_att": lin(oracle.full_att),
        },
        "init_h": lin(oracle.init_h),
        "init_c": lin(oracle.init_c),
        "f_beta": lin(oracle.f_beta),
        "lstm": {
            "w_ih": t2j(oracle.cell.weight_ih).T,
            "w_hh": t2j(oracle.cell.weight_hh).T,
            "b_ih": t2j(oracle.cell.bias_ih),
            "b_hh": t2j(oracle.cell.bias_hh),
        },
        "fc": lin(oracle.fc),
    }


@pytest.fixture(scope="module")
def oracle_and_params():
    oracle = TorchAttnOracle().eval()
    return oracle, port(oracle)


def test_tf_forward_matches_torch_loop(oracle_and_params):
    oracle, params = oracle_and_params
    torch.manual_seed(1)
    enc = torch.randn(B, P, ENC)
    caps = torch.randint(1, V, (B, T))
    with torch.no_grad():
        h, c = oracle.init_state(enc)
        embs = oracle.embedding(caps)
        want_logits, want_alphas = [], []
        for t in range(T - 1):
            h, c, logit, alpha = oracle.step(enc, h, c, embs[:, t])
            want_logits.append(logit)
            want_alphas.append(alpha)
        want_logits = torch.stack(want_logits, dim=1)
        want_alphas = torch.stack(want_alphas, dim=1)

    dec = DecoderWithAttention(cfg())
    logits, alphas = dec.tf_forward(params, t2j(enc), t2j(caps).astype(jnp.int32))
    np.testing.assert_allclose(logits, want_logits.numpy(), atol=3e-5)
    np.testing.assert_allclose(alphas, want_alphas.numpy(), atol=3e-5)


def test_rollout_matches_torch_greedy(oracle_and_params):
    oracle, params = oracle_and_params
    torch.manual_seed(2)
    enc = torch.randn(B, P, ENC)
    start_id, end_id, max_dec = V - 2, V - 1, 10
    with torch.no_grad():
        h, c = oracle.init_state(enc)
        tok = torch.full((B,), start_id, dtype=torch.long)
        finished = torch.zeros(B, dtype=torch.bool)
        want_seq = torch.zeros(B, max_dec, dtype=torch.long)
        want_alpha = torch.zeros(B, max_dec, P)
        for t in range(max_dec):
            h2, c2, logit, alpha = oracle.step(enc, h, c, oracle.embedding(tok))
            pred = logit.argmax(-1)
            act = ~finished
            want_seq[act, t] = pred[act]
            want_alpha[act, t] = alpha[act]
            h = torch.where(act[:, None], h2, h)
            c = torch.where(act[:, None], c2, c)
            tok = torch.where(act, pred, tok)
            finished = finished | (act & (pred == end_id))

    dec = DecoderWithAttention(cfg())
    logits, alphas, seqs = dec.rollout(params, t2j(enc), start_id, end_id, max_dec)
    np.testing.assert_array_equal(np.asarray(seqs), want_seq.numpy())
    np.testing.assert_allclose(np.asarray(alphas), want_alpha.numpy(), atol=3e-5)
    # Zeroing after finish: any step after a row's <end> must be all-zero.
    ends = np.argmax(np.asarray(seqs) == end_id, axis=1)
    for b in range(B):
        if (np.asarray(seqs)[b] == end_id).any():
            assert np.all(np.asarray(logits)[b, ends[b] + 1 :] == 0)


def test_no_attention_decoder_shapes_and_determinism():
    c = cfg()
    dec = DecoderWithoutAttention(c)
    p = dec.init_params(jax.random.PRNGKey(0))
    enc = jax.random.normal(jax.random.PRNGKey(1), (B, P, ENC))
    caps = jax.random.randint(jax.random.PRNGKey(2), (B, T), 1, V)
    l1 = dec.tf_forward(p, enc, caps)
    l2 = dec.tf_forward(p, enc, caps)
    assert l1.shape == (B, T - 1, V)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    logits, seqs = dec.rollout(p, enc, V - 2, V - 1, 6)
    assert logits.shape == (B, 6, V) and seqs.shape == (B, 6)


def test_dropout_changes_training_forward_only():
    c = cfg()
    dec = DecoderWithAttention(c)
    p = dec.init_params(jax.random.PRNGKey(0))
    enc = jax.random.normal(jax.random.PRNGKey(1), (B, P, ENC))
    caps = jax.random.randint(jax.random.PRNGKey(2), (B, T), 1, V)
    det, _ = dec.tf_forward(p, enc, caps, deterministic=True)
    tr1, _ = dec.tf_forward(p, enc, caps, rng=jax.random.PRNGKey(3), deterministic=False)
    tr2, _ = dec.tf_forward(p, enc, caps, rng=jax.random.PRNGKey(4), deterministic=False)
    assert not np.allclose(det, tr1)
    assert not np.allclose(tr1, tr2)
