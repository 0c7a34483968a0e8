"""Transformer decoder: torch-oracle parity + KV-cache equivalence.

The torch oracle recreates the reference decoder architecture
(transformerDecoder.py:53-108) from public torch modules with weights ported
into the functional JAX decoder, then compares logits in eval mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tpu_captioner.core.config import ModelConfig
from tpu_captioner.models.transformer import TransformerDecoder, sinusoidal_pe

E, H, L, F, V, ENC, MAXLEN = 16, 4, 3, 24, 37, 20, 12
B, T, P = 3, 9, 49


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def make_cfg(**kw):
    base = dict(
        vocab_size=V, embed_dim=E, decoder_dim=F, num_heads=H,
        num_layers=L, max_len=MAXLEN, encoder_dim=ENC,
    )
    base.update(kw)
    return ModelConfig(**base)


class TorchOracle(torch.nn.Module):
    """Reference-architecture decoder from public torch modules (dropout 0)."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(0)
        self.embedding = torch.nn.Embedding(V, E)
        layer = torch.nn.TransformerDecoderLayer(
            d_model=E, nhead=H, dim_feedforward=F, dropout=0.0
        )
        self.dec = torch.nn.TransformerDecoder(layer, num_layers=L)
        self.fc_out = torch.nn.Linear(E, V)
        self.enc_proj = torch.nn.Linear(ENC, E)
        pe = sinusoidal_pe(MAXLEN, E)
        self.register_buffer("pe", torch.tensor(np.asarray(pe)))

    def forward(self, enc_out_flat, captions, kpm=None):
        mem = self.enc_proj(enc_out_flat).permute(1, 0, 2)
        x = self.embedding(captions) + self.pe[: captions.shape[1]][None]
        tgt = x.permute(1, 0, 2)
        t = tgt.shape[0]
        causal = torch.triu(torch.ones(t, t, dtype=torch.bool), diagonal=1)
        out = self.dec(tgt, mem, tgt_mask=causal, tgt_key_padding_mask=kpm)
        return self.fc_out(out.permute(1, 0, 2))


def port_params(oracle: TorchOracle):
    def lin(m):
        return {"w": t2j(m.weight).T, "b": t2j(m.bias)}

    def norm(m):
        return {"scale": t2j(m.weight), "bias": t2j(m.bias)}

    def mha(m):
        return {
            "in_w": t2j(m.in_proj_weight).T,
            "in_b": t2j(m.in_proj_bias),
            "out_w": t2j(m.out_proj.weight).T,
            "out_b": t2j(m.out_proj.bias),
        }

    layers = []
    for tl in oracle.dec.layers:
        layers.append(
            {
                "self_attn": mha(tl.self_attn),
                "cross_attn": mha(tl.multihead_attn),
                "linear1": lin(tl.linear1),
                "linear2": lin(tl.linear2),
                "norm1": norm(tl.norm1),
                "norm2": norm(tl.norm2),
                "norm3": norm(tl.norm3),
            }
        )
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "embedding": t2j(oracle.embedding.weight),
        "layers": stacked,
        "fc_out": lin(oracle.fc_out),
        "encoder_proj": lin(oracle.enc_proj),
    }


@pytest.fixture(scope="module")
def oracle_and_params():
    oracle = TorchOracle().eval()
    return oracle, port_params(oracle)


def test_tf_forward_matches_torch(oracle_and_params):
    oracle, params = oracle_and_params
    torch.manual_seed(1)
    enc = torch.randn(B, P, ENC)
    caps = torch.randint(1, V, (B, T))
    caps[0, -3:] = 0
    kpm = caps == 0
    with torch.no_grad():
        want = oracle(enc, caps, kpm)
    dec = TransformerDecoder(make_cfg())
    got, _ = dec.tf_forward(
        params, t2j(enc), t2j(caps).astype(jnp.int32), key_padding_mask=t2j(kpm)
    )
    np.testing.assert_allclose(got, want.numpy(), atol=3e-5)


def test_tf_forward_capture_alphas_shape(oracle_and_params):
    _, params = oracle_and_params
    dec = TransformerDecoder(make_cfg(), capture_alphas=True)
    enc = jnp.ones((B, P, ENC))
    caps = jnp.ones((B, T), dtype=jnp.int32)
    logits, alphas = dec.tf_forward(params, enc, caps)
    assert alphas.shape == (B, T, P)
    # Cross-attn rows are softmaxes averaged over layers/heads -> sum to 1.
    np.testing.assert_allclose(np.asarray(alphas.sum(-1)), 1.0, atol=1e-5)


def test_cached_rollout_matches_uncached_reference_algorithm(oracle_and_params):
    """The KV-cached scan must reproduce the reference's recompute-the-prefix
    greedy loop (transformerDecoder.py:124-159) step by step."""
    oracle, params = oracle_and_params
    torch.manual_seed(2)
    enc = torch.randn(B, P, ENC)
    start_id, end_id = V - 2, V - 1
    max_dec = MAXLEN - 1

    # Reference algorithm with the torch oracle: grow the prefix, re-run the
    # full decoder, take the last position.
    prefix = torch.full((B, 1), start_id, dtype=torch.long)
    finished = torch.zeros(B, dtype=torch.bool)
    ref_logits = torch.zeros(B, max_dec, V)
    ref_seqs = torch.zeros(B, max_dec, dtype=torch.long)
    with torch.no_grad():
        for t in range(max_dec):
            out = oracle(enc, prefix)  # (B, t+1, V)
            step_logits = out[:, -1, :]
            pred = step_logits.argmax(-1)
            act = ~finished
            ref_logits[act, t] = step_logits[act]
            ref_seqs[act, t] = pred[act]
            finished = finished | (act & (pred == end_id))
            prefix = torch.cat([prefix, pred[:, None]], dim=1)

    dec = TransformerDecoder(make_cfg())
    logits, seqs, _ = dec.rollout(params, t2j(enc), start_id, end_id, max_dec)
    np.testing.assert_array_equal(np.asarray(seqs), ref_seqs.numpy())
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=3e-5)


def test_pe_matches_reference_formula():
    import math

    maxlen, dim = 20, 8
    pe = np.zeros((maxlen, dim))
    position = np.arange(maxlen)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, dim, 2) * (-math.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    np.testing.assert_allclose(np.asarray(sinusoidal_pe(maxlen, dim)), pe, atol=1e-6)


def test_word2vec_forces_six_heads():
    cfg = ModelConfig(vocab_size=10, embedding_name="word2vec-google-news-300")
    assert cfg.num_heads == 6 and cfg.embed_dim == 300
