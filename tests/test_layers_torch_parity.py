"""Numerical parity of the functional primitives against torch oracles.

torch (CPU) is a test-only dependency used as the ground-truth for the
reference's building blocks: LSTMCell, MultiheadAttention,
TransformerDecoderLayer, LayerNorm, adaptive average pooling.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tpu_captioner.models.layers import (
    causal_mask,
    key_padding_to_mask,
    layer_norm,
    linear,
    lstm_cell,
    multi_head_attention,
)

ATOL = 2e-5


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_linear_matches_torch():
    torch.manual_seed(0)
    lin = torch.nn.Linear(8, 5)
    x = torch.randn(3, 8)
    p = {"w": t2j(lin.weight).T, "b": t2j(lin.bias)}
    got = linear(p, t2j(x))
    np.testing.assert_allclose(got, lin(x).detach().numpy(), atol=ATOL)


def test_layer_norm_matches_torch():
    torch.manual_seed(0)
    ln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        ln.weight.uniform_(0.5, 1.5)
        ln.bias.uniform_(-0.5, 0.5)
    x = torch.randn(4, 16)
    p = {"scale": t2j(ln.weight), "bias": t2j(ln.bias)}
    got = layer_norm(p, t2j(x), eps=1e-5)
    np.testing.assert_allclose(got, ln(x).detach().numpy(), atol=ATOL)


def test_lstm_cell_matches_torch():
    torch.manual_seed(1)
    cell = torch.nn.LSTMCell(10, 7)
    x = torch.randn(4, 10)
    h = torch.randn(4, 7)
    c = torch.randn(4, 7)
    p = {
        "w_ih": t2j(cell.weight_ih).T,
        "w_hh": t2j(cell.weight_hh).T,
        "b_ih": t2j(cell.bias_ih),
        "b_hh": t2j(cell.bias_hh),
    }
    h2, c2 = lstm_cell(p, t2j(x), t2j(h), t2j(c))
    th, tc = cell(x, (h, c))
    np.testing.assert_allclose(h2, th.detach().numpy(), atol=ATOL)
    np.testing.assert_allclose(c2, tc.detach().numpy(), atol=ATOL)


def _mha_params(mha):
    return {
        "in_w": t2j(mha.in_proj_weight).T,
        "in_b": t2j(mha.in_proj_bias),
        "out_w": t2j(mha.out_proj.weight).T,
        "out_b": t2j(mha.out_proj.bias),
    }


def test_mha_self_attention_matches_torch():
    torch.manual_seed(2)
    E, H, B, T = 16, 4, 3, 5
    mha = torch.nn.MultiheadAttention(E, H, dropout=0.0, batch_first=True)
    mha.eval()
    x = torch.randn(B, T, E)
    causal = torch.triu(torch.ones(T, T, dtype=torch.bool), diagonal=1)
    out_t, w_t = mha(x, x, x, attn_mask=causal, need_weights=True, average_attn_weights=False)
    got, probs = multi_head_attention(
        _mha_params(mha), t2j(x), t2j(x), t2j(x), H, mask=causal_mask(T)
    )
    np.testing.assert_allclose(got, out_t.detach().numpy(), atol=ATOL)
    np.testing.assert_allclose(probs, w_t.detach().numpy(), atol=ATOL)


def test_mha_key_padding_matches_torch():
    torch.manual_seed(3)
    E, H, B, T = 16, 4, 3, 5
    mha = torch.nn.MultiheadAttention(E, H, dropout=0.0, batch_first=True)
    mha.eval()
    x = torch.randn(B, T, E)
    kpm = torch.zeros(B, T, dtype=torch.bool)
    kpm[0, -2:] = True
    kpm[2, -1:] = True
    causal = torch.triu(torch.ones(T, T, dtype=torch.bool), diagonal=1)
    out_t, _ = mha(x, x, x, attn_mask=causal, key_padding_mask=kpm, need_weights=False)
    mask = causal_mask(T) & key_padding_to_mask(t2j(kpm))
    got, _ = multi_head_attention(_mha_params(mha), t2j(x), t2j(x), t2j(x), H, mask=mask)
    # Rows whose keys are entirely masked yield NaN in torch, 0 here; compare
    # only defined entries (here none are fully masked thanks to causality).
    np.testing.assert_allclose(got, out_t.detach().numpy(), atol=ATOL)


def test_mha_cross_attention_matches_torch():
    torch.manual_seed(4)
    E, H, B, Tq, Tk = 16, 4, 2, 3, 7
    mha = torch.nn.MultiheadAttention(E, H, dropout=0.0, batch_first=True)
    mha.eval()
    q = torch.randn(B, Tq, E)
    kv = torch.randn(B, Tk, E)
    out_t, w_t = mha(q, kv, kv, need_weights=True, average_attn_weights=False)
    got, probs = multi_head_attention(_mha_params(mha), t2j(q), t2j(kv), t2j(kv), H)
    np.testing.assert_allclose(got, out_t.detach().numpy(), atol=ATOL)
    np.testing.assert_allclose(probs, w_t.detach().numpy(), atol=ATOL)


def test_adaptive_avg_pool_matches_torch():
    from tpu_captioner.models.convnext import adaptive_avg_pool_nhwc

    torch.manual_seed(5)
    for in_hw, out_hw in [(8, 7), (10, 7), (7, 7), (13, 5)]:
        x = torch.randn(2, 6, in_hw, in_hw)  # NCHW for torch
        want = torch.nn.AdaptiveAvgPool2d((out_hw, out_hw))(x)
        got = adaptive_avg_pool_nhwc(t2j(x.permute(0, 2, 3, 1)), out_hw)
        np.testing.assert_allclose(
            got, want.permute(0, 2, 3, 1).numpy(), atol=ATOL
        )
