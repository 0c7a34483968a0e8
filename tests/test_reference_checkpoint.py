"""End-to-end ingestion of a reference-format .pth.tar checkpoint.

Builds a torch checkpoint with the reference's exact payload and state-dict
key schemes (utils/utils.py:209-216 payload; Encoder 'convnext.*' children;
TransformerDecoder 'transformer_decoder.layers.N.*' keys), ports it, and
checks the ported encoder+decoder reproduce the torch forward numerics.
Uses a reduced-depth backbone so the test stays fast; the porter is
depth-parametric.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn

from tests.test_convnext import DEPTHS, DIMS, TorchConvNeXt
from tests.test_transformer import TorchOracle, E, H, L, F, V, ENC
from tpu_captioner.models.convnext import ConvNeXtFeatures
from tpu_captioner.models.port_torch import (
    port_convnext_features,
    port_transformer_decoder,
)
from tpu_captioner.models.transformer import TransformerDecoder
from tpu_captioner.core.config import ModelConfig


def test_full_checkpoint_round_trip(tmp_path):
    # --- Build a reference-style checkpoint file. ---
    backbone = TorchConvNeXt().eval()
    enc_sd = {f"convnext.{k}": v for k, v in backbone.export().items()}

    oracle = TorchOracle().eval()
    dec_sd = {}
    dec_sd["embedding.weight"] = oracle.embedding.weight
    dec_sd["fc_out.weight"] = oracle.fc_out.weight
    dec_sd["fc_out.bias"] = oracle.fc_out.bias
    dec_sd["encoder_proj.weight"] = oracle.enc_proj.weight
    dec_sd["encoder_proj.bias"] = oracle.enc_proj.bias
    for i, tl in enumerate(oracle.dec.layers):
        base = f"transformer_decoder.layers.{i}"
        dec_sd[f"{base}.self_attn.in_proj_weight"] = tl.self_attn.in_proj_weight
        dec_sd[f"{base}.self_attn.in_proj_bias"] = tl.self_attn.in_proj_bias
        dec_sd[f"{base}.self_attn.out_proj.weight"] = tl.self_attn.out_proj.weight
        dec_sd[f"{base}.self_attn.out_proj.bias"] = tl.self_attn.out_proj.bias
        dec_sd[f"{base}.multihead_attn.in_proj_weight"] = tl.multihead_attn.in_proj_weight
        dec_sd[f"{base}.multihead_attn.in_proj_bias"] = tl.multihead_attn.in_proj_bias
        dec_sd[f"{base}.multihead_attn.out_proj.weight"] = tl.multihead_attn.out_proj.weight
        dec_sd[f"{base}.multihead_attn.out_proj.bias"] = tl.multihead_attn.out_proj.bias
        for name in ("linear1", "linear2", "norm1", "norm2", "norm3"):
            mod = getattr(tl, name)
            dec_sd[f"{base}.{name}.weight"] = mod.weight
            dec_sd[f"{base}.{name}.bias"] = mod.bias
    ckpt = {
        "epoch": 25,
        "epochsSinceImprovement": 2,
        "bleu-4": 0.31,
        "encoder": enc_sd,
        "decoder": dec_sd,
        "encoderOptimizer": None,
        "decoderOptimizer": {},
        "results": [],
    }
    path = tmp_path / "BEST_checkpoint_test.pth.tar"
    torch.save(ckpt, path)

    # --- Port. ---
    loaded = torch.load(path, map_location="cpu", weights_only=False)
    enc_params = port_convnext_features(
        loaded["encoder"], prefix="convnext.", depths=DEPTHS
    )
    dec_params = port_transformer_decoder(loaded["decoder"], num_layers=L)
    assert loaded["epoch"] == 25 and loaded["bleu-4"] == 0.31

    # --- Encoder numerics. ---
    torch.manual_seed(7)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = backbone(x).permute(0, 2, 3, 1).numpy()
    feats = ConvNeXtFeatures(depths=DEPTHS, dims=DIMS)
    got = feats.apply(
        {"params": enc_params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    # --- Decoder numerics. ---
    enc_out = torch.randn(2, 49, ENC)
    caps = torch.randint(1, V, (2, 7))
    with torch.no_grad():
        want_logits = oracle(enc_out, caps)
    cfg = ModelConfig(
        vocab_size=V, embed_dim=E, decoder_dim=F, num_heads=H,
        num_layers=L, max_len=12, encoder_dim=ENC,
    )
    dec = TransformerDecoder(cfg)
    got_logits, _ = dec.tf_forward(
        dec_params, jnp.asarray(enc_out.numpy()), jnp.asarray(caps.numpy())
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), want_logits.numpy(), atol=3e-5
    )


def test_attvis_key_scheme_ported():
    """decoder_layers.* naming (attention-capture variant) loads through the
    same porter — the reference needed remap_transformer_decoder_keys
    (caption.py:418-430)."""
    oracle = TorchOracle().eval()
    sd = {}
    sd["embedding.weight"] = oracle.embedding.weight
    sd["fc_out.weight"] = oracle.fc_out.weight
    sd["fc_out.bias"] = oracle.fc_out.bias
    for i, tl in enumerate(oracle.dec.layers):
        base = f"decoder_layers.{i}"
        sd[f"{base}.self_attn.in_proj_weight"] = tl.self_attn.in_proj_weight
        sd[f"{base}.self_attn.in_proj_bias"] = tl.self_attn.in_proj_bias
        sd[f"{base}.self_attn.out_proj.weight"] = tl.self_attn.out_proj.weight
        sd[f"{base}.self_attn.out_proj.bias"] = tl.self_attn.out_proj.bias
        sd[f"{base}.multihead_attn.in_proj_weight"] = tl.multihead_attn.in_proj_weight
        sd[f"{base}.multihead_attn.in_proj_bias"] = tl.multihead_attn.in_proj_bias
        sd[f"{base}.multihead_attn.out_proj.weight"] = tl.multihead_attn.out_proj.weight
        sd[f"{base}.multihead_attn.out_proj.bias"] = tl.multihead_attn.out_proj.bias
        for name in ("linear1", "linear2", "norm1", "norm2", "norm3"):
            mod = getattr(tl, name)
            sd[f"{base}.{name}.weight"] = mod.weight
            sd[f"{base}.{name}.bias"] = mod.bias
    params = port_transformer_decoder(sd, num_layers=L)
    assert params["layers"]["self_attn"]["in_w"].shape == (L, E, 3 * E)
    assert "encoder_proj" not in params  # attvis sd without proj still ports