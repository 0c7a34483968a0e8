"""Port torch/torchvision state_dicts into this framework's parameter trees.

Two jobs:
1. **Pretrained backbone**: torchvision ``convnext_base(IMAGENET1K_V1)``
   weights are required for BLEU parity (the reference builds on them,
   models/encoder.py:18).  ``port_convnext_features`` maps the torchvision
   ``features.*`` naming onto the flax ConvNeXtFeatures tree.
2. **Reference checkpoints**: ``port_*_decoder`` map the reference's decoder
   state_dicts (decoder.py / transformerDecoder.py / transformerDecoderAttVis
   naming, including the ``decoder_layers.*`` variant that the reference needed
   a key remapper for, caption.py:418-430) onto the functional param trees, so
   checkpoints trained by the reference evaluate directly in this framework.

Accepts state dicts of numpy arrays or torch tensors (torch optional).
Layout notes: torch Linear weights are (out, in) -> transposed; torch conv
weights are (out, in/groups, kh, kw) -> (kh, kw, in/groups, out).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp
import jax


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _lin(sd: Mapping, prefix: str) -> Dict:
    return {
        "w": jnp.asarray(_np(sd[f"{prefix}.weight"]).T),
        "b": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def _norm(sd: Mapping, prefix: str) -> Dict:
    return {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def _flax_ln(sd: Mapping, prefix: str) -> Dict:
    return {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def _conv(sd: Mapping, prefix: str) -> Dict:
    w = _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)
    out = {"kernel": jnp.asarray(w)}
    if f"{prefix}.bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return out


def _mha(sd: Mapping, prefix: str) -> Dict:
    return {
        "in_w": jnp.asarray(_np(sd[f"{prefix}.in_proj_weight"]).T),
        "in_b": jnp.asarray(_np(sd[f"{prefix}.in_proj_bias"])),
        "out_w": jnp.asarray(_np(sd[f"{prefix}.out_proj.weight"]).T),
        "out_b": jnp.asarray(_np(sd[f"{prefix}.out_proj.bias"])),
    }


def _lstm(sd: Mapping, prefix: str) -> Dict:
    return {
        "w_ih": jnp.asarray(_np(sd[f"{prefix}.weight_ih"]).T),
        "w_hh": jnp.asarray(_np(sd[f"{prefix}.weight_hh"]).T),
        "b_ih": jnp.asarray(_np(sd[f"{prefix}.bias_ih"])),
        "b_hh": jnp.asarray(_np(sd[f"{prefix}.bias_hh"])),
    }


# ---------------------------------------------------------------------------
# ConvNeXt backbone
# ---------------------------------------------------------------------------

def port_convnext_features(
    sd: Mapping[str, Any],
    prefix: str = "",
    depths=(3, 3, 27, 3),
) -> Dict:
    """torchvision ``features.*`` (optionally under ``prefix``, e.g. the
    reference Encoder saves under ``convnext.``) -> ConvNeXtFeatures params."""
    p = prefix
    out: Dict[str, Any] = {
        "features_0": {
            "conv": _conv(sd, f"{p}0.0"),
            "LayerNorm_0": _flax_ln(sd, f"{p}0.1"),
        }
    }
    for s, depth in enumerate(depths):
        blocks = []
        for b in range(depth):
            base = f"{p}{2 * s + 1}.{b}"
            blocks.append(
                {
                    "dwconv": _conv(sd, f"{base}.block.0"),
                    "LayerNorm_0": _flax_ln(sd, f"{base}.block.2"),
                    "pw1": {
                        "kernel": jnp.asarray(_np(sd[f"{base}.block.3.weight"]).T),
                        "bias": jnp.asarray(_np(sd[f"{base}.block.3.bias"])),
                    },
                    "pw2": {
                        "kernel": jnp.asarray(_np(sd[f"{base}.block.5.weight"]).T),
                        "bias": jnp.asarray(_np(sd[f"{base}.block.5.bias"])),
                    },
                    "layer_scale": jnp.asarray(
                        _np(sd[f"{base}.layer_scale"]).reshape(-1)
                    ),
                }
            )
        # Stages run as nn.scan over stacked block params (convnext.py Stage).
        out[f"features_{2 * s + 1}"] = {
            "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
        }
        if s < len(depths) - 1:
            out[f"features_{2 * s + 2}"] = {
                "LayerNorm_0": _flax_ln(sd, f"{p}{2 * s + 2}.0"),
                "conv": _conv(sd, f"{p}{2 * s + 2}.1"),
            }
    return out


def port_encoder(sd: Mapping[str, Any], depths=(3, 3, 27, 3)) -> Dict:
    """Reference Encoder state_dict (keys ``convnext.*``) -> ConvNeXtEncoder
    flax params ({'convnext': ...})."""
    return {"convnext": port_convnext_features(sd, prefix="convnext.", depths=depths)}


def load_pretrained_backbone(path: str, depths=(3, 3, 27, 3)) -> Dict:
    """Load pretrained ConvNeXt backbone weights -> ConvNeXtFeatures params.

    The reference trains on torchvision ``convnext_base(IMAGENET1K_V1)``
    (models/encoder.py:18); this is the init path that gives BLEU parity a
    chance.  Accepts:

    - ``.npz``: torchvision feature-keyed arrays, as written by
      ``build_data port-backbone`` (torch-free load path);
    - torch files (``.pth``/``.pt``/``.pth.tar``/``.bin``): a torchvision
      ``convnext_base`` model/state_dict (keys ``features.*``), a wrapper
      dict with ``state_dict``/``model``, or a bare features dict.
    """
    if path.endswith(".npz"):
        sd: Dict[str, Any] = dict(np.load(path))
    else:
        sd = _load_torch_state_dict(path)
    if any(k.startswith("features.") for k in sd):
        sd = {
            k[len("features."):]: v
            for k, v in sd.items()
            if k.startswith("features.")
        }
    return port_convnext_features(sd, depths=depths)


def _load_torch_state_dict(path: str) -> Dict[str, Any]:
    """torch.load + unwrap: pickled nn.Module -> state_dict; wrapper dicts
    keyed ``state_dict``/``model`` -> inner dict.  The single place this
    policy lives (load_pretrained_backbone and convert_backbone_to_npz)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):  # a full nn.Module was pickled
        obj = obj.state_dict()
    for wrapper in ("state_dict", "model"):
        if isinstance(obj, dict) and isinstance(obj.get(wrapper), dict):
            obj = obj[wrapper]
    return dict(obj)


def convert_backbone_to_npz(src: str, out: str) -> None:
    """Torch ``convnext_base`` checkpoint -> ``.npz`` of numpy arrays so
    training hosts never need torch (``build_data port-backbone``)."""
    obj = _load_torch_state_dict(src)
    np.savez(out, **{k: _np(v) for k, v in obj.items()})


# ---------------------------------------------------------------------------
# Decoders
# ---------------------------------------------------------------------------

def port_lstm_attention_decoder(sd: Mapping[str, Any]) -> Dict:
    """Reference DecoderWithAttention state_dict (decoder.py) -> params."""
    return {
        "embedding": jnp.asarray(_np(sd["embedding.weight"])),
        "attention": {
            "encoder_att": _lin(sd, "attention.encoder_att"),
            "decoder_att": _lin(sd, "attention.decoder_att"),
            "full_att": _lin(sd, "attention.full_att"),
        },
        "init_h": _lin(sd, "init_h"),
        "init_c": _lin(sd, "init_c"),
        "f_beta": _lin(sd, "f_beta"),
        "lstm": _lstm(sd, "decode_step"),
        "fc": _lin(sd, "fc"),
    }


def port_lstm_no_attention_decoder(sd: Mapping[str, Any]) -> Dict:
    """Reference DecoderWithoutAttention state_dict (lstmNoAttention.py)."""
    return {
        "embedding": jnp.asarray(_np(sd["embedding.weight"])),
        "init_h": _lin(sd, "init_h"),
        "init_c": _lin(sd, "init_c"),
        "lstm": _lstm(sd, "decode_step"),
        "fc": _lin(sd, "fc"),
    }


def port_transformer_decoder(sd: Mapping[str, Any], num_layers: int = 6) -> Dict:
    """Reference TransformerDecoder / TransformerDecoderForAttentionViz
    state_dicts -> params.  Handles both layer naming schemes
    (``transformer_decoder.layers.N`` and ``decoder_layers.N`` — subsuming the
    reference's remap_transformer_decoder_keys, caption.py:418-430)."""
    if any(k.startswith("transformer_decoder.layers.0.") for k in sd):
        layer_prefix = "transformer_decoder.layers"
    elif any(k.startswith("decoder_layers.0.") for k in sd):
        layer_prefix = "decoder_layers"
    else:
        raise KeyError("no transformer decoder layers found in state dict")

    layers = []
    for i in range(num_layers):
        base = f"{layer_prefix}.{i}"
        layers.append(
            {
                "self_attn": _mha(sd, f"{base}.self_attn"),
                "cross_attn": _mha(sd, f"{base}.multihead_attn"),
                "linear1": _lin(sd, f"{base}.linear1"),
                "linear2": _lin(sd, f"{base}.linear2"),
                "norm1": _norm(sd, f"{base}.norm1"),
                "norm2": _norm(sd, f"{base}.norm2"),
                "norm3": _norm(sd, f"{base}.norm3"),
            }
        )
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    out = {
        "embedding": jnp.asarray(_np(sd["embedding.weight"])),
        "layers": stacked,
        "fc_out": _lin(sd, "fc_out"),
    }
    if "encoder_proj.weight" in sd:
        out["encoder_proj"] = _lin(sd, "encoder_proj")
    return out


def port_reference_checkpoint(
    path: str, decoder_type: str, num_layers: int = 6, depths=(3, 3, 27, 3)
):
    """Load a full reference .pth.tar checkpoint (utils/utils.py:195-224
    payload) and port encoder+decoder.  Requires torch for unpickling.
    ``depths`` must match the checkpoint's backbone (reference: ConvNeXt-Base
    (3,3,27,3); reduced for the cross-framework parity artifacts)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    enc_params = port_encoder(ckpt["encoder"], depths=depths)
    dec_sd = ckpt["decoder"]
    # DDP checkpoints may carry a 'module.' prefix (trainMultiGPU.py:319-320
    # strips it at save; be lenient anyway).
    dec_sd = {re.sub(r"^module\.", "", k): v for k, v in dec_sd.items()}
    if decoder_type == "lstm":
        dec_params = port_lstm_attention_decoder(dec_sd)
    elif decoder_type == "lstm_no_attention":
        dec_params = port_lstm_no_attention_decoder(dec_sd)
    else:
        dec_params = port_transformer_decoder(dec_sd, num_layers)
    meta = {
        "epoch": ckpt.get("epoch"),
        "epochs_since_improvement": ckpt.get("epochsSinceImprovement"),
        "bleu4": ckpt.get("bleu-4"),
    }
    return enc_params, dec_params, meta
