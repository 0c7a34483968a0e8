"""Analytic model-FLOP accounting for MFU reporting.

Counts matmul/conv multiply-accumulate FLOPs (2 * MACs — the standard MFU
convention; elementwise/LN/softmax work is not counted) for the ConvNeXt
encoder and each decoder family, and turns measured step times into
model-FLOPs-utilization against the chip's peak.

Backward convention: training FLOPs = forward + 2x forward for every
parameter that receives a gradient, PLUS 2x forward for frozen layers the
input gradient must still flow through (none here: the encoder is the first
layer, so fully-frozen stages contribute forward only).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

# Peak dense-matmul throughput per chip, FLOP/s.  The bf16 MXU rate is the
# right MFU denominator for BOTH compute dtypes here: JAX's default matmul
# precision on TPU feeds f32 operands to the MXU as bfloat16 (one pass, f32
# accumulate), so "f32" steps execute matmuls at the bf16 rate.  The
# 'highest' entries are the 6-pass bf16x6 true-f32 rate, used only if a
# caller opts into lax.Precision.HIGHEST (this framework does not).
PEAK_FLOPS = {
    # device_kind substring: (default/bf16, f32-highest)
    "v5 lite": (197e12, 197e12 / 6),
    "v5e": (197e12, 197e12 / 6),
    "v5p": (459e12, 459e12 / 6),
    "v4": (275e12, 275e12 / 6),
    "v6 lite": (918e12, 918e12 / 6),
    "v6e": (918e12, 918e12 / 6),
}


def peak_flops_per_chip(precision: str = "default") -> Optional[float]:
    """Look up the current backend chip's peak; None when unknown (CPU)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, (default, highest) in PEAK_FLOPS.items():
        if key in kind:
            return highest if precision == "highest" else default
    return None


def convnext_forward_flops(
    image_size: int = 256,
    depths: Sequence[int] = (3, 3, 27, 3),
    dims: Sequence[int] = (128, 256, 512, 1024),
    per_stage: bool = False,
):
    """Forward matmul/conv FLOPs per image; per_stage=True returns a list of
    (stem+downsample, stage) contributions indexed like torchvision's 8
    feature children (reference models/encoder.py:19)."""
    h = w = image_size // 4
    children = [2 * h * w * dims[0] * (4 * 4 * 3)]  # features_0 stem conv
    for s, (n, d) in enumerate(zip(depths, dims)):
        if s > 0:
            h, w = h // 2, w // 2
            children.append(2 * h * w * d * (2 * 2 * dims[s - 1]))  # downsample
        # block: dwconv 7x7 (49*d MACs/px) + pw 4x expand + pw project
        block = 2 * h * w * (49 * d + 4 * d * d + 4 * d * d)
        children.append(n * block)
    return children if per_stage else sum(children)


def convnext_train_flops(
    image_size: int = 256,
    depths: Sequence[int] = (3, 3, 27, 3),
    dims: Sequence[int] = (128, 256, 512, 1024),
    train_encoder: bool = False,
    starting_layer: int = 5,
) -> int:
    """Per-image encoder FLOPs in one train step.  Frozen: forward only.
    Fine-tuning children >= starting_layer (reference encoder.py:29-34):
    those children add 2x forward for the backward pass."""
    children = convnext_forward_flops(image_size, depths, dims, per_stage=True)
    total = sum(children)
    if train_encoder:
        total += 2 * sum(children[starting_layer:])
    return total


@dataclass
class DecoderDims:
    vocab_size: int
    embed_dim: int = 512
    decoder_dim: int = 512  # ffn width (transformer) / LSTM hidden
    num_layers: int = 6
    seq_len: int = 52
    mem_len: int = 49
    encoder_dim: int = 1024
    attention_dim: int = 512  # LSTM additive-attention width


def transformer_forward_flops(d: DecoderDims) -> int:
    """Per-sequence forward FLOPs of the reference transformer decoder
    (models/transformerDecoder.py:82-108): encoder projection, 6 layers of
    self-attn + cross-attn + FFN, vocab head."""
    L, M, e, f, V = d.seq_len, d.mem_len, d.embed_dim, d.decoder_dim, d.vocab_size
    total = 2 * M * d.encoder_dim * e  # encoder_proj (per sequence)
    per_layer = (
        4 * 2 * L * e * e        # self-attn q,k,v,out projections
        + 2 * 2 * L * L * e      # self-attn scores + weighted values
        + 2 * 2 * L * e * e      # cross-attn q,out
        + 2 * 2 * M * e * e      # cross-attn k,v over memory
        + 2 * 2 * L * M * e      # cross-attn scores + weighted values
        + 2 * 2 * L * e * f      # FFN two matmuls
    )
    total += d.num_layers * per_layer
    total += 2 * L * e * V  # vocab head
    return total


def lstm_forward_flops(d: DecoderDims, attention: bool = True) -> int:
    """Per-sequence forward FLOPs of the LSTM decoders (models/decoder.py /
    lstmNoAttention.py): per step, LSTMCell (4 gates), additive attention
    over M pixels, f_beta gate, vocab head.  The attention's encoder-side
    projection is counted ONCE per sequence — the implementation hoists it
    out of the time loop (models/lstm.py), so the executed program does not
    repeat it per step."""
    L, M, e, hdim, V = d.seq_len, d.mem_len, d.embed_dim, d.decoder_dim, d.vocab_size
    enc = d.encoder_dim
    in_dim = e + (enc if attention else 0)
    per_step = 2 * 4 * hdim * (in_dim + hdim)  # LSTMCell
    if attention:
        att = d.attention_dim
        per_step += 2 * hdim * att  # decoder projection
        per_step += 2 * M * att  # scores
        per_step += 2 * M * enc  # attention-weighted context sum
        per_step += 2 * hdim * enc  # f_beta gate projection
        # (the elementwise sigmoid-gate multiply on the context is excluded,
        # matching the transformer path's matmul-only convention)
    per_step += 2 * hdim * V  # vocab head
    total = L * per_step
    if attention:
        total += 2 * M * enc * d.attention_dim  # hoisted encoder projection
        total += 2 * 2 * enc * hdim  # init_h / init_c from mean encoder out
    return total


def train_step_flops(
    batch_size: int,
    vocab_size: int,
    decoder: str = "transformer",
    image_size: int = 256,
    depths: Sequence[int] = (3, 3, 27, 3),
    dims: Sequence[int] = (128, 256, 512, 1024),
    train_encoder: bool = False,
    starting_layer: int = 5,
    seq_len: int = 52,
    embed_dim: int = 512,
    decoder_dim: int = 512,
    num_layers: int = 6,
    encoded_image_size: int = 7,
) -> int:
    """Model FLOPs of one TF train step (fwd + bwd where trained)."""
    enc = convnext_train_flops(
        image_size, depths, dims, train_encoder, starting_layer
    )
    dd = DecoderDims(
        vocab_size=vocab_size,
        embed_dim=embed_dim,
        decoder_dim=decoder_dim,
        num_layers=num_layers,
        seq_len=seq_len,
        mem_len=encoded_image_size * encoded_image_size,
        encoder_dim=dims[-1],
    )
    if decoder in ("transformer", "transformer_attvis"):
        dec = transformer_forward_flops(dd)
    else:
        dec = lstm_forward_flops(dd, attention=(decoder == "lstm"))
    return batch_size * (enc + 3 * dec)


def eval_step_flops(
    batch_size: int,
    vocab_size: int,
    decoder: str = "transformer",
    image_size: int = 256,
    depths: Sequence[int] = (3, 3, 27, 3),
    dims: Sequence[int] = (128, 256, 512, 1024),
    decode_len: int = 51,
    embed_dim: int = 512,
    decoder_dim: int = 512,
    num_layers: int = 6,
    encoded_image_size: int = 7,
) -> int:
    """Model FLOPs of one greedy KV-cached rollout eval batch (useful-math
    convention: each new token attends to its prefix, so attention scores are
    counted at L^2/2; projections/FFN once per generated token)."""
    enc = convnext_forward_flops(image_size, depths, dims)
    L, M, e, f, V = (
        decode_len,
        encoded_image_size * encoded_image_size,
        embed_dim,
        decoder_dim,
        vocab_size,
    )
    if decoder in ("transformer", "transformer_attvis"):
        dec = 2 * M * dims[-1] * e
        per_layer = (
            4 * 2 * L * e * e
            + 2 * L * L * e  # causal prefix: L^2/2 keys x2 (scores+values)
            + 2 * 2 * L * e * e
            + 2 * 2 * M * e * e
            + 2 * 2 * L * M * e
            + 2 * 2 * L * e * f
        )
        dec += num_layers * per_layer + 2 * L * e * V
    else:
        dd = DecoderDims(
            vocab_size=vocab_size, embed_dim=e, decoder_dim=f,
            seq_len=L, mem_len=M, encoder_dim=dims[-1],
        )
        dec = lstm_forward_flops(dd, attention=(decoder == "lstm"))
    return batch_size * (enc + dec)


def mfu(model_flops: int, sec: float, precision: str = "default") -> Optional[float]:
    """Model-FLOPs utilization in [0,1]; None when the chip peak is unknown."""
    peak = peak_flops_per_chip(precision)
    if not peak or sec <= 0:
        return None
    return model_flops / sec / peak
