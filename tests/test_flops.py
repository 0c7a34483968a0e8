"""Analytic FLOP accounting (eval/flops.py) sanity checks."""

import numpy as np

from tpu_captioner.eval.flops import (
    DecoderDims,
    convnext_forward_flops,
    convnext_train_flops,
    eval_step_flops,
    lstm_forward_flops,
    mfu,
    peak_flops_per_chip,
    train_step_flops,
    transformer_forward_flops,
)


def test_convnext_matches_published_count():
    """torchvision documents ConvNeXt-Base at 15.36 GFLOPS @224 in the
    MACs-as-1 convention; ours is the 2xMAC convention => 30.72G."""
    got = convnext_forward_flops(224)
    assert abs(got - 2 * 15.36e9) / (2 * 15.36e9) < 0.01, got / 1e9


def test_frozen_vs_finetune_train_flops():
    frozen = convnext_train_flops(train_encoder=False)
    ft5 = convnext_train_flops(train_encoder=True, starting_layer=5)
    ft0 = convnext_train_flops(train_encoder=True, starting_layer=0)
    fwd = convnext_forward_flops()
    assert frozen == fwd
    assert fwd < ft5 < ft0 == 3 * fwd
    # Children 5..7 (stage 3 + downsample + stage 4) dominate ConvNeXt-Base:
    # fine-tuning them should cost roughly 2x extra of more than half the net.
    assert ft5 > 2 * fwd


def test_train_step_composition():
    ts = train_step_flops(32, 9490, decoder="transformer")
    dd = DecoderDims(vocab_size=9490)
    want = 32 * (convnext_forward_flops() + 3 * transformer_forward_flops(dd))
    assert ts == want
    # LSTM decoder counts differ from the transformer's.
    assert train_step_flops(32, 9490, decoder="lstm") != ts
    assert lstm_forward_flops(dd, attention=True) > lstm_forward_flops(
        dd, attention=False
    )


def test_eval_cheaper_than_train():
    assert eval_step_flops(32, 9490) < train_step_flops(32, 9490)


def test_mfu_unknown_chip_is_none():
    # Tests run on CPU: no TPU peak entry -> None, never a bogus number.
    assert peak_flops_per_chip() is None
    assert mfu(1e12, 0.01) is None


def test_tiny_config_scales():
    small = train_step_flops(
        8, 100, image_size=32, depths=(1, 1, 1, 1), dims=(8, 12, 16, 24),
        seq_len=14, embed_dim=16, decoder_dim=20, num_layers=2,
    )
    assert 0 < small < train_step_flops(32, 9490)
