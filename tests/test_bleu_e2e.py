"""End-to-end quality: the full Trainer -> rollout -> BLEU pipeline must
produce real quality numbers, not just falling loss.

The learnable synthetic dataset renders class-coded images whose captions
are deterministic functions of the image content, so a correct pipeline
drives val BLEU-4 toward 1.0 on UNSEEN val images — the same acceptance
shape as the reference's committed test-*.csv rows (test.py:86-215), with
no COCO on the machine.
"""

import numpy as np
import pytest

from tpu_captioner.core.config import DataConfig, ExperimentConfig, TrainConfig
from tpu_captioner.data.build import build_synthetic_dataset
from tpu_captioner.train.loop import Trainer

from tests.test_train_loop import BASE, MAXLEN, tiny_model_cfg


@pytest.fixture(scope="module")
def learnable_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("learnable")
    build_synthetic_dataset(
        str(d), num_images={"TRAIN": 32, "VAL": 16}, max_len=MAXLEN,
        image_size=32, learnable=True, n_classes=8,
    )
    return str(d)


@pytest.mark.slow
def test_val_bleu4_reaches_threshold(learnable_dir, tmp_path):
    mc = tiny_model_cfg(0)
    mc.dropout = 0.0
    exp = ExperimentConfig(
        data=DataConfig(batch_size=8, image_size=32),
        model=mc,
        train=TrainConfig(
            epochs=16, batch_size=8, max_decode_len=MAXLEN + 1,
            fine_tune_epoch=1000, decoder_lr=3e-3, print_freq=10_000,
            early_stop_patience=1000,
            checkpoint_dir=str(tmp_path / "ckpt"),
            results_dir=str(tmp_path / "results"),
        ),
    )
    trainer = Trainer(exp, learnable_dir, BASE, verbose=False)
    results = trainer.run()
    # (measured: b4 ~0.85 by epoch 6, ~0.92 by 14 on this config)
    best = max(r["bleu4"] for r in results)
    assert best > 0.8, [round(r["bleu4"], 3) for r in results]
    assert trainer.best_bleu4 == best
    # BLEU-1 >= BLEU-4 by construction; both must be meaningfully high.
    assert max(r["bleu1"] for r in results) > 0.85
    # The quality numbers came from free-running decode on unseen images:
    # val loss must also have collapsed relative to epoch 0.
    assert results[-1]["valLoss"] < results[0]["valLoss"] * 0.5
