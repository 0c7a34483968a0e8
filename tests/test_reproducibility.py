"""Reproducibility-by-rerun and learning sanity.

The reference's QA relies on paired same-seed runs with identical metrics
CSVs (SURVEY.md §4.2).  Here that property is an actual test: two Trainer
runs with the same seed produce bit-identical losses/BLEU.  A second test
overfits a tiny dataset and checks the loss collapses — the framework
actually learns.
"""

import os

import numpy as np
import pytest

from tpu_captioner.core.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from tpu_captioner.data.build import build_synthetic_dataset
from tpu_captioner.train.loop import Trainer

BASE = "synthetic_5_cap_per_img_1_min_word_freq"
MAXLEN = 10


def make_exp(tmp_path, tag):
    return ExperimentConfig(
        data=DataConfig(batch_size=8, image_size=32),
        model=ModelConfig(
            decoder="transformer",
            embed_dim=16,
            decoder_dim=20,
            num_heads=4,
            num_layers=2,
            max_len=MAXLEN + 2,
            encoder_dim=24,
            encoder_depths=(1, 1),
            encoder_dims=(8, 24),
        ),
        train=TrainConfig(
            epochs=1, batch_size=8, max_decode_len=MAXLEN + 1,
            fine_tune_epoch=100, print_freq=1000,
            checkpoint_dir=str(tmp_path / f"ckpt{tag}"),
            results_dir=str(tmp_path / f"res{tag}"),
        ),
    )


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("repro")
    build_synthetic_dataset(
        str(d), num_images={"TRAIN": 16, "VAL": 8}, max_len=MAXLEN, image_size=32
    )
    return str(d)


@pytest.mark.slow
def test_same_seed_runs_are_identical(data_dir, tmp_path):
    r1 = Trainer(make_exp(tmp_path, "a"), data_dir, BASE, verbose=False).run()
    r2 = Trainer(make_exp(tmp_path, "b"), data_dir, BASE, verbose=False).run()
    for k in ("trainLoss", "trainTop5Acc", "valLoss", "bleu1", "bleu4"):
        assert r1[0][k] == r2[0][k], (k, r1[0][k], r2[0][k])


@pytest.mark.slow
def test_overfitting_tiny_dataset_reduces_loss(tmp_path):
    d = tmp_path / "learnable"
    build_synthetic_dataset(
        str(d), num_images={"TRAIN": 16, "VAL": 8}, max_len=MAXLEN,
        image_size=32, learnable=True,
    )
    exp = make_exp(tmp_path, "c")
    exp.model.dropout = 0.0
    exp.train = TrainConfig(
        epochs=12, batch_size=8, max_decode_len=MAXLEN + 1, fine_tune_epoch=100,
        decoder_lr=3e-3, print_freq=1000, early_stop_patience=100,
        checkpoint_dir=str(tmp_path / "ckptc"), results_dir=str(tmp_path / "resc"),
    )
    trainer = Trainer(exp, str(d), BASE, verbose=False)
    results = trainer.run()
    first, last = results[0]["trainLoss"], results[-1]["trainLoss"]
    assert last < first * 0.5, (first, last)
    # Greedy decode should start reproducing memorized captions -> BLEU-1 up.
    assert results[-1]["bleu1"] > results[0]["bleu1"]
