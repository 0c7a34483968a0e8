"""Profiling capability (SURVEY.md §5 tracing): the Trainer's optional
jax.profiler trace around early train steps must produce a trace artifact.

Validated on the CPU backend (the remote-TPU relay used for benches hangs
in jax.profiler, so CI-side CPU validation is the meaningful check of the
code path itself)."""

import os

import pytest

from tpu_captioner.core.config import (
    DataConfig,
    ExperimentConfig,
    TrainConfig,
)
from tpu_captioner.data.build import build_synthetic_dataset
from tpu_captioner.train.loop import Trainer

from tests.test_train_loop import BASE, MAXLEN, tiny_model_cfg, tiny_train_cfg


@pytest.mark.slow
def test_trainer_profiling_writes_trace(tmp_path):
    d = tmp_path / "data"
    build_synthetic_dataset(
        str(d), num_images={"TRAIN": 64, "VAL": 8}, max_len=MAXLEN, image_size=32
    )
    profile_dir = tmp_path / "trace"
    exp = ExperimentConfig(
        data=DataConfig(batch_size=8, image_size=32),
        model=tiny_model_cfg(0),
        train=tiny_train_cfg(
            epochs=1,
            checkpoint_dir=str(tmp_path / "ckpt"),
            results_dir=str(tmp_path / "results"),
        ),
    )
    # 64 train images * 5 captions / batch 8 = 40 batches > the i==6
    # stop-trace threshold inside train_epoch.
    trainer = Trainer(
        exp, str(d), BASE, verbose=False, profile_dir=str(profile_dir)
    )
    trainer.train_epoch(0)
    traces = [
        os.path.join(root, f)
        for root, _, files in os.walk(profile_dir)
        for f in files
    ]
    assert any(
        f.endswith((".xplane.pb", ".trace.json.gz", ".json.gz")) for f in traces
    ), traces
