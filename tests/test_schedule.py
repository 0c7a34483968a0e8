"""Training-schedule semantics (reference train.py:159-229) without heavy
compute: train/eval epochs are stubbed, the real Trainer.run() drives
patience, LR decay, early stop, and BEST-checkpoint bookkeeping."""

import os

import numpy as np
import pytest

from tests.test_reproducibility import BASE, MAXLEN, make_exp
from tpu_captioner.data.build import build_synthetic_dataset
from tpu_captioner.train.loop import Trainer
from tpu_captioner.train.state import get_lr


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sched")
    build_synthetic_dataset(
        str(d), num_images={"TRAIN": 8, "VAL": 8}, max_len=MAXLEN, image_size=32
    )
    return str(d)


def make_stubbed_trainer(tmp_path, data_dir, bleus, **train_kw):
    exp = make_exp(tmp_path, "s")
    for k, v in train_kw.items():
        setattr(exp.train, k, v)
    trainer = Trainer(exp, data_dir, BASE, verbose=False)
    it = iter(bleus)

    def fake_train_epoch(epoch):
        return {"loss": 1.0, "top5": 0.0, "batch_time": 0.0, "data_time": 0.0}

    def fake_evaluate(loader, epoch=0):
        b4 = next(it)
        return {"loss": 1.0, "top5": 0.0,
                "bleu1": b4, "bleu2": b4, "bleu3": b4, "bleu4": b4}

    trainer.train_epoch = fake_train_epoch
    trainer.evaluate = fake_evaluate
    return trainer


def test_early_stop_after_patience(tmp_path, data_dir):
    # Improvement at epoch 0, then stagnation: with patience 3 the loop must
    # run exactly 1 + 3 epochs then stop (train.py:169-170 semantics).
    bleus = [0.2] + [0.1] * 50
    t = make_stubbed_trainer(
        tmp_path, data_dir, bleus, epochs=50, early_stop_patience=3,
        checkpoint_dir=str(tmp_path / "ck"), results_dir=str(tmp_path / "rs"),
    )
    results = t.run()
    assert len(results) == 4
    assert t.epochs_since_improvement == 3
    assert t.best_bleu4 == 0.2


def test_lr_decays_every_8_stagnant_epochs(tmp_path, data_dir):
    bleus = [0.2] + [0.1] * 50
    t = make_stubbed_trainer(
        tmp_path, data_dir, bleus, epochs=50, early_stop_patience=20,
        decoder_lr=1e-4,
        checkpoint_dir=str(tmp_path / "ck2"), results_dir=str(tmp_path / "rs2"),
    )
    lrs = []
    real_train = t.train_epoch

    def tracking_train(epoch):
        lrs.append(get_lr(t.state.dec_opt_state))
        return real_train(epoch)

    t.train_epoch = tracking_train
    t.run()
    lrs = np.asarray(lrs)
    # Stagnation count hits 8 before epoch 9's train -> decay x0.8 there, and
    # again 8 stagnant epochs later (reference decays when count % 8 == 0).
    np.testing.assert_allclose(lrs[:9], 1e-4, rtol=1e-6)
    np.testing.assert_allclose(lrs[9:17], 0.8e-4, rtol=1e-6)
    np.testing.assert_allclose(lrs[17], 0.64e-4, rtol=1e-6)


def test_best_checkpoint_tracks_improvements(tmp_path, data_dir):
    bleus = [0.1, 0.3, 0.2, 0.4, 0.35]
    t = make_stubbed_trainer(
        tmp_path, data_dir, bleus, epochs=5, early_stop_patience=20,
        checkpoint_dir=str(tmp_path / "ck3"), results_dir=str(tmp_path / "rs3"),
    )
    t.run()
    assert t.best_bleu4 == 0.4
    assert t.epochs_since_improvement == 1
    best = [d for d in os.listdir(tmp_path / "ck3") if d.startswith("BEST_")]
    assert len(best) == 1
    import json

    with open(tmp_path / "ck3" / best[0] / "meta.json") as f:
        meta = json.load(f)
    assert meta["bleu4"] == 0.4 and meta["epoch"] == 3
