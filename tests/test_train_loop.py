"""Integration tests: train steps, fine-tuning masks, full Trainer loop with
checkpoint/resume, and 8-way data-parallel equivalence."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_captioner.core.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from tpu_captioner.data.build import build_synthetic_dataset
from tpu_captioner.data.dataset import CaptionDataset, iterate_batches
from tpu_captioner.data.loader import device_put_batch
from tpu_captioner.parallel.mesh import make_mesh
from tpu_captioner.train.loop import Trainer
from tpu_captioner.train.model import CaptionModel
from tpu_captioner.train.state import TrainState, make_optimizer
from tpu_captioner.train.steps import make_eval_step, make_train_step

BASE = "synthetic_5_cap_per_img_1_min_word_freq"
MAXLEN = 12  # words; encoded length 14


def tiny_model_cfg(vocab_size, decoder="transformer"):
    return ModelConfig(
        decoder=decoder,
        vocab_size=vocab_size,
        embed_dim=16,
        attention_dim=12,
        decoder_dim=20,
        num_heads=4,
        num_layers=2,
        max_len=MAXLEN + 2,
        encoder_dim=24,
        encoder_depths=(1, 1, 1, 1),
        encoder_dims=(8, 12, 16, 24),
    )


def tiny_train_cfg(**kw):
    base = dict(
        epochs=2, batch_size=8, max_decode_len=MAXLEN + 1,
        fine_tune_epoch=100, print_freq=1000,
    )
    base.update(kw)
    return TrainConfig(**base)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    build_synthetic_dataset(
        str(d),
        num_images={"TRAIN": 16, "VAL": 8, "TEST": 8},
        max_len=MAXLEN,
        image_size=32,
    )
    return str(d)


def first_batch(dataset_dir, split="TRAIN", n=8):
    ds = CaptionDataset(dataset_dir, BASE, split)
    batch = next(iterate_batches(ds, n, epoch=0, shuffle=False))
    return device_put_batch(batch, None), ds


def make_model_and_state(dataset_dir, decoder="transformer", tc=None):
    from tpu_captioner.data.vocab import load_word_map, special_ids

    wm = load_word_map(os.path.join(dataset_dir, f"WORDMAP_{BASE}.json"))
    tc = tc or tiny_train_cfg()
    model = CaptionModel(tiny_model_cfg(len(wm), decoder))
    params = model.init_params(jax.random.PRNGKey(0), image_size=32)
    dec_opt = make_optimizer(tc.decoder_lr, tc.grad_clip)
    enc_opt = make_optimizer(tc.encoder_lr, tc.grad_clip)
    state = TrainState.create(params, dec_opt, enc_opt)
    return model, state, dec_opt, enc_opt, tc, special_ids(wm)


def test_tf_train_step_reduces_loss(dataset_dir):
    batch, _ = first_batch(dataset_dir)
    model, state, dec_opt, enc_opt, tc, wid = make_model_and_state(dataset_dir)
    step = make_train_step(
        model, tc, wid, dec_opt, enc_opt, teacher_forcing=True, train_encoder=False
    )
    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_rollout_train_step_runs(dataset_dir):
    batch, _ = first_batch(dataset_dir)
    model, state, dec_opt, enc_opt, tc, wid = make_model_and_state(
        dataset_dir, decoder="lstm"
    )
    step = make_train_step(
        model, tc, wid, dec_opt, enc_opt, teacher_forcing=False, train_encoder=False
    )
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert float(m["tokens"]) > 0


def test_frozen_encoder_params_unchanged(dataset_dir):
    batch, _ = first_batch(dataset_dir)
    model, state, dec_opt, enc_opt, tc, wid = make_model_and_state(dataset_dir)
    step = make_train_step(
        model, tc, wid, dec_opt, enc_opt, teacher_forcing=True, train_encoder=False
    )
    enc_before = jax.device_get(state.params["encoder"])
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    enc_after = jax.device_get(state.params["encoder"])
    for a, b in zip(
        jax.tree_util.tree_leaves(enc_before), jax.tree_util.tree_leaves(enc_after)
    ):
        np.testing.assert_array_equal(a, b)


def test_finetune_updates_only_unlocked_layers(dataset_dir):
    batch, _ = first_batch(dataset_dir)
    tc = tiny_train_cfg(starting_layer=5)
    model, state, dec_opt, enc_opt, _, wid = make_model_and_state(dataset_dir, tc=tc)
    step = make_train_step(
        model, tc, wid, dec_opt, enc_opt, teacher_forcing=True, train_encoder=True
    )
    enc_before = jax.device_get(state.params["encoder"])
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    enc_after = jax.device_get(state.params["encoder"])
    changed = {}
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(enc_before)[0],
        jax.tree_util.tree_flatten_with_path(enc_after)[0],
    ):
        name = jax.tree_util.keystr(kp)
        child = int(name.split("features_")[1].split("'")[0])
        changed.setdefault(child, False)
        if not np.array_equal(a, b):
            changed[child] = True
    for child, did_change in changed.items():
        assert did_change == (child >= 5), (child, did_change)


def test_eval_step_outputs(dataset_dir):
    batch, _ = first_batch(dataset_dir, split="VAL")
    model, state, dec_opt, enc_opt, tc, wid = make_model_and_state(dataset_dir)
    eval_step = make_eval_step(model, tc, wid)
    aux = eval_step(state.params, batch)
    assert aux["sequences"].shape == (8, tc.max_decode_len)
    assert np.isfinite(float(aux["loss"]))
    # Deterministic: same output twice.
    aux2 = eval_step(state.params, batch)
    np.testing.assert_array_equal(
        np.asarray(aux["sequences"]), np.asarray(aux2["sequences"])
    )


@pytest.mark.slow
def test_trainer_full_run_and_resume(dataset_dir, tmp_path):
    exp = ExperimentConfig(
        data=DataConfig(batch_size=8, image_size=32),
        model=tiny_model_cfg(0),
        train=tiny_train_cfg(
            epochs=1,
            checkpoint_dir=str(tmp_path / "ckpt"),
            results_dir=str(tmp_path / "results"),
        ),
    )
    trainer = Trainer(exp, dataset_dir, BASE, verbose=False)
    results = trainer.run()
    assert len(results) == 1
    row = results[0]
    for k in ("trainLoss", "valLoss", "bleu1", "bleu4", "trainBatchTime"):
        assert k in row
    csv = trainer.write_results_csv()
    assert csv and os.path.exists(csv)

    # Resume from the saved checkpoint: epoch continues at 1.
    from tpu_captioner.train.checkpoint import checkpoint_name

    name = checkpoint_name(BASE, False, exp.train.starting_layer, exp.train.encoder_lr, None)
    exp2 = ExperimentConfig(
        data=DataConfig(batch_size=8, image_size=32),
        model=tiny_model_cfg(0),
        train=tiny_train_cfg(
            epochs=2,
            checkpoint=str(tmp_path / "ckpt" / name),
            checkpoint_dir=str(tmp_path / "ckpt"),
            results_dir=str(tmp_path / "results"),
        ),
    )
    trainer2 = Trainer(exp2, dataset_dir, BASE, verbose=False)
    assert trainer2.start_epoch == 1
    assert len(trainer2.results) == 1
    results2 = trainer2.run()
    assert len(results2) == 2


@pytest.mark.slow
def test_trainer_resume_mid_finetune(dataset_dir, tmp_path):
    """Resume from a checkpoint saved AFTER the fine-tune unlock: the restored
    run must (a) re-derive fine_tune_encoder=True (reference train.py:128-134),
    (b) restore the encoder optimizer state across the unlock boundary without
    pytree-shape mismatch, and (c) keep updating encoder params."""
    common = dict(
        data=DataConfig(batch_size=8, image_size=32),
        model=tiny_model_cfg(0),
    )
    tr = dict(
        checkpoint_dir=str(tmp_path / "ckpt"),
        results_dir=str(tmp_path / "results"),
        fine_tune_epoch=1,  # unlock happens at epoch 1
        starting_layer=5,
    )
    exp = ExperimentConfig(
        train=tiny_train_cfg(epochs=2, **tr), **common
    )
    trainer = Trainer(exp, dataset_dir, BASE, verbose=False)
    assert not trainer.fine_tune_encoder
    trainer.run()  # epochs 0 (frozen) and 1 (fine-tuning)
    assert trainer.fine_tune_encoder

    from tpu_captioner.train.checkpoint import checkpoint_name

    name = checkpoint_name(
        BASE, False, exp.train.starting_layer, exp.train.encoder_lr, None
    )
    exp2 = ExperimentConfig(
        train=tiny_train_cfg(
            epochs=3, checkpoint=str(tmp_path / "ckpt" / name), **tr
        ),
        **common,
    )
    trainer2 = Trainer(exp2, dataset_dir, BASE, verbose=False)
    assert trainer2.start_epoch == 2
    assert trainer2.fine_tune_encoder  # re-derived from start_epoch > 1
    enc_before = jax.device_get(trainer2.state.params["encoder"])
    results = trainer2.run()  # one more epoch, fine-tuning from step 0
    assert len(results) == 3
    enc_after = jax.device_get(trainer2.state.params["encoder"])
    changed = any(
        not np.array_equal(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(enc_before),
            jax.tree_util.tree_leaves(enc_after),
        )
    )
    assert changed, "encoder params did not update after mid-fine-tune resume"


def test_trainer_finetune_model_runs_stage4_on_xla(dataset_dir, tmp_path):
    """Fine-tune steps use per-stage kernel selection (stage 4 on XLA — its
    weight-grad stack OOMs scoped VMEM in the backward scan); explicit
    per-stage configs are respected as given."""
    import dataclasses as _dc

    # Mode resolution (construction only — no forward, so 'on' is safe on
    # the CPU backend here).
    m = CaptionModel(_dc.replace(tiny_model_cfg(40), use_pallas="on"))
    assert m.encoder.pallas_mode == "mlp"
    m_ft = CaptionModel(
        _dc.replace(tiny_model_cfg(40), use_pallas=("on", "on", "on", "off"))
    )
    assert m_ft.encoder.pallas_mode == ("mlp", "mlp", "mlp", "off")

    # Trainer wiring ('auto' resolves to 'off' on CPU; what matters is that
    # the fine-tune model is the per-stage variant and eval stays XLA).
    exp = ExperimentConfig(
        data=DataConfig(batch_size=8, image_size=32),
        model=tiny_model_cfg(0),
        train=tiny_train_cfg(
            epochs=1,
            checkpoint_dir=str(tmp_path / "ckpt"),
            results_dir=str(tmp_path / "results"),
        ),
    )
    tr = Trainer(exp, dataset_dir, BASE, verbose=False)
    assert tr.ft_model.encoder.pallas_mode == ("off", "off", "off", "off")
    # Eval shares the train encoder-kernel policy ('auto' -> 'off' on CPU;
    # 'mlp' on TPU — the fused encoder wins in eval programs too, r3).
    assert tr.eval_model.encoder.pallas_mode == "off"

    explicit = _dc.replace(tiny_model_cfg(0), use_pallas=("off", "off", "off", "off"))
    tr2 = Trainer(_dc.replace(exp, model=explicit), dataset_dir, BASE, verbose=False)
    assert tr2.ft_model is tr2.model  # user's per-stage choice wins


def test_finetune_encoder_remat_policy(dataset_dir, tmp_path):
    """Fine-tune remat defaults are dtype-aware (round-5 on-chip A/B):
    bf16 'auto' -> 'save_mlp_in' (60.9 vs 62.5 ms/step), f32 'auto' stays
    plain remat (save_mlp_in measured 465.4 vs 68.8 ms/step at f32 — the
    454 MB of saved residuals flips XLA's placement).  Explicit values
    always win."""
    import dataclasses as _dc

    from tpu_captioner.train.model import finetune_encoder_remat

    assert finetune_encoder_remat("auto", "bfloat16") == "save_mlp_in"
    assert finetune_encoder_remat("auto", "float32") == "auto"
    assert finetune_encoder_remat("off", "bfloat16") == "off"
    assert finetune_encoder_remat("save_mlp_in", "float32") == "save_mlp_in"

    exp = ExperimentConfig(
        data=DataConfig(batch_size=8, image_size=32),
        model=_dc.replace(tiny_model_cfg(0), compute_dtype="bfloat16"),
        train=tiny_train_cfg(
            epochs=1,
            checkpoint_dir=str(tmp_path / "ckpt"),
            results_dir=str(tmp_path / "results"),
        ),
    )
    tr = Trainer(exp, dataset_dir, BASE, verbose=False)
    assert tr.ft_model.encoder.remat == "save_mlp_in"
    assert tr.model.encoder.remat == "auto"  # frozen/TF model untouched

    f32 = _dc.replace(exp, model=tiny_model_cfg(0))
    tr2 = Trainer(f32, dataset_dir, BASE, verbose=False)
    assert tr2.ft_model.encoder.remat == "auto"


@pytest.mark.slow
def test_data_parallel_matches_single_device(dataset_dir):
    batch_host, _ = first_batch(dataset_dir)
    model, state, dec_opt, enc_opt, tc, wid = make_model_and_state(dataset_dir)

    step1 = make_train_step(
        model, tc, wid, dec_opt, enc_opt, teacher_forcing=True, train_encoder=False
    )
    _, m1 = step1(state, batch_host, jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    model2, state2, dec_opt2, enc_opt2, _, _ = make_model_and_state(dataset_dir)
    ds = CaptionDataset(dataset_dir, BASE, "TRAIN")
    batch8 = next(iterate_batches(ds, 8, epoch=0, shuffle=False))
    batch8 = device_put_batch(batch8, mesh)
    step8 = make_train_step(
        model2, tc, wid, dec_opt2, enc_opt2,
        teacher_forcing=True, train_encoder=False, mesh=mesh,
    )
    _, m8 = step8(state2, batch8, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-5)
    assert int(m1["tokens"]) == int(m8["tokens"])


# slow: scheduled sampling is an extra beyond the reference surface; ~22 s compile.
@pytest.mark.slow
def test_scheduled_sampling_prob1_matches_teacher_forcing(dataset_dir):
    """With teacher_prob=1 every rollout input is the ground-truth token, so
    deterministic rollout logits must equal the TF parallel pass step for
    step (transformer: KV-cache == full pass; LSTM: same recurrence)."""
    import jax.numpy as jnp

    for decoder in ("transformer", "lstm"):
        model, state, *_ = make_model_and_state(dataset_dir, decoder=decoder)
        batch, _ = first_batch(dataset_dir)
        enc = model.encode(state.params, batch["images"])
        caps = batch["captions"]
        T = caps.shape[1] - 1
        tf_logits, _ = model.tf_forward(state.params, enc, caps)
        ro_logits, seqs, _ = model.rollout(
            state.params, enc, 1, 2, T,
            rng=jax.random.PRNGKey(0), deterministic=True,
            teacher_tokens=caps, teacher_prob=1.0,
        )
        # Compare only within each caption (t < caplen-1): beyond it the
        # teacher feeds <pad> tokens that the TF pass masks out of self-attn
        # (key padding mask) while rollouts never mask — the same asymmetry
        # the reference has between its TF and no-TF paths.  Also stop at the
        # rollout's decode length (outputs are zeroed after <end>).
        from tpu_captioner.eval.metrics import decode_lengths_from_sequences

        lengths = np.asarray(decode_lengths_from_sequences(seqs, 2, T))
        caplens = np.asarray(batch["caplens"])
        tf_np, ro_np = np.asarray(tf_logits), np.asarray(ro_logits)
        for i in range(tf_np.shape[0]):
            n = min(lengths[i], caplens[i] - 1)
            np.testing.assert_allclose(
                ro_np[i, :n], tf_np[i, :n], atol=2e-4,
                err_msg=f"{decoder} row {i}",
            )
