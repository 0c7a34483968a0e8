"""Pretrained-backbone initialization for training.

The reference always trains from torchvision convnext_base IMAGENET1K_V1
(models/encoder.py:18); these tests cover the equivalent init path here:
``--pretrainedEncoder`` -> ModelConfig.pretrained_encoder -> Trainer loads
the ported weights and can immediately run a fine-tune train step.
"""

import os

import numpy as np
import pytest

import jax

from tpu_captioner.core.config import DataConfig, ExperimentConfig
from tpu_captioner.data.build import build_synthetic_dataset
from tpu_captioner.models.port_torch import load_pretrained_backbone

from tests.test_train_loop import BASE, MAXLEN, tiny_model_cfg, tiny_train_cfg

DEPTHS = (1, 1, 1, 1)
DIMS = (8, 12, 16, 24)


def fake_torchvision_sd(depths=DEPTHS, dims=DIMS, seed=0):
    """A torchvision convnext state dict (``features.*`` naming) in numpy."""
    r = np.random.default_rng(seed)

    def arr(*shape):
        return r.normal(size=shape).astype(np.float32)

    sd = {
        "features.0.0.weight": arr(dims[0], 3, 4, 4),
        "features.0.0.bias": arr(dims[0]),
        "features.0.1.weight": arr(dims[0]),
        "features.0.1.bias": arr(dims[0]),
        # Non-feature keys must be ignored by the loader.
        "classifier.2.weight": arr(10, dims[-1]),
        "classifier.2.bias": arr(10),
    }
    for s, (depth, dim) in enumerate(zip(depths, dims)):
        for b in range(depth):
            base = f"features.{2 * s + 1}.{b}"
            sd[f"{base}.block.0.weight"] = arr(dim, 1, 7, 7)
            sd[f"{base}.block.0.bias"] = arr(dim)
            sd[f"{base}.block.2.weight"] = arr(dim)
            sd[f"{base}.block.2.bias"] = arr(dim)
            sd[f"{base}.block.3.weight"] = arr(4 * dim, dim)
            sd[f"{base}.block.3.bias"] = arr(4 * dim)
            sd[f"{base}.block.5.weight"] = arr(dim, 4 * dim)
            sd[f"{base}.block.5.bias"] = arr(dim)
            sd[f"{base}.layer_scale"] = np.full((dim, 1, 1), 1e-6, np.float32)
        if s < len(depths) - 1:
            sd[f"features.{2 * s + 2}.0.weight"] = arr(dims[s])
            sd[f"features.{2 * s + 2}.0.bias"] = arr(dims[s])
            sd[f"features.{2 * s + 2}.1.weight"] = arr(dims[s + 1], dims[s], 2, 2)
            sd[f"features.{2 * s + 2}.1.bias"] = arr(dims[s + 1])
    return sd


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    build_synthetic_dataset(
        str(d), num_images={"TRAIN": 8, "VAL": 8, "TEST": 8},
        max_len=MAXLEN, image_size=32,
    )
    return str(d)


@pytest.fixture(scope="module")
def backbone_npz(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bb") / "convnext_tiny_test.npz")
    np.savez(path, **fake_torchvision_sd())
    return path


def _tiny_exp(dataset_dir, tmp_path, backbone_path):
    mc = tiny_model_cfg(0)
    mc.pretrained_encoder = backbone_path
    return ExperimentConfig(
        data=DataConfig(batch_size=8, image_size=32),
        model=mc,
        train=tiny_train_cfg(
            epochs=1,
            fine_tune_epoch=0,  # exercise the fine-tune mask from step one
            checkpoint_dir=str(tmp_path / "ckpt"),
            results_dir=str(tmp_path / "results"),
        ),
    )


@pytest.mark.slow
def test_trainer_inits_from_npz_and_finetunes(dataset_dir, tmp_path, backbone_npz):
    from tpu_captioner.train.loop import Trainer

    trainer = Trainer(
        _tiny_exp(dataset_dir, tmp_path, backbone_npz), dataset_dir, BASE,
        verbose=False,
    )
    want = load_pretrained_backbone(backbone_npz, depths=DEPTHS)
    got = trainer.state.params["encoder"]["convnext"]
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(want)[0],
        jax.tree_util.tree_flatten_with_path(got)[0],
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(kp)
        )
    # One full epoch with fine_tune_epoch=0: the ported backbone must survive
    # the train step with the fine-tune mask active (train_encoder=True).
    results = trainer.run()
    assert np.isfinite(results[0]["trainLoss"])
    after = trainer.state.params["encoder"]["convnext"]
    # Layers >= starting_layer must have moved off the pretrained weights.
    stem_same = np.array_equal(
        np.asarray(want["features_0"]["conv"]["kernel"]),
        np.asarray(after["features_0"]["conv"]["kernel"]),
    )
    top_same = np.array_equal(
        np.asarray(want["features_7"]["blocks"]["pw1"]["kernel"]),
        np.asarray(after["features_7"]["blocks"]["pw1"]["kernel"]),
    )
    assert stem_same and not top_same


# slow: error-message UX path; compiles a near-full backbone just to fail (~17 s).
@pytest.mark.slow
def test_wrong_size_backbone_fails_loudly(dataset_dir, tmp_path):
    from tpu_captioner.train.loop import Trainer

    bad = str(tmp_path / "bad.npz")
    np.savez(bad, **fake_torchvision_sd(dims=(8, 12, 16, 20)))
    with pytest.raises((ValueError, KeyError)):
        Trainer(_tiny_exp(dataset_dir, tmp_path, bad), dataset_dir, BASE,
                verbose=False)


def test_torch_checkpoint_path_matches_npz(tmp_path, backbone_npz):
    torch = pytest.importorskip("torch")

    sd = {k: torch.from_numpy(v) for k, v in fake_torchvision_sd().items()}
    pth = str(tmp_path / "backbone.pth")
    torch.save(sd, pth)
    a = load_pretrained_backbone(pth, depths=DEPTHS)
    b = load_pretrained_backbone(backbone_npz, depths=DEPTHS)
    for (kp, x), (_, y) in zip(
        jax.tree_util.tree_flatten_with_path(a)[0],
        jax.tree_util.tree_flatten_with_path(b)[0],
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # port-backbone converter round-trip (torch .pth -> .npz -> same tree).
    from tpu_captioner.models.port_torch import convert_backbone_to_npz

    out = str(tmp_path / "converted.npz")
    convert_backbone_to_npz(pth, out)
    c = load_pretrained_backbone(out, depths=DEPTHS)
    for (kp, x), (_, y) in zip(
        jax.tree_util.tree_flatten_with_path(a)[0],
        jax.tree_util.tree_flatten_with_path(c)[0],
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
