"""ConvNeXt backbone: torch-oracle parity via the weight porter.

The torch oracle recreates torchvision's convnext architecture (stem /
CNBlock / downsample, the modules the reference encoder wraps,
models/encoder.py:18-27) from public torch primitives, exports a
torchvision-style state_dict, and the porter maps it into the flax model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from tpu_captioner.models.convnext import (
    ConvNeXtFeatures,
    adaptive_avg_pool_nhwc,
)
from tpu_captioner.models.encoder import ConvNeXtEncoder, fine_tune_mask, preprocess_images
from tpu_captioner.models.port_torch import port_convnext_features, port_encoder

DEPTHS = (1, 1, 2, 1)
DIMS = (8, 16, 24, 32)


class TorchCNBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True),
        )
        self.ln = nn.LayerNorm(dim, eps=1e-6)
        self.pw1 = nn.Linear(dim, 4 * dim)
        self.pw2 = nn.Linear(4 * dim, dim)
        self.layer_scale = nn.Parameter(torch.full((dim, 1, 1), 1e-6))

    def forward(self, x):  # NCHW
        r = self.block[0](x).permute(0, 2, 3, 1)
        r = self.pw2(F.gelu(self.pw1(self.ln(r))))
        r = r.permute(0, 3, 1, 2)
        return x + self.layer_scale * r

    def export(self, sd, base):
        sd[f"{base}.block.0.weight"] = self.block[0].weight
        sd[f"{base}.block.0.bias"] = self.block[0].bias
        sd[f"{base}.block.2.weight"] = self.ln.weight
        sd[f"{base}.block.2.bias"] = self.ln.bias
        sd[f"{base}.block.3.weight"] = self.pw1.weight
        sd[f"{base}.block.3.bias"] = self.pw1.bias
        sd[f"{base}.block.5.weight"] = self.pw2.weight
        sd[f"{base}.block.5.bias"] = self.pw2.bias
        sd[f"{base}.layer_scale"] = self.layer_scale


class TorchConvNeXt(nn.Module):
    def __init__(self):
        super().__init__()
        torch.manual_seed(0)
        self.stem_conv = nn.Conv2d(3, DIMS[0], 4, stride=4)
        self.stem_ln = nn.LayerNorm(DIMS[0], eps=1e-6)
        self.stages = nn.ModuleList()
        self.down_ln = nn.ModuleList()
        self.down_conv = nn.ModuleList()
        for s, (d, dim) in enumerate(zip(DEPTHS, DIMS)):
            if s > 0:
                self.down_ln.append(nn.LayerNorm(DIMS[s - 1], eps=1e-6))
                self.down_conv.append(nn.Conv2d(DIMS[s - 1], dim, 2, stride=2))
            self.stages.append(nn.ModuleList([TorchCNBlock(dim) for _ in range(d)]))

    def forward(self, x):  # NCHW
        x = self.stem_conv(x)
        x = self.stem_ln(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        for s, stage in enumerate(self.stages):
            if s > 0:
                x = self.down_ln[s - 1](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                x = self.down_conv[s - 1](x)
            for blk in stage:
                x = blk(x)
        return x

    def export(self):
        sd = {
            "0.0.weight": self.stem_conv.weight,
            "0.0.bias": self.stem_conv.bias,
            "0.1.weight": self.stem_ln.weight,
            "0.1.bias": self.stem_ln.bias,
        }
        for s, stage in enumerate(self.stages):
            for b, blk in enumerate(stage):
                blk.export(sd, f"{2 * s + 1}.{b}")
            if s < len(self.stages) - 1:
                sd[f"{2 * s + 2}.0.weight"] = self.down_ln[s].weight
                sd[f"{2 * s + 2}.0.bias"] = self.down_ln[s].bias
                sd[f"{2 * s + 2}.1.weight"] = self.down_conv[s].weight
                sd[f"{2 * s + 2}.1.bias"] = self.down_conv[s].bias
        return sd


def test_features_match_torch_oracle():
    oracle = TorchConvNeXt().eval()
    params = port_convnext_features(oracle.export(), depths=DEPTHS)
    model = ConvNeXtFeatures(depths=DEPTHS, dims=DIMS)
    torch.manual_seed(1)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = oracle(x).permute(0, 2, 3, 1).numpy()
    got = model.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_init_param_tree_matches_ported_tree_structure():
    oracle = TorchCNBlock(8)  # just for seed stability; unused
    model = ConvNeXtFeatures(depths=DEPTHS, dims=DIMS)
    x = jnp.zeros((1, 3, 64, 64)).transpose(0, 2, 3, 1)
    init_params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    ported = port_convnext_features(TorchConvNeXt().export(), depths=DEPTHS)
    init_paths = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_flatten_with_path(init_params)[0]}
    port_paths = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_flatten_with_path(ported)[0]}
    assert init_paths == port_paths
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(init_params)[0],
        jax.tree_util.tree_flatten_with_path(ported)[0],
    ):
        assert a.shape == b.shape, f"{jax.tree_util.keystr(kp)}: {a.shape} vs {b.shape}"


def test_stochastic_depth_row_mode():
    model = ConvNeXtFeatures(depths=(2,), dims=(8,), sd_rate=0.9)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 3, 16, 16)).transpose(0, 2, 3, 1)
    params = model.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    # Fresh layer_scale is 1e-6, making residual branches (and hence the
    # stochastic-depth effect) invisible at f32; boost it for the test.
    params = jax.tree_util.tree_map_with_path(
        lambda kp, v: jnp.ones_like(v) if "layer_scale" in jax.tree_util.keystr(kp) else v,
        params,
    )
    det = model.apply({"params": params}, x, deterministic=True)
    tr = model.apply(
        {"params": params},
        x,
        deterministic=False,
        rngs={"stochastic_depth": jax.random.PRNGKey(2)},
    )
    # Training differs from eval; eval is deterministic.
    assert not np.allclose(np.asarray(det), np.asarray(tr))
    det2 = model.apply({"params": params}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))


def test_encoder_output_shape_and_finetune_mask():
    enc = ConvNeXtEncoder(dtype=jnp.float32)
    imgs = jnp.zeros((1, 64, 64, 3))
    variables = enc.init({"params": jax.random.PRNGKey(0)}, imgs)
    out = enc.apply(variables, imgs)
    assert out.shape == (1, 7, 7, 1024)

    params = variables["params"]
    mask_frozen = fine_tune_mask(params, fine_tune=False)
    assert not any(jax.tree_util.tree_leaves(mask_frozen))
    mask7 = fine_tune_mask(params, fine_tune=True, starting_layer=7)
    m = mask7["convnext"]
    # Only features_7 trainable.
    assert all(jax.tree_util.tree_leaves(m["features_7"]))
    for i in range(7):
        assert not any(jax.tree_util.tree_leaves(m[f"features_{i}"]))
    mask5 = fine_tune_mask(params, fine_tune=True, starting_layer=5)["convnext"]
    for i in (5, 6, 7):
        assert all(jax.tree_util.tree_leaves(mask5[f"features_{i}"]))


def test_preprocess_images_matches_reference_transform():
    from tpu_captioner.data.dataset import normalize_images_host

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    want = normalize_images_host(imgs)
    got = preprocess_images(jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_save_mlp_in_remat_grads_match_plain_remat():
    """encoder_remat='save_mlp_in' (save each block's dwconv output; the
    backward replays no forward) must produce the same values AND grads as
    the default full remat — it only changes what is stored vs recomputed."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))

    def loss(params, remat):
        model = ConvNeXtFeatures(depths=(2, 2), dims=(8, 16), remat=remat)
        return jnp.sum(model.apply({"params": params}, x) ** 2)

    params = ConvNeXtFeatures(depths=(2, 2), dims=(8, 16), remat="on").init(
        {"params": jax.random.PRNGKey(1)}, x
    )["params"]
    want_v, want_g = jax.value_and_grad(loss)(params, "on")
    got_v, got_g = jax.value_and_grad(loss)(params, "save_mlp_in")
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-6)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(want_g)[0],
        jax.tree_util.tree_flatten_with_path(got_g)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(kp),
        )
