"""Dropout mask pool (ops/dropout_mask.py + layers.MaskPool).

The TF train step's ~30M per-step mask bits come from ONE pooled draw on
TPU ('auto' policy) instead of ~38 per-site threefry draws.  These tests
pin the plumbing on the CPU fallback (threefry bits, identical pool
mechanics); the Pallas kernel itself has no CPU lowering (prng_seed) and
is validated by the AOT compile gate + on-chip A/B (BENCHMARKING.md
round 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_captioner.models.layers import MaskPool, dropout, mask_pool_scope
from tpu_captioner.ops.dropout_mask import random_mask_pool


def test_fallback_pool_rate_and_determinism():
    key = jax.random.PRNGKey(3)
    bits = random_mask_pool(key, 200_000, 0.7, on_tpu=False)
    assert bits.dtype == jnp.bool_ and bits.shape == (200_000,)
    rate = float(jnp.mean(bits))
    assert abs(rate - 0.7) < 0.01
    bits2 = random_mask_pool(key, 200_000, 0.7, on_tpu=False)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(bits2))


def test_keep_must_be_open_interval():
    key = jax.random.PRNGKey(0)
    for bad in (0.0, 1.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            random_mask_pool(key, 16, bad, on_tpu=False)


def test_pool_slices_are_disjoint_and_trace_ordered():
    bits = jnp.arange(12) % 3 == 0  # arbitrary pattern
    pool = MaskPool(bits)
    a = pool.take((2, 3))
    b = pool.take((6,))
    np.testing.assert_array_equal(np.asarray(a).ravel(), np.asarray(bits[:6]))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(bits[6:12]))


def test_pool_overdraw_raises_at_trace_time():
    pool = MaskPool(jnp.ones(8, bool))
    pool.take((6,))
    with pytest.raises(ValueError, match="exhausted"):
        pool.take((3,))


def test_pool_rate_mismatch_raises():
    pool = MaskPool(jnp.ones(8, bool), keep=0.5)
    with pytest.raises(ValueError, match="keep"):
        pool.take((2,), keep=0.9)


def test_dropout_consumes_active_pool_and_scales():
    x = jnp.ones((2, 4), jnp.float32)
    bits = jnp.array([1, 0, 1, 0, 1, 1, 0, 0], bool)
    with mask_pool_scope(MaskPool(bits, keep=0.5)):
        y = dropout(x, 0.5, rng=None, deterministic=False)
    expect = np.where(np.asarray(bits).reshape(2, 4), 2.0, 0.0)
    np.testing.assert_allclose(np.asarray(y), expect)
    # scope restored: outside, dropout needs a real key again
    y2 = dropout(x, 0.5, jax.random.PRNGKey(0), deterministic=False)
    assert y2.shape == x.shape


def test_pool_dropout_gradient_matches_explicit_mask():
    bits = jax.random.bernoulli(jax.random.PRNGKey(1), 0.5, (12,))

    def f_pool(x):
        with mask_pool_scope(MaskPool(bits, keep=0.5)):
            return jnp.sum(dropout(x, 0.5, None, False) ** 2)

    def f_explicit(x):
        return jnp.sum(jnp.where(bits, x / 0.5, 0.0) ** 2)

    x = jnp.arange(12, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_pool)(x)),
        np.asarray(jax.grad(f_explicit)(x)),
        rtol=1e-6,
    )


def test_pool_layer_scope_gives_each_layer_distinct_bits():
    """Inside a lax.scan over stacked layer params the body traces once;
    pool_layer_scope must stripe the pool so each layer slices its own
    bits (round-4 advisor: all layers reused one mask range)."""
    from tpu_captioner.models.layers import pool_layer_scope

    bits = jnp.asarray(np.random.default_rng(0).integers(0, 2, 64), bool)
    pool = MaskPool(bits)

    def body(carry, i):
        with pool_layer_scope(i, 3):
            m = pool.take((4,))
        return carry, m

    _, ms = jax.lax.scan(body, 0, jnp.arange(3))
    # One trace reserved 3 layers x 4 bits; each layer got its own stripe.
    assert pool.offset == 12
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(ms[i]), np.asarray(bits[4 * i : 4 * i + 4])
        )
    # Sites after the scope continue from the reserved region's end.
    tail = pool.take((4,))
    np.testing.assert_array_equal(np.asarray(tail), np.asarray(bits[12:16]))


def _tiny_model(dropout_masks, num_layers=2):
    from tpu_captioner.core.config import ModelConfig
    from tpu_captioner.train.model import CaptionModel

    return CaptionModel(ModelConfig(
        decoder="transformer", vocab_size=60, embed_dim=64, decoder_dim=64,
        attention_dim=64, num_heads=2, num_layers=num_layers,
        encoder_depths=(1, 1, 1, 1), encoder_dims=(16, 32, 64, 128),
        encoder_dim=128, dropout_masks=dropout_masks,
    ))


def test_pool_demand_scales_with_num_layers():
    """Counted demand must grow by exactly the per-layer site total per
    added layer — the regression the round-4 advisor asked for (demand was
    identical for 2 and 4 layers because the scan body traced once)."""
    from tpu_captioner.models.layers import mask_pool_scope
    from tpu_captioner.train.steps import _CountingPool

    B, T, E, H, P, D = 2, 12, 64, 2, 49, 64
    caps = jnp.ones((B, T), jnp.int32)
    enc_out = jnp.zeros((B, 7, 7, 128))

    def demand(num_layers):
        model = _tiny_model("pool", num_layers)
        params = model.init_params(jax.random.PRNGKey(0), image_size=32)
        cp = _CountingPool()
        with mask_pool_scope(cp):
            model.tf_forward(
                params, enc_out, caps,
                rng=jax.random.PRNGKey(1), deterministic=False,
            )
        return cp.total

    per_layer = (
        B * H * T * T      # self-attn probs
        + B * T * E        # dropout(self-attn out)
        + B * H * T * P    # cross-attn probs
        + B * T * E        # dropout(cross-attn out)
        + B * T * D        # FFN hidden
        + B * T * E        # dropout(FFN out)
    )
    emb = B * T * E
    d2, d4 = demand(2), demand(4)
    assert d2 == emb + 2 * per_layer
    assert d4 == emb + 4 * per_layer
    assert d4 - d2 == 2 * per_layer


def test_pooled_train_step_runs_and_counts_demand():
    from tpu_captioner.core.config import TrainConfig
    from tpu_captioner.train import steps as steps_mod
    from tpu_captioner.train.state import TrainState, make_optimizer
    from tpu_captioner.train.steps import make_train_step

    model = _tiny_model("pool")
    params = model.init_params(jax.random.PRNGKey(0), image_size=32)
    tc = TrainConfig(batch_size=2)
    dec_opt = make_optimizer(tc.decoder_lr, tc.grad_clip)
    enc_opt = make_optimizer(tc.encoder_lr, tc.grad_clip)
    wid = {"<pad>": 0, "<unk>": 57, "<start>": 58, "<end>": 59}
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)),
        "captions": jnp.asarray(rng.integers(1, 57, (2, 12), dtype=np.int32)),
        "caplens": jnp.asarray(np.array([8, 10], dtype=np.int32)),
        "valid": jnp.ones((2,), bool),
    }
    state = TrainState.create(params, dec_opt, enc_opt)
    step = make_train_step(model, tc, wid, dec_opt, enc_opt,
                           teacher_forcing=True, train_encoder=False)
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    # Demand was counted once and cached for this (config, shapes).
    hits = [v for k, v in steps_mod._POOL_DEMAND_CACHE.items()
            if "vocab_size=60" in k[0]]
    assert hits and hits[0] > 0
    # Exact per-layer scaling is pinned by test_pool_demand_scales_with_
    # num_layers below; here just require the cached demand to cover the
    # full per-layer striping (> one layer's sites).
    B, T, E, H, P, D = 2, 12, 64, 2, 49, 64
    per_layer = B * H * T * T + B * H * T * P + 3 * B * T * E + B * T * D
    assert hits[0] == B * T * E + 2 * per_layer


def test_pooled_loss_differs_from_threefry_but_same_deterministic():
    """Pool vs threefry: identical program when deterministic; different
    mask streams (almost surely different loss) in train mode."""
    from tpu_captioner.train.steps import tf_loss

    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)),
        "captions": jnp.asarray(rng.integers(1, 57, (2, 12), dtype=np.int32)),
        "caplens": jnp.asarray(np.array([8, 10], dtype=np.int32)),
        "valid": jnp.ones((2,), bool),
    }
    m_pool, m_tf = _tiny_model("pool"), _tiny_model("threefry")
    params = m_pool.init_params(jax.random.PRNGKey(0), image_size=32)
    key = jax.random.PRNGKey(7)
    det_p = tf_loss(m_pool, params, batch, 1.0, None, True)[0]
    det_t = tf_loss(m_tf, params, batch, 1.0, None, True)[0]
    np.testing.assert_allclose(float(det_p), float(det_t), rtol=1e-6)
    tr_p = tf_loss(m_pool, params, batch, 1.0, key, False)[0]
    tr_t = tf_loss(m_tf, params, batch, 1.0, key, False)[0]
    assert np.isfinite(float(tr_p)) and np.isfinite(float(tr_t))
    # same key, same distribution, different stream
    assert abs(float(tr_p) - float(tr_t)) > 1e-8
