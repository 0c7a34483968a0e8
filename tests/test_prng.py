"""PRNG discipline tests (core/prng.py).

The shipping default is threefry everywhere (rbg measured 16x SLOWER on the
v5e train step — see root_key's docstring); ``rbg`` remains a supported
opt-in, so these tests force it explicitly to pin that every consumer —
fold_in chains, in-jit splits, dropout, scheduled sampling — still accepts
a typed rbg key.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tpu_captioner.core.prng import root_key, step_key


def test_step_key_reproducible_and_distinct():
    for impl in (None, "rbg"):
        a = step_key(root_key(42, impl=impl), "dropout", 3, 7)
        b = step_key(root_key(42, impl=impl), "dropout", 3, 7)
        c = step_key(root_key(42, impl=impl), "dropout", 3, 8)
        bits = lambda k: np.asarray(jax.random.bits(k, (4,)))
        assert np.array_equal(bits(a), bits(b))
        assert not np.array_equal(bits(a), bits(c))


# slow: the rbg PRNG is opt-in only (reverted default, BENCHMARKING.md round 4); ~26 s compile.
@pytest.mark.slow
def test_rbg_key_through_full_train_step():
    """A typed rbg key must flow through make_train_step's jitted dropout
    path end to end (the TPU shipping configuration)."""
    from tpu_captioner.core.config import ModelConfig, TrainConfig
    from tpu_captioner.train.model import CaptionModel
    from tpu_captioner.train.state import TrainState, make_optimizer
    from tpu_captioner.train.steps import make_train_step

    V = 60
    model = CaptionModel(ModelConfig(
        decoder="transformer", vocab_size=V, embed_dim=16, decoder_dim=20,
        num_heads=4, num_layers=2, max_len=10,
        encoder_dim=24, encoder_depths=(1, 1), encoder_dims=(8, 24),
    ))
    params = model.init_params(jax.random.PRNGKey(0), image_size=32)
    tc = TrainConfig(batch_size=4, max_decode_len=9)
    dec_opt = make_optimizer(tc.decoder_lr, tc.grad_clip)
    enc_opt = make_optimizer(tc.encoder_lr, tc.grad_clip)
    state = TrainState.create(params, dec_opt, enc_opt)
    wid = {"<pad>": 0, "<unk>": V - 3, "<start>": V - 2, "<end>": V - 1}
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)),
        "captions": jnp.asarray(rng.integers(1, V - 3, (4, 10), dtype=np.int32)),
        "caplens": jnp.asarray(rng.integers(4, 9, (4,), dtype=np.int32)),
        "valid": jnp.ones((4,), dtype=bool),
    }
    step = make_train_step(model, tc, wid, dec_opt, enc_opt,
                           teacher_forcing=True, train_encoder=False)
    rk = root_key(42, impl="rbg")
    # Same rbg key -> identical dropout masks -> identical loss; different
    # step keys -> different loss.  tf_loss (the step's loss fn) is used
    # directly so no donated buffers get in the way.
    from tpu_captioner.train.steps import tf_loss

    loss_fn = jax.jit(lambda pp, k: tf_loss(
        model, pp, batch, alpha_c=0.0, rng=k, deterministic=False
    )[0])
    la = float(loss_fn(params, step_key(rk, "dropout", 0, 0)))
    lb = float(loss_fn(params, step_key(rk, "dropout", 0, 0)))
    lc = float(loss_fn(params, step_key(rk, "dropout", 0, 1)))
    assert la == lb
    assert la != lc

    # And the full jitted train step (donation, optimizer) accepts the key.
    state, m1 = step(state, batch, step_key(rk, "dropout", 0, 0))
    assert np.isfinite(float(m1["loss"]))
    state, m2 = step(state, batch, step_key(rk, "dropout", 0, 1))
    assert np.isfinite(float(m2["loss"]))
