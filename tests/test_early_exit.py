"""Early-exit eval rollouts (core/loops.py:scan_early_exit).

The reference's greedy no-TF loops break as soon as every row emitted
<end> (transformerDecoder.py:125-127, decoder.py:147-149,
lstmNoAttention.py:118-120); the deterministic rollouts here do the same
via a while_loop that must be EXACTLY equal to the full fixed-length
scan (finished rows emit zeros either way).  The scan path stays
reachable through the scheduled-sampling arguments (teacher_prob=0.0 is
numerically inert but routes to lax.scan), which is what these tests
compare against.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_captioner.core.config import ModelConfig
from tpu_captioner.core.loops import scan_early_exit
from tpu_captioner.train.model import CaptionModel

V = 31
T = 9


def tiny_model(decoder):
    cfg = ModelConfig(
        decoder=decoder,
        vocab_size=V,
        embed_dim=16,
        attention_dim=12,
        decoder_dim=20,
        num_heads=4,
        num_layers=2,
        max_len=T + 2,
        encoder_dim=24,
        encoder_depths=(1, 1),
        encoder_dims=(8, 24),
    )
    model = CaptionModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), image_size=32)
    return model, params


START, END = V - 2, V - 1


def test_scan_early_exit_stops_and_zero_fills():
    # body counts up; done at carry >= 3 -> steps 0..2 execute, outputs
    # afterwards stay zero-initialized.
    def body(c, x):
        return c + 1, c + 10 * x

    carry, outs = jax.jit(
        lambda c0, xs: scan_early_exit(
            body, c0, xs, lambda c: c >= 3
        )
    )(jnp.int32(0), jnp.arange(6))
    assert int(carry) == 3  # exited after 3 steps, not 6
    np.testing.assert_array_equal(np.asarray(outs), [0, 11, 22, 0, 0, 0])


def test_scan_early_exit_runs_full_length_when_never_done():
    def body(c, x):
        return c + 1, c

    carry, outs = scan_early_exit(
        body, jnp.int32(0), jnp.arange(5), lambda c: jnp.bool_(False)
    )
    assert int(carry) == 5
    np.testing.assert_array_equal(np.asarray(outs), [0, 1, 2, 3, 4])


def _bias_head_toward(params, decoder, token, value=50.0):
    """Return params with the vocab head biased so argmax == token at every
    step -> every row finishes at step 1 (<end>) or never (other token)."""
    p = jax.tree_util.tree_map(lambda a: a, params)  # shallow-ish copy
    dec = dict(p["decoder"])
    head = "fc_out" if decoder.startswith("transformer") else "fc"
    layer = dict(dec[head])
    layer["b"] = layer["b"].at[token].add(value)
    dec[head] = layer
    return {"encoder": p["encoder"], "decoder": dec}


@pytest.mark.parametrize(
    "decoder",
    ["lstm", "lstm_no_attention", "transformer", "transformer_attvis"],
)
@pytest.mark.parametrize("finishes", [True, False])
def test_rollout_early_exit_equals_scan(decoder, finishes):
    model, params = tiny_model(decoder)
    # Bias the head toward <end> (all rows finish at step 1, loop exits)
    # or toward a non-end token (no row ever finishes, full length runs).
    params = _bias_head_toward(params, decoder, END if finishes else 3)
    enc_out = model.encode(
        params, jnp.arange(2 * 32 * 32 * 3, dtype=jnp.uint8).reshape(
            2, 32, 32, 3
        )
    )
    fast = model.rollout(params, enc_out, START, END, T)
    # teacher_prob=0.0 is numerically inert but routes to the lax.scan
    # path (the early-exit gate requires teacher_tokens is None).
    slow = model.rollout(
        params, enc_out, START, END, T,
        teacher_tokens=jnp.zeros((2, T + 1), jnp.int32), teacher_prob=0.0,
    )
    for f, s, name in zip(fast, slow, ("logits", "sequences", "alphas")):
        if f is None:
            assert s is None
            continue
        if name == "sequences":
            # token decisions must agree exactly
            np.testing.assert_array_equal(
                np.asarray(f), np.asarray(s), err_msg=f"{decoder}/{name}"
            )
        else:
            # the scan path runs unroll=2; XLA's different fusion contracts
            # FMAs differently (~1e-9 deltas observed) — same math.
            np.testing.assert_allclose(
                np.asarray(f), np.asarray(s), rtol=1e-5, atol=1e-6,
                err_msg=f"{decoder}/{name}",
            )
    if finishes:
        # every row emitted <end> at the first step and zeros afterwards
        seqs = np.asarray(fast[1])
        assert (seqs[:, 0] == END).all() and (seqs[:, 1:] == 0).all()
