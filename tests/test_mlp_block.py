"""Fused ConvNeXt MLP kernel: parity with the XLA reference + VJP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_captioner.ops.mlp_block import _reference_impl, fused_convnext_mlp

N, C = 192, 128


def make_args(seed=0, sd="ones", n=N):
    ks = jax.random.split(jax.random.PRNGKey(seed), 10)
    x = jax.random.normal(ks[0], (n, C))
    res = jax.random.normal(ks[1], (n, C))
    if sd == "ones":
        sd_scale = jnp.ones((n,))
    else:
        sd_scale = jnp.where(jax.random.bernoulli(ks[2], 0.7, (n,)), 2.0, 0.0)
    ln_s = 1.0 + 0.1 * jax.random.normal(ks[3], (C,))
    ln_b = 0.1 * jax.random.normal(ks[4], (C,))
    w1 = jax.random.normal(ks[5], (C, 4 * C)) * 0.05
    b1 = 0.1 * jax.random.normal(ks[6], (4 * C,))
    w2 = jax.random.normal(ks[7], (4 * C, C)) * 0.05
    b2 = 0.1 * jax.random.normal(ks[8], (C,))
    gamma = 0.5 * jax.random.normal(ks[9], (C,))
    return (x, res, sd_scale, ln_s, ln_b, w1, b1, w2, b2, gamma)


@pytest.mark.parametrize("sd", ["ones", "mixed"])
def test_pallas_matches_reference(sd):
    from jax.experimental.pallas import tpu as pltpu

    args = make_args(sd=sd)
    want = _reference_impl(*args)
    with pltpu.force_tpu_interpret_mode():
        got = fused_convnext_mlp(*args, True, True)  # precise=f32 MXU
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_vjp_matches_autodiff_of_reference():
    args = make_args()
    g = jax.random.normal(jax.random.PRNGKey(11), (N, C))

    def f_ref(*a):
        return jnp.sum(_reference_impl(*a) * g)

    def f_mine(*a):
        return jnp.sum(fused_convnext_mlp(*a, False, True) * g)

    grads_ref = jax.grad(f_ref, argnums=tuple(range(10)))(*args)
    grads_mine = jax.grad(f_mine, argnums=tuple(range(10)))(*args)
    for gr, gm in zip(grads_ref, grads_mine):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gr), atol=1e-3)


@pytest.mark.parametrize("sd", ["ones", "mixed"])
def test_pallas_bwd_kernel_matches_autodiff(sd):
    """The hand-written backward kernel == autodiff of the XLA reference."""
    from jax.experimental.pallas import tpu as pltpu

    args = make_args(sd=sd)
    g = jax.random.normal(jax.random.PRNGKey(11), (N, C))

    def f_ref(*a):
        return jnp.sum(_reference_impl(*a) * g)

    grads_ref = jax.grad(f_ref, argnums=tuple(range(10)))(*args)

    def f_pallas(*a):
        return jnp.sum(fused_convnext_mlp(*a, True, True) * g)

    with pltpu.force_tpu_interpret_mode():
        grads_pallas = jax.grad(f_pallas, argnums=tuple(range(10)))(*args)
    for k, (gr, gm) in enumerate(zip(grads_ref, grads_pallas)):
        np.testing.assert_allclose(
            np.asarray(gm), np.asarray(gr), atol=2e-3, err_msg=f"arg {k}"
        )


def test_pallas_bwd_kernel_tail_masking():
    """Rows past n in the last tile must not pollute parameter grads: use an
    n that forces a partial final tile (tile=512 -> 600 = 512 + 88)."""
    from jax.experimental.pallas import tpu as pltpu

    from tpu_captioner.ops.mlp_block import _bwd_pallas

    n = 600
    ks = jax.random.split(jax.random.PRNGKey(3), 10)
    x = jax.random.normal(ks[0], (n, C))
    sd_scale = jnp.where(jax.random.bernoulli(ks[2], 0.7, (n,)), 2.0, 0.0)
    ln_s = 1.0 + 0.1 * jax.random.normal(ks[3], (C,))
    ln_b = 0.1 * jax.random.normal(ks[4], (C,))
    w1 = jax.random.normal(ks[5], (C, 4 * C)) * 0.05
    b1 = 0.1 * jax.random.normal(ks[6], (4 * C,))
    w2 = jax.random.normal(ks[7], (4 * C, C)) * 0.05
    b2 = 0.1 * jax.random.normal(ks[8], (C,))
    gamma = 0.5 * jax.random.normal(ks[9], (C,))
    g = jax.random.normal(ks[1], (n, C))

    from tpu_captioner.ops.mlp_block import _core_impl

    _, vjp = jax.vjp(_core_impl, x, sd_scale, ln_s, ln_b, w1, b1, w2, b2, gamma)
    want = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got = _bwd_pallas(g, x, sd_scale, ln_s, ln_b, w1, b1, w2, b2, gamma)
    for k, (gr, gm) in enumerate(zip(want, got)):
        np.testing.assert_allclose(
            np.asarray(gm), np.asarray(gr), atol=2e-3, err_msg=f"arg {k}"
        )


@pytest.mark.parametrize("n", [512, 520])
def test_pallas_pipelined_matches_reference(n, monkeypatch):
    """TPU_CAPTIONER_MLP_SUB=128 with n >= tile(512) engages the
    software-pipelined sub-tile schedule (_kernel_pipelined; default off —
    measured flat on-chip, see _pipeline_sub); 520 adds a partial final grid
    cell on top.  Must equal the XLA reference like the monolithic path."""
    from jax.experimental.pallas import tpu as pltpu

    from tpu_captioner.ops import mlp_block

    monkeypatch.setenv("TPU_CAPTIONER_MLP_SUB", "128")
    args = make_args(sd="mixed", n=n)
    want = _reference_impl(*args)
    assert mlp_block._pipeline_sub(n, min(512, n)) == 128
    with pltpu.force_tpu_interpret_mode():
        got = fused_convnext_mlp(*args, True, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_bwd_chunked_matches_single_call(monkeypatch):
    """Row-chunked backward (the stage-3 local-AOT staging fix) must equal
    the single-call kernel: d_x/d_sd concatenate, weight grads sum (f32
    chunk-sum association differs from tile-sequential — tolerance)."""
    from jax.experimental.pallas import tpu as pltpu

    from tpu_captioner.ops import mlp_block

    args = make_args(sd="mixed", n=256)
    x, res, sd, lns, lnb, w1, b1, w2, b2, gamma = args
    g = jax.random.normal(jax.random.PRNGKey(7), x.shape)
    bwd_args = (g, x, sd, lns, lnb, w1, b1, w2, b2, gamma)
    monkeypatch.setattr(mlp_block, "_bwd_chunk_rows", lambda n, c: 0)
    with pltpu.force_tpu_interpret_mode():
        want = mlp_block._bwd_pallas(*bwd_args)
    monkeypatch.setattr(mlp_block, "_bwd_chunk_rows", lambda n, c: 64)
    with pltpu.force_tpu_interpret_mode():
        got = mlp_block._bwd_pallas(*bwd_args)
    assert len(want) == len(got) == 9
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)


def test_bwd_chunk_rows_band(monkeypatch):
    """Chunking ships OFF (the 32 MB scoped-VMEM budget is the gate fix);
    when opted in it applies ONLY to the locally-staged band (stage 3 at
    flagship bs=32: 8192 x 512 f32 d_x = 16.8 MB)."""
    from tpu_captioner.ops.mlp_block import _bwd_chunk_rows

    assert _bwd_chunk_rows(8192, 512) == 0  # default: off
    monkeypatch.setenv("TPU_CAPTIONER_MLP_BWD_CHUNK", "2048")
    assert _bwd_chunk_rows(8192, 512) == 2048  # stage 3: chunked
    assert _bwd_chunk_rows(131072, 128) == 0  # stage 1: streams already
    assert _bwd_chunk_rows(32768, 256) == 0  # stage 2: above the band
    assert _bwd_chunk_rows(2048, 1024) == 0  # stage 4 shape: n <= chunk
    assert _bwd_chunk_rows(192, 128) == 0  # test shapes untouched


def test_erf_poly_accuracy_and_gelu_parity():
    """The divide/exp-free in-kernel erf must stay at A&S-class accuracy
    (<=3e-7 abs, f32) against the true erf, across segment boundaries and
    saturation; and the resulting GELU must match jax.nn.gelu(exact)."""
    import math

    from tpu_captioner.ops.mlp_block import _erf_poly, _gelu_kernel

    x = np.concatenate([
        np.linspace(-6.5, 6.5, 20011, dtype=np.float32),
        np.array([-4.2, -2.0, 0.0, 2.0, 4.2], dtype=np.float32),
    ])
    got = np.asarray(_erf_poly(jnp.asarray(x)))
    want = np.array([math.erf(float(v)) for v in x])
    assert np.max(np.abs(got - want)) <= 3e-7

    g = np.asarray(_gelu_kernel(jnp.asarray(x)))
    ref = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))
    np.testing.assert_allclose(g, ref, atol=3e-6)


def test_pallas_bf16_mxu_close_to_reference():
    from jax.experimental.pallas import tpu as pltpu

    args = make_args()
    want = _reference_impl(*args)
    with pltpu.force_tpu_interpret_mode():
        got = fused_convnext_mlp(*args, True, False)  # bf16 multiplicands
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.15, rtol=0.05)
