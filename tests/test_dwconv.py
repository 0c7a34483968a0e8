"""Pallas depthwise conv: parity with the XLA grouped conv + custom VJP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_captioner.ops.dwconv import _dw_xla, depthwise_conv7x7_nhwc


def _pallas_interpret(x, w):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return depthwise_conv7x7_nhwc(x, w, True)


@pytest.mark.parametrize("shape", [(2, 16, 16, 128), (1, 8, 8, 256)])
def test_pallas_matches_xla(shape):
    B, H, W, C = shape
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    w = jax.random.normal(jax.random.PRNGKey(1), (7, 7, C)) * 0.1
    want = _dw_xla(x, w)
    got = _pallas_interpret(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_custom_vjp_matches_autodiff_of_xla():
    B, H, W, C = 2, 8, 8, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C))
    w = jax.random.normal(jax.random.PRNGKey(1), (7, 7, C)) * 0.1
    g = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, C))

    def f_ref(x, w):
        return jnp.sum(_dw_xla(x, w) * g)

    def f_mine(x, w):
        return jnp.sum(depthwise_conv7x7_nhwc(x, w, False) * g)

    dx_ref, dw_ref = jax.grad(f_ref, argnums=(0, 1))(x, w)
    dx, dw = jax.grad(f_mine, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), atol=1e-2)


def test_dw_grad_impl_selection(monkeypatch):
    """Filter-grad impl decouples from the forward kernel: XLA by default
    (measured faster in the full step), Pallas env-selectable for A/B."""
    from tpu_captioner.ops import dwconv

    monkeypatch.setenv("TPU_CAPTIONER_DW_GRAD", "pallas")
    assert dwconv._dw_grad_impl() is dwconv._dw_grad_pallas
    monkeypatch.setenv("TPU_CAPTIONER_DW_GRAD", "xla")
    assert dwconv._dw_grad_impl() is dwconv._dw_grad_xla
    monkeypatch.delenv("TPU_CAPTIONER_DW_GRAD")
    assert dwconv._dw_grad_impl() is dwconv._dw_grad_xla  # auto


def test_custom_vjp_with_pallas_filter_grad(monkeypatch):
    """grad() through the custom VJP with the Pallas filter-grad forced
    (interpret mode) must match the all-XLA reference."""
    from jax.experimental.pallas import tpu as pltpu

    from tpu_captioner.ops.dwconv import _dw_xla, depthwise_conv7x7_nhwc

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 128))
    w = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 128)) * 0.1
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 128))

    dx_ref, dw_ref = jax.grad(
        lambda x, w: jnp.sum(_dw_xla(x, w) * g), argnums=(0, 1))(x, w)
    monkeypatch.setenv("TPU_CAPTIONER_DW_GRAD", "pallas")
    with pltpu.force_tpu_interpret_mode():
        dx, dw = jax.grad(
            lambda x, w: jnp.sum(depthwise_conv7x7_nhwc(x, w, False) * g),
            argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), atol=1e-2)


@pytest.mark.parametrize("shape", [(3, 16, 16, 128), (2, 8, 8, 256)])
def test_pallas_filter_grad_matches_xla(shape):
    """The batch-grid-accumulating dw-grad kernel (round 5) must equal the
    XLA 49-tap reduction, including the cross-image accumulation."""
    from jax.experimental.pallas import tpu as pltpu

    from tpu_captioner.ops.dwconv import _dw_grad_pallas, _dw_grad_xla

    B, H, W, C = shape
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    g = jax.random.normal(jax.random.PRNGKey(1), shape)
    want = _dw_grad_xla(x, g)
    with pltpu.force_tpu_interpret_mode():
        got = _dw_grad_pallas(x, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_pallas_filter_grad_bf16_inputs():
    """bf16 activations/cotangents (the bf16 fine-tune step) accumulate
    in f32 inside the kernel; compare against the f32-upcast XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    from tpu_captioner.ops.dwconv import _dw_grad_pallas, _dw_grad_xla

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 128)).astype(
        jnp.bfloat16)
    g = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 128)).astype(
        jnp.bfloat16)
    want = _dw_grad_xla(x, g)
    with pltpu.force_tpu_interpret_mode():
        got = _dw_grad_pallas(x, g)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)
