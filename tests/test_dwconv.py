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
