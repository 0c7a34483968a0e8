"""Fully-fused ConvNeXt block kernel: parity + VJP."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_captioner.ops.block_fused import _reference_impl, fused_convnext_block

B, H, W, C = 2, 8, 8, 128


def make_args(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 11)
    x = jax.random.normal(ks[0], (B, H, W, C))
    sd = jnp.array([1.0, 2.0])
    dw_w = jax.random.normal(ks[1], (7, 7, C)) * 0.05
    dw_b = 0.1 * jax.random.normal(ks[2], (C,))
    ln_s = 1.0 + 0.1 * jax.random.normal(ks[3], (C,))
    ln_b = 0.1 * jax.random.normal(ks[4], (C,))
    w1 = jax.random.normal(ks[5], (C, 4 * C)) * 0.05
    b1 = 0.1 * jax.random.normal(ks[6], (4 * C,))
    w2 = jax.random.normal(ks[7], (4 * C, C)) * 0.05
    b2 = 0.1 * jax.random.normal(ks[8], (C,))
    gamma = 0.5 * jax.random.normal(ks[9], (C,))
    return (x, sd, dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2, gamma)


def test_pallas_matches_reference():
    from jax.experimental.pallas import tpu as pltpu

    args = make_args()
    want = _reference_impl(*args)
    with pltpu.force_tpu_interpret_mode():
        got = fused_convnext_block(*args, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)


def test_pallas_multi_tile_halo_matches_reference():
    """H is split across row tiles (H=16, W=64 -> 2 tiles of 8); the 3-row
    halo strips must reconstruct the exact 7x7 conv at tile seams and image
    borders."""
    from jax.experimental.pallas import tpu as pltpu

    ks = jax.random.split(jax.random.PRNGKey(3), 11)
    H2, W2 = 16, 64
    x = jax.random.normal(ks[0], (B, H2, W2, C))
    args = (x, jnp.array([1.0, 0.5]),
            jax.random.normal(ks[1], (7, 7, C)) * 0.05,
            0.1 * jax.random.normal(ks[2], (C,)),
            1.0 + 0.1 * jax.random.normal(ks[3], (C,)),
            0.1 * jax.random.normal(ks[4], (C,)),
            jax.random.normal(ks[5], (C, 4 * C)) * 0.05,
            0.1 * jax.random.normal(ks[6], (4 * C,)),
            jax.random.normal(ks[7], (4 * C, C)) * 0.05,
            0.1 * jax.random.normal(ks[8], (C,)),
            0.5 * jax.random.normal(ks[9], (C,)))
    from tpu_captioner.ops.block_fused import _pick_th

    assert H2 // _pick_th(H2, W2) > 1  # really multi-tile
    want = _reference_impl(*args)
    with pltpu.force_tpu_interpret_mode():
        got = fused_convnext_block(*args, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4)


def test_vjp_matches_autodiff_of_reference():
    args = make_args()
    g = jax.random.normal(jax.random.PRNGKey(11), (B, H, W, C))

    def f_ref(*a):
        return jnp.sum(_reference_impl(*a) * g)

    def f_mine(*a):
        return jnp.sum(fused_convnext_block(*a, False) * g)

    grads_ref = jax.grad(f_ref, argnums=tuple(range(11)))(*args)
    grads_mine = jax.grad(f_mine, argnums=tuple(range(11)))(*args)
    for gr, gm in zip(grads_ref, grads_mine):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gr), atol=2e-3)
