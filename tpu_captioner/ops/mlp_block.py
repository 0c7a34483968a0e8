"""Pallas TPU kernel: fused ConvNeXt block tail.

Computes, in one VMEM-resident pass over row tiles:

    out = residual + sd_scale * (gelu(LN(x) @ W1 + b1) @ W2 + b2) * gamma

i.e. everything in a ConvNeXt block after the depthwise conv (reference
consumer: torchvision CNBlock inside models/encoder.py's backbone): LayerNorm
(eps 1e-6), the 4x-expansion MLP with exact GELU, layer scale, stochastic
depth (as a precomputed per-row scale in {0, 1/survival}), and the residual
add.

Why: XLA cannot fuse two matmuls, so the (rows, 4C) intermediate ``h`` makes
a round trip to HBM for every block — ~6 GB per ConvNeXt-Base forward at
batch 32 (stage 1 alone: 268 MB per block).  Here ``h`` lives only in VMEM;
HBM traffic per block drops to one read of x/residual and one write of out.

Backward: custom VJP that differentiates the XLA reference implementation
(fine-tuning correctness without a hand-written backward kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6


def _gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def _erf_as(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 ~= f32 eps).
    Mosaic has no erf/erfc lowering, so the kernel carries its own."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-a * a))


def _gelu_kernel(x):
    return 0.5 * x * (1.0 + _erf_as(x * 0.7071067811865476))


def _reference_impl(x, residual, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    """Plain-XLA implementation (also the CPU fallback and the VJP source)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    xn = (x32 - mu) * jax.lax.rsqrt(var + LN_EPS) * ln_scale + ln_bias
    h = _gelu_exact(xn @ w1 + b1)
    y = (h @ w2 + b2) * gamma
    return (residual.astype(jnp.float32) + sd_scale[:, None] * y).astype(x.dtype)


def _kernel(x_ref, res_ref, sd_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, gamma_ref, o_ref, *, mxu_dtype):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + LN_EPS)
    xn = xn * lns_ref[0] + lnb_ref[0]
    # MXU multiplicands in mxu_dtype (bf16 default = XLA's own default TPU
    # matmul precision), accumulation always f32.
    h = jnp.dot(xn.astype(mxu_dtype), w1_ref[:].astype(mxu_dtype),
                preferred_element_type=jnp.float32) + b1_ref[0]
    h = _gelu_kernel(h)
    y = jnp.dot(h.astype(mxu_dtype), w2_ref[:].astype(mxu_dtype),
                preferred_element_type=jnp.float32) + b2_ref[0]
    y = y * gamma_ref[0]
    out = res_ref[:].astype(jnp.float32) + sd_ref[:] * y
    o_ref[:] = out.astype(o_ref.dtype)


def _fused_pallas(x, residual, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                  row_tile: int = 512, mxu_dtype=jnp.bfloat16):
    n, c = x.shape
    c4 = w1.shape[1]
    tile = min(row_tile, n)
    grid = (pl.cdiv(n, tile),)
    kernel = functools.partial(_kernel, mxu_dtype=mxu_dtype)
    # Raise the scoped-VMEM cap only when this stage actually needs it
    # (stage-4 weights are 2 x 16.8 MB f32); a blanket high cap measurably
    # hurts pipelining of the small stages (27.4 -> 29.1 ms/step).
    est = 4 * (2 * (3 * tile * c + tile * c4) + 2 * (c * c4 + c4 * c))
    vmem_cap = int(est * 1.25) if est > 14 * 1024 * 1024 else None
    row2 = lambda: pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        grid=grid,
        in_specs=[
            row2(),
            row2(),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            rep((1, c)), rep((1, c)),
            rep((c, c4)), rep((1, c4)),
            rep((c4, c)), rep((1, c)),
            rep((1, c)),
        ],
        out_specs=row2(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_cap,
        ),
    )(
        x, residual, sd_scale[:, None],
        ln_scale[None], ln_bias[None],
        w1, b1[None], w2, b2[None], gamma[None],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_convnext_mlp(
    x: jnp.ndarray,  # (N, C) — depthwise-conv output rows
    residual: jnp.ndarray,  # (N, C) — block input rows
    sd_scale: jnp.ndarray,  # (N,) — 1 (eval), or {0, 1/survival} (train)
    ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,  # (C,)
    w1: jnp.ndarray, b1: jnp.ndarray,  # (C, 4C), (4C,)
    w2: jnp.ndarray, b2: jnp.ndarray,  # (4C, C), (C,)
    gamma: jnp.ndarray,  # (C,) layer scale
    use_pallas: bool = True,
    precise: bool = True,  # f32 MXU multiplicands (bf16 measured no faster —
    # the kernel is bandwidth/VPU-bound, not MXU-bound)
) -> jnp.ndarray:
    if use_pallas:
        return _fused_pallas(
            x, residual, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
            mxu_dtype=jnp.float32 if precise else jnp.bfloat16,
        )
    return _reference_impl(
        x, residual, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma
    )


def _fwd(x, residual, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
         use_pallas, precise):
    out = fused_convnext_mlp(
        x, residual, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        use_pallas, precise,
    )
    return out, (x, residual, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma)


def _bwd(use_pallas, precise, res, g):
    # Differentiate the XLA reference implementation (recompute-in-backward).
    _, vjp = jax.vjp(_reference_impl, *res)
    return vjp(g)


fused_convnext_mlp.defvjp(_fwd, _bwd)
