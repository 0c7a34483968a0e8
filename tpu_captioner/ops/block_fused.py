"""Pallas TPU kernel: ENTIRE ConvNeXt block in one VMEM pass.

    out = x + sd * gamma * MLP(LN(dwconv7x7(x) + bias))

One grid cell per batch element: the image tile (H, W, C) is DMA'd to VMEM
once, the 49-tap depthwise conv runs on a zero-padded scratch, the LN + 4x
MLP (exact GELU via in-kernel erf) + layer-scale + stochastic-depth-scaled
residual all happen in registers/VMEM, and only the final block output goes
back to HBM.  Versus separate XLA ops, HBM traffic per block drops from
~5 (N,C)-sized transfers to 2 (one read of x, one write of out) — on top of
the already-fused MLP tail (ops/mlp_block.py) this removes the depthwise
conv's extra round trip.

VMEM budget (worst case, stage 1 of ConvNeXt-Base at 256^2 inputs):
x 2 MB + padded scratch 2.5 MB + conv-out rows 2 MB + h (4096,512) 8 MB +
out 2 MB + weights < 0.5 MB  ~= 17 MB — comfortably inside v5e VMEM.

Backward: custom VJP differentiating the XLA reference implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_captioner.ops.mlp_block import LN_EPS, _gelu_exact, _gelu_kernel

K = 7
P = K // 2


def _reference_impl(x, sd_scale, dw_w, dw_b, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    """Plain-XLA block (CPU fallback and VJP source).  x: (B, H, W, C);
    sd_scale: (B,)."""
    c = x.shape[-1]
    t = jax.lax.conv_general_dilated(
        x, dw_w.reshape(K, K, 1, c), (1, 1), [(P, P), (P, P)],
        feature_group_count=c, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + dw_b
    t32 = t.astype(jnp.float32)
    mu = jnp.mean(t32, axis=-1, keepdims=True)
    var = jnp.var(t32, axis=-1, keepdims=True)
    tn = (t32 - mu) * jax.lax.rsqrt(var + LN_EPS) * ln_scale + ln_bias
    h = _gelu_exact(tn @ w1 + b1)
    y = (h @ w2 + b2) * gamma
    return (x.astype(jnp.float32) + sd_scale[:, None, None, None] * y).astype(x.dtype)


def _kernel(x_ref, halo_ref, sd_ref, dww_ref, dwb_ref, lns_ref, lnb_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref, o_ref, pad_ref,
            *, TH, W, C, mxu_dtype):
    # Depthwise 7x7 on a zero-padded VMEM scratch assembled from this H-tile
    # plus its 3-row halos (precomputed strips; zeros at image borders).
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[P : P + TH, P : P + W, :] = x_ref[0]
    pad_ref[0:P, P : P + W, :] = halo_ref[0, 0, 0:P]
    pad_ref[P + TH : 2 * P + TH, P : P + W, :] = halo_ref[0, 0, P : 2 * P]
    t = jnp.zeros((TH, W, C), jnp.float32)
    for dy in range(K):
        for dx in range(K):
            t += (
                pad_ref[dy : dy + TH, dx : dx + W, :].astype(jnp.float32)
                * dww_ref[dy, dx, :].astype(jnp.float32)
            )
    t = t + dwb_ref[0]
    rows = t.reshape(TH * W, C)
    sd = sd_ref[pl.program_id(0), 0]
    mu = jnp.mean(rows, axis=-1, keepdims=True)
    var = jnp.mean((rows - mu) ** 2, axis=-1, keepdims=True)
    tn = (rows - mu) * jax.lax.rsqrt(var + LN_EPS)
    tn = tn * lns_ref[0] + lnb_ref[0]
    h = jnp.dot(tn.astype(mxu_dtype), w1_ref[:].astype(mxu_dtype),
                preferred_element_type=jnp.float32) + b1_ref[0]
    h = _gelu_kernel(h)
    y = jnp.dot(h.astype(mxu_dtype), w2_ref[:].astype(mxu_dtype),
                preferred_element_type=jnp.float32) + b2_ref[0]
    y = (y * gamma_ref[0]).reshape(TH, W, C)
    out = x_ref[0].astype(jnp.float32) + sd * y
    o_ref[0] = out.astype(o_ref.dtype)


def _halo_strips(x: jnp.ndarray, th: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, nH, 6, W, C): rows [i*th-3, i*th) and
    [i*th+th, i*th+th+3) per tile, zero-padded at the image borders.  Adds
    only 6/th of one x-read of traffic versus a full padded copy."""
    B, H, W, C = x.shape
    nH = H // th
    xp = jnp.pad(x, ((0, 0), (P, P), (0, 0), (0, 0)))
    tops = [xp[:, i * th : i * th + P] for i in range(nH)]
    bots = [xp[:, i * th + th + P : i * th + th + 2 * P] for i in range(nH)]
    return jnp.concatenate(
        [jnp.stack(tops, 1), jnp.stack(bots, 1)], axis=2
    )


def _pick_th(H: int, W: int) -> int:
    # ~512 rows per tile (the mlp_block kernel's sweet spot), divisor of H.
    th = max(8, 512 // max(W, 1))
    while H % th:
        th //= 2
    return min(th, H)


def _fused_pallas(x, sd_scale, dw_w, dw_b, ln_scale, ln_bias, w1, b1, w2, b2,
                  gamma, mxu_dtype=jnp.float32):
    B, H, W, C = x.shape
    c4 = w1.shape[1]
    th = _pick_th(H, W)
    nH = H // th
    halos = _halo_strips(x, th)
    kernel = functools.partial(_kernel, TH=th, W=W, C=C, mxu_dtype=mxu_dtype)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda b, hh: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    est = 4 * (3 * th * W * C + th * W * c4 + 2 * C * c4)
    vmem_cap = int(est * 1.6) if est > 14 * 1024 * 1024 else None
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec((1, th, W, C), lambda b, hh: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * P, W, C), lambda b, hh: (b, hh, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # Per-sample scalars: whole (B, 1) array in SMEM, indexed by
            # program_id (blocked SMEM specs still demand 8x128 tiles).
            pl.BlockSpec(memory_space=pltpu.SMEM),
            rep((K, K, C)),
            rep((1, C)), rep((1, C)), rep((1, C)),
            rep((C, c4)), rep((1, c4)),
            rep((c4, C)), rep((1, C)),
            rep((1, C)),
        ],
        out_specs=pl.BlockSpec(
            (1, th, W, C), lambda b, hh: (b, hh, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((th + 2 * P, W + 2 * P, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=vmem_cap,
        ),
    )(
        x, halos, sd_scale[:, None], dw_w, dw_b[None],
        ln_scale[None], ln_bias[None], w1, b1[None], w2, b2[None], gamma[None],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def fused_convnext_block(
    x: jnp.ndarray,  # (B, H, W, C)
    sd_scale: jnp.ndarray,  # (B,)
    dw_w: jnp.ndarray,  # (7, 7, C)
    dw_b: jnp.ndarray,  # (C,)
    ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,  # (C,)
    w1: jnp.ndarray, b1: jnp.ndarray,  # (C, 4C), (4C,)
    w2: jnp.ndarray, b2: jnp.ndarray,  # (4C, C), (C,)
    gamma: jnp.ndarray,  # (C,)
    use_pallas: bool = True,
) -> jnp.ndarray:
    if use_pallas:
        return _fused_pallas(
            x, sd_scale, dw_w, dw_b, ln_scale, ln_bias, w1, b1, w2, b2, gamma
        )
    return _reference_impl(
        x, sd_scale, dw_w, dw_b, ln_scale, ln_bias, w1, b1, w2, b2, gamma
    )


def _fwd(x, sd_scale, dw_w, dw_b, ln_scale, ln_bias, w1, b1, w2, b2, gamma, use_pallas):
    out = fused_convnext_block(
        x, sd_scale, dw_w, dw_b, ln_scale, ln_bias, w1, b1, w2, b2, gamma, use_pallas
    )
    return out, (x, sd_scale, dw_w, dw_b, ln_scale, ln_bias, w1, b1, w2, b2, gamma)


def _bwd(use_pallas, res, g):
    _, vjp = jax.vjp(_reference_impl, *res)
    return vjp(g)


fused_convnext_block.defvjp(_fwd, _bwd)
