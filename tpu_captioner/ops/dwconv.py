"""Pallas TPU kernel: 7x7 depthwise convolution, NHWC, stride 1, pad 3.

The ConvNeXt block's depthwise conv is FLOP-light (49 MACs/pixel/channel)
but XLA's grouped-conv lowering leaves a lot on the table; as 49 unrolled
VPU multiply-adds over a VMEM-resident padded tile it is a pure
bandwidth-shaped op: one HBM read of the input block, one write of the
output (reference consumer: torchvision CNBlock's Conv2d(groups=dim) inside
models/encoder.py's backbone).

Layout: channels ride the 128-wide lane dimension (C is 128/256/512/1024 in
ConvNeXt-Base — always lane-aligned), W rides sublanes.  Grid is one cell
per (batch, W-tile); each cell loads its (H+6, TW+6, C) halo'd tile into
VMEM scratch and accumulates the 49 taps in f32.

The custom VJP keeps training supported: dx is the same kernel with a
spatially flipped filter; dw reduces 49 shifted products — by default in
plain XLA, which fuses the reduction into the surrounding backward.  A
batch-grid-accumulating Pallas dw kernel (round 5) wins the STANDALONE
A/B ~3x (421 vs 1200 us at the stage-3 fine-tune shape, f32 —
artifacts/r05_queue/q_dw_bwd_*.json) and ships as an env-selectable
library kernel (TPU_CAPTIONER_DW_GRAD=pallas); the default follows the
measured full-step A/B (BENCHMARKING "Fine-tune floor", round 5).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 7  # kernel size
P = K // 2  # padding


def _dw_kernel(x_ref, w_ref, o_ref, pad_ref, *, H, W, C):
    # Zero the halo scratch, place the tile in the center.
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[P : P + H, P : P + W, :] = x_ref[0]
    acc = jnp.zeros((H, W, C), jnp.float32)
    for dy in range(K):
        for dx in range(K):
            tap = pad_ref[dy : dy + H, dx : dx + W, :]
            acc += tap.astype(jnp.float32) * w_ref[dy, dx, :].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _dw_pallas(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    assert w.shape == (K, K, C), w.shape
    kernel = functools.partial(_dw_kernel, H=H, W=W, C=C)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W, C), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((H + 2 * P, W + 2 * P, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(x, w)


def _dw_xla(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x,
        w.reshape(K, K, 1, C),
        window_strides=(1, 1),
        padding=[(P, P), (P, P)],
        feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_conv7x7_nhwc(
    x: jnp.ndarray, w: jnp.ndarray, use_pallas: bool = True
) -> jnp.ndarray:
    """y[b,h,w,c] = sum_{dy,dx} x_pad[b,h+dy,w+dx,c] * w[dy,dx,c]."""
    if use_pallas:
        return _dw_pallas(x, w)
    return _dw_xla(x, w)


def _fwd(x, w, use_pallas):
    return depthwise_conv7x7_nhwc(x, w, use_pallas), (x, w)


def _dwg_kernel(x_ref, g_ref, dw_ref, pad_ref, *, H, W, C, NB):
    """Filter gradient: dw[dy,dx,c] = sum_{b,h,w} x_pad[...] * g[...].

    One grid cell per batch image; dw_ref's block index is constant so the
    (K, K, C) accumulator lives in VMEM across the whole grid ("arbitrary"
    semantics — cells must run in order for the read-modify-write)."""
    b = pl.program_id(0)
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[P : P + H, P : P + W, :] = x_ref[0]

    @pl.when(b == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    gf = g_ref[0].astype(jnp.float32)
    for dy in range(K):
        for dx in range(K):
            tap = pad_ref[dy : dy + H, dx : dx + W, :].astype(jnp.float32)
            dw_ref[dy, dx, :] += jnp.sum(tap * gf, axis=(0, 1))


def _dw_grad_pallas(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    kernel = functools.partial(_dwg_kernel, H=H, W=W, C=C, NB=B)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, K, C), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, K, C), lambda b: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((H + 2 * P, W + 2 * P, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(x, g)


def _dw_grad_xla(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    # dL/dw[dy,dx,c] = sum_{b,h,w} x_pad[b,h+dy,w+dx,c] * g[b,h,w,c].
    H, W = x.shape[1], x.shape[2]
    xp = jnp.pad(x, ((0, 0), (P, P), (P, P), (0, 0)))
    taps = []
    for dy in range(K):
        for dx_ in range(K):
            taps.append(
                jnp.sum(
                    xp[:, dy : dy + H, dx_ : dx_ + W, :].astype(jnp.float32)
                    * g.astype(jnp.float32),
                    axis=(0, 1, 2),
                )
            )
    return jnp.stack(taps).reshape(K, K, -1)


def _dw_grad_impl():
    """Filter-grad implementation, independent of the FORWARD kernel choice.
    The Pallas grad kernel beats XLA's fused 49-tap reduction ~3x STANDALONE,
    but 'auto' resolves to XLA: in the full fine-tune step the serialized
    batch grid ('arbitrary' semantics) blocks the overlap XLA's fused
    reduction gets for free, and the step A/B measured the kernel slower
    in situ (BENCHMARKING "Fine-tune floor", round 5 —
    artifacts/r05_queue/q_ft_insitu_*.log).  Trace-time static; env
    TPU_CAPTIONER_DW_GRAD=xla|pallas overrides for A/B."""
    import os

    mode = os.environ.get("TPU_CAPTIONER_DW_GRAD", "auto")
    if mode == "pallas":
        return _dw_grad_pallas
    return _dw_grad_xla


def _bwd(use_pallas, res, g):
    x, w = res
    # dL/dx: correlate the cotangent with the spatially flipped filter.
    w_flip = w[::-1, ::-1, :]
    dx = depthwise_conv7x7_nhwc(g, w_flip, use_pallas)
    dw = _dw_grad_impl()(x, g).astype(w.dtype)
    return dx, dw


depthwise_conv7x7_nhwc.defvjp(_fwd, _bwd)
