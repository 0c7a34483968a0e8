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

Backward: a second Pallas kernel (``_bwd_pallas``) that recomputes the
LN/GELU intermediates per row tile in VMEM and accumulates the weight/bias
gradients across tiles in VMEM-resident output blocks — the (rows, 4C)
intermediate never touches HBM in either direction.  The XLA reference
implementation remains the CPU fallback for both directions.
"""

from __future__ import annotations

import functools
import os

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


# Piecewise-polynomial erf with NO divide/exp — the round-5 experiment for
# the "8.6 ms serial GELU" headroom hypothesis.  Two centered
# Chebyshev-derived fits — erf(r)=r*P(r^2-2) on [0,2] and erf(r)=Q(r-3.1)
# on [2,4.2], saturating past 4.2 where 1-erf < 2.9e-9 — evaluate in ~21
# FMAs + selects, measured f32 max abs error 1.7e-7 (same 1.5e-7-class
# accuracy as A&S 7.1.26).  MEASURED SLOWER on-chip: 26.7 ms/step vs 24.3
# for the A&S form (artifacts/r05_queue/q_gelu_{poly,as}.json) — Mosaic's
# divide/exp are hardware-accelerated, so the GELU cost is raw VPU op
# count and A&S (~12 ops + div + exp) is already near the f32-accurate
# floor.  Kept behind TPU_CAPTIONER_GELU=poly as the documented experiment
# (BENCHMARKING.md round 5 "encoder floor is structural").
_ERF_PA = (
    0.6749332400469609, -0.13055594080717844, 0.029869731284560653,
    -0.006082805459027178, 0.0010706339924564955, -0.00016363600079109033,
    2.187242302884167e-05, -2.5982562449309996e-06, 3.0466273629515377e-07,
    -3.080281838582692e-08,
)
_ERF_PB = (
    0.9999883493610994, 7.55111189514457e-05, -0.00023442631744837155,
    0.000462257003590861, -0.0006354542565884217, 0.0006348508894198379,
    -0.0004956271199076942, 0.0003165336361843908, -0.00012624532222162342,
    5.650436182836311e-07, 1.3667501948364588e-05,
)


def _horner(coefs, x):
    acc = jnp.full_like(x, coefs[-1])
    for c in coefs[-2::-1]:
        acc = acc * x + c
    return acc


def _erf_poly(x):
    a = jnp.abs(x)
    inner = jnp.minimum(a, 2.0)
    va = _horner(_ERF_PA, inner * inner - 2.0) * inner
    vb = _horner(_ERF_PB, jnp.minimum(a, 4.2) - 3.1)
    v = jnp.where(a <= 2.0, va, jnp.where(a <= 4.2, vb, 1.0))
    return jnp.sign(x) * v


def _erf(x):
    """In-kernel erf; TPU_CAPTIONER_GELU selects the implementation for A/Bs
    ('as' default — A&S divide+exp, measured FASTER than 'poly' on-chip;
    see _erf_poly's note)."""
    if os.environ.get("TPU_CAPTIONER_GELU", "as") == "poly":
        return _erf_poly(x)
    return _erf_as(x)


def _gelu_kernel(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _core_impl(x, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    """Everything except the residual add, in f32 (the CPU-fallback VJP source
    — the residual's gradient is just the cotangent, so it is kept out)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    xn = (x32 - mu) * jax.lax.rsqrt(var + LN_EPS) * ln_scale + ln_bias
    h = _gelu_exact(xn @ w1 + b1)
    y = (h @ w2 + b2) * gamma
    return sd_scale[:, None] * y


def _reference_impl(x, residual, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma):
    """Plain-XLA implementation (also the CPU fallback)."""
    y = _core_impl(x, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma)
    return (residual.astype(jnp.float32) + y).astype(x.dtype)


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


def _kernel_pipelined(x_ref, res_ref, sd_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                      w2_ref, b2_ref, gamma_ref, o_ref, *, mxu_dtype, sub):
    """Software-pipelined variant of ``_kernel``: the row tile is split into
    ``sub``-row sub-tiles whose LN/mm1/GELU/mm2/store chains are INDEPENDENT,
    and the stages are emitted skewed (tile i's GELU next to tile i+1's mm1)
    so Mosaic's scheduler can run the 8.6 ms/step exact-erf GELU (VPU) under
    the matmuls (MXU) instead of serializing them — the dominant measured
    headroom of the frozen train step (BENCHMARKING.md "Encoder floor,
    MEASURED": serial engine sum 21.6 ms vs 12.7 ms VPU floor)."""
    tile, c = x_ref.shape
    S = tile // sub
    w1 = w1_ref[:].astype(mxu_dtype)
    w2 = w2_ref[:].astype(mxu_dtype)
    lns, lnb = lns_ref[0], lnb_ref[0]
    b1, b2, gamma = b1_ref[0], b2_ref[0], gamma_ref[0]

    def ln(s):
        x = x_ref[s * sub : (s + 1) * sub, :].astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return ((x - mu) * jax.lax.rsqrt(var + LN_EPS)) * lns + lnb

    xn, h, g, y = [None] * S, [None] * S, [None] * S, [None] * S
    for k in range(S + 4):
        if k < S:
            xn[k] = ln(k)
        if 1 <= k < S + 1:
            s = k - 1
            h[s] = jnp.dot(
                xn[s].astype(mxu_dtype), w1, preferred_element_type=jnp.float32
            ) + b1
        if 2 <= k < S + 2:
            s = k - 2
            g[s] = _gelu_kernel(h[s])
        if 3 <= k < S + 3:
            s = k - 3
            y[s] = jnp.dot(
                g[s].astype(mxu_dtype), w2, preferred_element_type=jnp.float32
            ) + b2
        if 4 <= k < S + 4:
            s = k - 4
            r = slice(s * sub, (s + 1) * sub)
            out = res_ref[r, :].astype(jnp.float32) + sd_ref[r, :] * (y[s] * gamma)
            o_ref[r, :] = out.astype(o_ref.dtype)


def _pipeline_sub(n: int, tile: int) -> int:
    """Sub-tile rows for the pipelined forward kernel; 0 disables (monolithic
    per-tile chain).  Env override TPU_CAPTIONER_MLP_SUB for A/Bs.

    Default 0: the round-5 on-chip A/B (artifacts/r05_queue/q_mlp_sub*.json)
    measured the skewed schedule FLAT vs the monolithic kernel (24.4 ms/step
    at sub=128 vs 24.3 off; 25.2 at sub=64) — Mosaic already extracts the
    available MXU/VPU overlap from the monolithic chain, so the unrolled
    variant buys nothing and costs compile time.  Kept behind the env knob
    as the documented experiment (BENCHMARKING.md round 5)."""
    sub = int(os.environ.get("TPU_CAPTIONER_MLP_SUB", "0"))
    if sub <= 0 or tile % sub or tile // sub < 2:
        return 0
    return sub


def _fused_pallas(x, residual, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                  row_tile: int = 512, mxu_dtype=jnp.bfloat16):
    n, c = x.shape
    c4 = w1.shape[1]
    tile = min(row_tile, n)
    sub = _pipeline_sub(n, tile)
    if sub:
        kernel = functools.partial(_kernel_pipelined, mxu_dtype=mxu_dtype, sub=sub)
    else:
        kernel = functools.partial(_kernel, mxu_dtype=mxu_dtype)
    grid = (pl.cdiv(n, tile),)
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


def _bwd_kernel(g_ref, x_ref, sd_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, gamma_ref,
                dx_ref, dsd_ref, dlns_ref, dlnb_ref, dw1_ref, db1_ref,
                dw2_ref, db2_ref, dgamma_ref,
                aw1_ref, aw2_ref, asmall_ref, *, n_rows, mxu_dtype):
    i = pl.program_id(0)
    tile = g_ref.shape[0]
    c, c4 = w1_ref.shape
    # The last tile may read past n_rows: out-of-bounds rows hold undefined
    # data (could be inf/NaN), so zero them before they touch any reduction.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + i * tile
    valid = row_ids < n_rows  # where(), not *: padding may be NaN, 0*NaN=NaN

    g = jnp.where(valid, g_ref[:].astype(jnp.float32), 0.0)
    x = jnp.where(valid, x_ref[:].astype(jnp.float32), 0.0)
    sd = jnp.where(valid, sd_ref[:], 0.0)
    lns, lnb, gamma = lns_ref[0], lnb_ref[0], gamma_ref[0]

    def mm(a, b, dims):
        return jax.lax.dot_general(
            a.astype(mxu_dtype), b.astype(mxu_dtype),
            dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    # --- recompute the forward intermediates for this tile (stays in VMEM)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x - mu) * r
    xn = xhat * lns + lnb
    a = mm(xn, w1_ref[:], ((1,), (0,))) + b1_ref[0]
    h = _gelu_kernel(a)
    u = mm(h, w2_ref[:], ((1,), (0,))) + b2_ref[0]

    # --- backward chain
    d_y = g * sd  # cotangent of u * gamma, rows pre-scaled by stoch. depth
    dsd_ref[:] = jnp.sum(g * (u * gamma), axis=-1, keepdims=True)
    d_u = d_y * gamma
    d_h = mm(d_u, w2_ref[:], ((1,), (1,)))  # (T,C)x(C4,C) -> (T,C4)
    # gelu'(a) = Phi(a) + a*phi(a)
    phi = jnp.exp(-0.5 * a * a) * 0.3989422804014327
    cdf = 0.5 * (1.0 + _erf(a * 0.7071067811865476))
    d_a = d_h * (cdf + a * phi)
    d_xn = mm(d_a, w1_ref[:], ((1,), (1,)))  # (T,C4)x(C,C4) -> (T,C)
    d_xhat = d_xn * lns
    m1 = jnp.mean(d_xhat, axis=-1, keepdims=True)
    m2 = jnp.mean(d_xhat * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (r * (d_xhat - m1 - xhat * m2)).astype(dx_ref.dtype)

    # --- parameter gradients: accumulate in scratch across the sequential
    # grid; the HBM outputs are written exactly once, at the last step.
    @pl.when(i == 0)
    def _init():
        aw1_ref[:] = jnp.zeros_like(aw1_ref)
        aw2_ref[:] = jnp.zeros_like(aw2_ref)
        asmall_ref[:] = jnp.zeros_like(asmall_ref)

    aw1_ref[:] += mm(xn, d_a, ((0,), (0,)))  # (C,C4)
    aw2_ref[:] += mm(h, d_u, ((0,), (0,)))  # (C4,C)
    asmall_ref[0, :c] += jnp.sum(d_xn * xhat, axis=0)  # d_ln_scale
    asmall_ref[1, :c] += jnp.sum(d_xn, axis=0)  # d_ln_bias
    asmall_ref[2, :] += jnp.sum(d_a, axis=0)  # d_b1 (full 4C row)
    asmall_ref[3, :c] += jnp.sum(d_u, axis=0)  # d_b2
    asmall_ref[4, :c] += jnp.sum(d_y * u, axis=0)  # d_gamma

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        dw1_ref[:] = aw1_ref[:]
        dw2_ref[:] = aw2_ref[:]
        dlns_ref[:] = asmall_ref[0:1, :c]
        dlnb_ref[:] = asmall_ref[1:2, :c]
        db1_ref[:] = asmall_ref[2:3, :]
        db2_ref[:] = asmall_ref[3:4, :c]
        dgamma_ref[:] = asmall_ref[4:5, :c]


def _bwd_chunk_rows(n: int, c: int) -> int:
    """Row-chunk the backward kernel call to shrink its HBM output tuple
    (d_x (n, c) f32 + the (c, 4c) weight grads).  Built for the round-5
    chipless-gate forensics: the local libtpu OOMs staging the STAGE-3 bwd
    kernel's 25.4 MB output tuple on the scoped-VMEM stack
    (artifacts/r05_queue/q_gate_ft_*.log).  Chunking shrank the tuple but
    the local compiler then staged MORE elsewhere and still OOM'd at the
    64 MB budget (q_gate_ft_chunk2048.log), and on the relay the chunked
    f32 step RAN at a 32 MB budget but 8x slower (536.0 vs 66.5 ms/step,
    q_ft_b32768_chunk2048_float32.log) — the placement XLA picks for the
    chunked calls is pathological.  The shipping fix is the DTYPE-aware
    scoped-VMEM budget (train/steps.py:train_step_compiler_options);
    chunking ships OFF, env TPU_CAPTIONER_MLP_BWD_CHUNK opts in (tests
    keep the path correct)."""
    ch = int(os.environ.get("TPU_CAPTIONER_MLP_BWD_CHUNK", "0"))
    if ch <= 0 or n <= ch:
        return 0
    # Only the mid-sized band is staged: stage-1/2 tuples (>=33 MB d_x)
    # already stream from HBM and stage 4 runs XLA under the fine-tune
    # policy — the gate log shows exactly one OOMing call, stage 3's
    # (8192, 512).  Chunk only that band so the small-stage grids keep
    # their single-call pipelining.
    dx_bytes = n * c * 4
    if not (12 * 1024 * 1024 < dx_bytes < 32 * 1024 * 1024):
        return 0
    return ch


def _bwd_pallas(g, x, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                mxu_dtype=jnp.float32):
    n, c = x.shape
    ch = _bwd_chunk_rows(n, c)
    if ch:
        n_chunks = (n + ch - 1) // ch
        if n % ch == 0:
            parts = [
                _bwd_pallas_one(
                    g[i * ch:(i + 1) * ch], x[i * ch:(i + 1) * ch],
                    sd_scale[i * ch:(i + 1) * ch],
                    ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                    mxu_dtype=mxu_dtype,
                )
                for i in range(n_chunks)
            ]
            d_x = jnp.concatenate([p[0] for p in parts], axis=0)
            d_sd = jnp.concatenate([p[1] for p in parts], axis=0)
            summed = [
                functools.reduce(jnp.add, (p[j] for p in parts))
                for j in range(2, 9)
            ]
            return (d_x, d_sd, *summed)
    return _bwd_pallas_one(
        g, x, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        mxu_dtype=mxu_dtype,
    )


def _bwd_pallas_one(g, x, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                    mxu_dtype=jnp.float32):
    n, c = x.shape
    c4 = w1.shape[1]
    # Stage-4 weights + weight-grad accumulators are 4 x 16.8 MB f32; keep the
    # row tile small enough that tile intermediates fit alongside them.
    tile = min(512 if c < 1024 else 256, n)
    grid = (pl.cdiv(n, tile),)
    kernel = functools.partial(_bwd_kernel, n_rows=n, mxu_dtype=mxu_dtype)
    est = 4 * (5 * tile * c + 4 * tile * c4 + 4 * c * c4 + 2 * (c + c4))
    vmem_cap = int(est * 1.25) if est > 14 * 1024 * 1024 else None
    row2 = lambda: pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col1 = lambda: pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, c), x.dtype),     # d_x
            jax.ShapeDtypeStruct((n, 1), f32),          # d_sd
            jax.ShapeDtypeStruct((1, c), f32),          # d_ln_scale
            jax.ShapeDtypeStruct((1, c), f32),          # d_ln_bias
            jax.ShapeDtypeStruct((c, c4), f32),         # d_w1
            jax.ShapeDtypeStruct((1, c4), f32),         # d_b1
            jax.ShapeDtypeStruct((c4, c), f32),         # d_w2
            jax.ShapeDtypeStruct((1, c), f32),          # d_b2
            jax.ShapeDtypeStruct((1, c), f32),          # d_gamma
        ),
        grid=grid,
        in_specs=[
            row2(), row2(), col1(),
            rep((1, c)), rep((1, c)),
            rep((c, c4)), rep((1, c4)),
            rep((c4, c)), rep((1, c)),
            rep((1, c)),
        ],
        out_specs=(
            row2(), col1(),
            rep((1, c)), rep((1, c)),
            rep((c, c4)), rep((1, c4)),
            rep((c4, c)), rep((1, c)),
            rep((1, c)),
        ),
        scratch_shapes=[
            pltpu.VMEM((c, c4), f32),   # d_w1 accumulator
            pltpu.VMEM((c4, c), f32),   # d_w2 accumulator
            pltpu.VMEM((5, c4), f32),   # lns/lnb/b1/b2/gamma accumulators
        ],
        compiler_params=pltpu.CompilerParams(
            # Sequential grid: the scratch accumulators carry across steps,
            # which "parallel" would not guarantee.
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_cap,
        ),
    )(
        g, x, sd_scale[:, None],
        ln_scale[None], ln_bias[None],
        w1, b1[None], w2, b2[None], gamma[None],
    )
    d_x, d_sd, d_lns, d_lnb, d_w1, d_b1, d_w2, d_b2, d_gamma = outs
    return (
        d_x,
        d_sd[:, 0].astype(sd_scale.dtype),
        d_lns[0].astype(ln_scale.dtype),
        d_lnb[0].astype(ln_bias.dtype),
        d_w1.astype(w1.dtype),
        d_b1[0].astype(b1.dtype),
        d_w2.astype(w2.dtype),
        d_b2[0].astype(b2.dtype),
        d_gamma[0].astype(gamma.dtype),
    )


def _fwd(x, residual, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
         use_pallas, precise):
    out = fused_convnext_mlp(
        x, residual, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        use_pallas, precise,
    )
    # The residual itself is NOT needed in the backward (its grad is the
    # cotangent); save only a dtype witness so d_residual matches its aval.
    res_dtype_witness = jnp.zeros((), residual.dtype)
    return out, (x, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                 res_dtype_witness)


def _bwd(use_pallas, precise, res, g):
    x, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma, res_w = res
    d_residual = g.astype(res_w.dtype)
    if os.environ.get("TPU_CAPTIONER_MLP_BWD") == "xla":
        use_pallas = False
    if use_pallas:
        (d_x, d_sd, d_lns, d_lnb, d_w1, d_b1, d_w2, d_b2, d_gamma) = _bwd_pallas(
            g, x, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
            mxu_dtype=jnp.float32 if precise else jnp.bfloat16,
        )
    else:
        _, vjp = jax.vjp(
            _core_impl, x, sd_scale, ln_scale, ln_bias, w1, b1, w2, b2, gamma
        )
        (d_x, d_sd, d_lns, d_lnb, d_w1, d_b1, d_w2, d_b2, d_gamma) = vjp(
            g.astype(jnp.float32)
        )
        # out = (residual + core).astype(x.dtype): fold the cast back in.
        d_x = d_x.astype(x.dtype)
    return (d_x, d_residual, d_sd, d_lns, d_lnb, d_w1, d_b1, d_w2, d_b2, d_gamma)


fused_convnext_mlp.defvjp(_fwd, _bwd)
