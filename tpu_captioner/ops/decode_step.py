"""Pallas TPU kernel: fused KV-cached transformer decode step.

One kernel runs the FULL num_layers-deep decode body for one generated token
(reference per-step work: models/transformerDecoder.py:110-160 re-runs
nn.TransformerDecoder on the growing prefix; here the step is the KV-cached
equivalent): per layer — packed QKV projection, causal self-attention against
the cache (current token written first), cross-attention against precomputed
memory K/V, and the ReLU FFN, with all three post-norm LayerNorms.  The
hidden state ``x`` never leaves VMEM between layers; the grid walks layers
sequentially and Pallas pipelines each layer's weight fetch behind the
previous layer's compute.

Why: the XLA decode step is ~400 small HLO ops per step whose cost is linear
in rows and dominated by per-row vector work + op dispatch (BENCHMARKING.md
"Beam-search bottleneck analysis"); fusing the whole step turns it into one
launch whose cost approaches the HBM floor (weights + cache traffic).

Layouts (merged heads — no head-split padding):
- x:               (R, E)           rows = batch or batch*beams
- cache k/v:       (L, R, T, E)     self-attention cache, updated in place
- memory k/v:      (L, R, P, E)     cross K/V, precomputed once per image
- stacked weights: (L, fan_in, fan_out) / biases (L, 1, dim)

Per-head attention scores are computed WITHOUT materializing (B, H, T, dh)
tensors: with q pre-scaled, ``scores[r,t,h] = sum_e (k[r,t,e] * q[r,e]) *
sel[e,h]`` where ``sel`` is the 0/1 head-selector matrix — one elementwise
multiply plus one MXU matmul; the probs broadcast back through ``sel.T``.
This keeps every array's last dim at E (lane-aligned) instead of dh=64.

The embedding lookup and the vocab head stay outside (tiny / already
MXU-efficient in XLA).  Dropout is NOT supported — callers must be in
deterministic (eval) mode; the XLA path remains for training rollouts.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5


class DecodeWeights(NamedTuple):
    """Stacked (L, ...) kernel-layout decoder-layer weights."""

    w_qkv: jnp.ndarray  # (L, E, 3E)
    b_qkv: jnp.ndarray  # (L, 1, 3E)
    w_so: jnp.ndarray  # (L, E, E) self-attn out
    b_so: jnp.ndarray  # (L, 1, E)
    w_cq: jnp.ndarray  # (L, E, E) cross-attn query
    b_cq: jnp.ndarray  # (L, 1, E)
    w_co: jnp.ndarray  # (L, E, E) cross-attn out
    b_co: jnp.ndarray  # (L, 1, E)
    w_f1: jnp.ndarray  # (L, E, F)
    b_f1: jnp.ndarray  # (L, 1, F)
    w_f2: jnp.ndarray  # (L, F, E)
    b_f2: jnp.ndarray  # (L, 1, E)
    ln1_s: jnp.ndarray  # (L, 1, E)
    ln1_b: jnp.ndarray
    ln2_s: jnp.ndarray
    ln2_b: jnp.ndarray
    ln3_s: jnp.ndarray
    ln3_b: jnp.ndarray


def prepare_decode_weights(layers, embed_dim: int) -> DecodeWeights:
    """Repack TransformerDecoder's stacked layer params (models/transformer.py
    _init_layer) into the kernel layout.  Cheap (slices/reshapes), run once
    per rollout outside the decode scan."""
    e = embed_dim

    def b2(x):  # (L, D) -> (L, 1, D)
        return x[:, None, :]

    return DecodeWeights(
        w_qkv=layers["self_attn"]["in_w"],
        b_qkv=b2(layers["self_attn"]["in_b"]),
        w_so=layers["self_attn"]["out_w"],
        b_so=b2(layers["self_attn"]["out_b"]),
        w_cq=layers["cross_attn"]["in_w"][:, :, :e],
        b_cq=b2(layers["cross_attn"]["in_b"][:, :e]),
        w_co=layers["cross_attn"]["out_w"],
        b_co=b2(layers["cross_attn"]["out_b"]),
        w_f1=layers["linear1"]["w"],
        b_f1=b2(layers["linear1"]["b"]),
        w_f2=layers["linear2"]["w"],
        b_f2=b2(layers["linear2"]["b"]),
        ln1_s=b2(layers["norm1"]["scale"]),
        ln1_b=b2(layers["norm1"]["bias"]),
        ln2_s=b2(layers["norm2"]["scale"]),
        ln2_b=b2(layers["norm2"]["bias"]),
        ln3_s=b2(layers["norm3"]["scale"]),
        ln3_b=b2(layers["norm3"]["bias"]),
    )


def prepare_cross_memory(
    layers, mem: jnp.ndarray, embed_dim: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Projected memory (R, P, E) -> merged-head cross K/V (L, R, P, E)."""
    e = embed_dim

    def per_layer(pl_):
        wk = pl_["cross_attn"]["in_w"][:, e : 2 * e]
        bk = pl_["cross_attn"]["in_b"][e : 2 * e]
        wv = pl_["cross_attn"]["in_w"][:, 2 * e :]
        bv = pl_["cross_attn"]["in_b"][2 * e :]
        return mem @ wk + bk, mem @ wv + bv

    return jax.vmap(per_layer)(layers)


def _ln(x, s, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * s + b


def _layer_step(
    x, wq, bq, wso_, bso_, wcq_, bcq_, wco_, bco_,
    wf1_, bf1_, wf2_, bf2_, l1s, l1b, l2s, l2b, l3s, l3b,
    ck_l, cv_l, mk_l, mv_l,
    sel, keep, is_pos, scale, mm, num_layers,
):
    """One decoder layer of the fused step on ALREADY-SLICED per-layer
    operands; shared by the grid-walked kernel (static slice per cell) and
    the one-cell kernel (fori_loop dynamic slice).  Returns
    (x, alpha_contrib, k_new, v_new)."""
    R, E = x.shape
    T = ck_l.shape[1]
    P = mk_l.shape[1]
    H = sel.shape[1]

    # --- self-attention against the cache (token at `pos` written first,
    # matching decode_step's update-then-attend order) ----------------------
    qkv = mm(x, wq) + bq
    q = qkv[:, :E] * scale
    k_new = qkv[:, E : 2 * E]
    v_new = qkv[:, 2 * E :]

    ck = jnp.where(is_pos, k_new[:, None, :], ck_l.astype(jnp.float32))
    cv = jnp.where(is_pos, v_new[:, None, :], cv_l.astype(jnp.float32))

    prod = ck * q[:, None, :]  # (R, T, E)
    scores = mm(prod.reshape(R * T, E), sel).reshape(R, T, H)
    scores = jnp.where(keep, scores, -1e30)
    mx = jnp.max(scores, axis=1, keepdims=True)
    num = jnp.where(keep, jnp.exp(scores - mx), 0.0)
    probs = num / jnp.sum(num, axis=1, keepdims=True)
    pe = mm(probs.reshape(R * T, H), sel.T).reshape(R, T, E)
    ctx = jnp.sum(cv * pe, axis=1)  # (R, E)
    sa = mm(ctx, wso_) + bso_
    x = _ln(x + sa, l1s, l1b)

    # --- cross-attention against precomputed memory K/V --------------------
    q2 = (mm(x, wcq_) + bcq_) * scale
    mk = mk_l.astype(jnp.float32)  # (R, P, E)
    prod2 = mk * q2[:, None, :]
    scores2 = mm(prod2.reshape(R * P, E), sel).reshape(R, P, H)
    mx2 = jnp.max(scores2, axis=1, keepdims=True)
    num2 = jnp.exp(scores2 - mx2)
    probs2 = num2 / jnp.sum(num2, axis=1, keepdims=True)  # (R, P, H)
    pe2 = mm(probs2.reshape(R * P, H), sel.T).reshape(R, P, E)
    ctx2 = jnp.sum(mv_l.astype(jnp.float32) * pe2, axis=1)
    ca = mm(ctx2, wco_) + bco_

    # layers+heads-averaged map (transformerDecoderAttVis.py:223-226)
    alpha_contrib = jnp.mean(probs2, axis=2) / num_layers

    x = _ln(x + ca, l2s, l2b)

    # --- FFN ----------------------------------------------------------------
    h = jnp.maximum(mm(x, wf1_) + bf1_, 0.0)
    ff = mm(h, wf2_) + bf2_
    x = _ln(x + ff, l3s, l3b)
    return x, alpha_contrib, k_new, v_new


def _kernel(
    pos_ref, x_ref,
    wqkv, bqkv, wso, bso, wcq, bcq, wco, bco,
    wf1, bf1, wf2, bf2, ln1s, ln1b, ln2s, ln2b, ln3s, ln3b,
    memk, memv, ck_in, cv_in,
    x_out, alpha_out, knew_out, vnew_out,
    x_scr, alpha_scr,
    *, num_heads: int, num_layers: int, mxu_dtype,
):
    # Grid: (layer GROUPS, row tiles), groups OUTER — each cell runs
    # ``layers_per_cell`` consecutive decoder layers (the weight blocks'
    # leading dim), amortizing the ~50 us fixed per-grid-cell cost that
    # dominates at small row counts (BENCHMARKING.md round 3); cache/memory
    # blocks stream per (g, r).  The hidden state and alpha accumulator live
    # in full-size VMEM scratch, sliced per row tile (scratch persists
    # across the whole grid, so tile r's carry survives the non-consecutive
    # g visits).
    g = pl.program_id(0)
    ri = pl.program_id(1)
    pos = pos_ref[0, 0]
    R, E = x_ref.shape  # R = row-tile size here
    row0 = pl.multiple_of(ri * R, 8)
    H = num_heads
    dh = E // H
    scale = 1.0 / math.sqrt(dh)
    lpc = wqkv.shape[0]  # layers per grid cell
    n_groups = num_layers // lpc

    def mm(a, b):
        return jnp.dot(
            a.astype(mxu_dtype), b.astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )

    # Seed this row tile's carry from the input at the first layer (same
    # carry-in-scratch pattern as ops/mlp_block.py's backward accumulators).
    @pl.when(g == 0)
    def _():
        x_scr[pl.ds(row0, R), :] = x_ref[:].astype(jnp.float32)

    x = x_scr[pl.ds(row0, R), :]

    # 0/1 head selector: sel[e, h] = 1 iff lane e belongs to head h.
    e_ids = jax.lax.broadcasted_iota(jnp.int32, (E, H), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (E, H), 1)
    sel = ((e_ids // dh) == h_ids).astype(jnp.float32)

    T = ck_in.shape[2]
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
    is_pos = t_ids == pos
    keep = t_ids <= pos
    P = memk.shape[2]
    alpha_cell = jnp.zeros((R, P), jnp.float32)

    for j in range(lpc):  # static unroll over this cell's layers
        x, ac, k_new, v_new = _layer_step(
            x, wqkv[j], bqkv[j], wso[j], bso[j], wcq[j], bcq[j],
            wco[j], bco[j], wf1[j], bf1[j], wf2[j], bf2[j],
            ln1s[j], ln1b[j], ln2s[j], ln2b[j], ln3s[j], ln3b[j],
            ck_in[j], cv_in[j], memk[j], memv[j],
            sel, keep, is_pos, scale, mm, num_layers,
        )
        alpha_cell = alpha_cell + ac
        # Only the NEW row leaves the kernel — the caller inserts it with an
        # aliased dynamic_update_slice (apply_cache_update).  Writing the
        # whole where-merged cache back cost 4x (RT,T,E) HBM writes per step
        # for one fresh row each.
        knew_out[j] = k_new.astype(knew_out.dtype)
        vnew_out[j] = v_new.astype(vnew_out.dtype)

    x_scr[pl.ds(row0, R), :] = x

    @pl.when(g == 0)
    def _():
        alpha_scr[pl.ds(row0, R), :] = alpha_cell

    @pl.when(g > 0)
    def _():
        alpha_scr[pl.ds(row0, R), :] = alpha_scr[pl.ds(row0, R), :] + alpha_cell

    @pl.when(g == n_groups - 1)
    def _():
        x_out[:] = x.astype(x_out.dtype)
        alpha_out[:] = alpha_scr[pl.ds(row0, R), :]


def _kernel_onecell(
    pos_ref, x_ref,
    wqkv, bqkv, wso, bso, wcq, bcq, wco, bco,
    wf1, bf1, wf2, bf2, ln1s, ln1b, ln2s, ln2b, ln3s, ln3b,
    memk, memv, ck_in, cv_in,
    x_out, alpha_out, knew_out, vnew_out,
    *, num_heads: int, num_layers: int, mxu_dtype,
):
    # Grid: (row tiles,) — ONE cell runs ALL layers via an in-kernel
    # fori_loop over the RESIDENT (L, ...) weight/memory/cache blocks
    # (the mega-kernel's weights_resident dynamic-slice pattern).  Built
    # against the round-5 decode-floor finding that the ~27 us fixed cost
    # per grid cell dominates the six-cell kernel (BENCHMARKING.md
    # "Decode floor, MEASURED"): one cell pays it once instead of L times,
    # at the price of serializing the whole step's operand fetch into the
    # cell's prologue instead of pipelining it behind earlier layers.
    # The loop body compiles ONCE (no lpc=3-style unroll spill).
    pos = pos_ref[0, 0]
    R, E = x_ref.shape  # R = row-tile size here
    H = num_heads
    dh = E // H
    scale = 1.0 / math.sqrt(dh)
    T = ck_in.shape[2]
    P = memk.shape[2]

    def mm(a, b):
        return jnp.dot(
            a.astype(mxu_dtype), b.astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )

    e_ids = jax.lax.broadcasted_iota(jnp.int32, (E, H), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (E, H), 1)
    sel = ((e_ids // dh) == h_ids).astype(jnp.float32)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
    is_pos = t_ids == pos
    keep = t_ids <= pos

    def body(l, carry):
        x, alpha = carry

        def sl(ref):
            return ref[pl.ds(l, 1)][0]

        x, ac, k_new, v_new = _layer_step(
            x, sl(wqkv), sl(bqkv), sl(wso), sl(bso), sl(wcq), sl(bcq),
            sl(wco), sl(bco), sl(wf1), sl(bf1), sl(wf2), sl(bf2),
            sl(ln1s), sl(ln1b), sl(ln2s), sl(ln2b), sl(ln3s), sl(ln3b),
            sl(ck_in), sl(cv_in), sl(memk), sl(memv),
            sel, keep, is_pos, scale, mm, num_layers,
        )
        knew_out[pl.ds(l, 1)] = k_new[None].astype(knew_out.dtype)
        vnew_out[pl.ds(l, 1)] = v_new[None].astype(vnew_out.dtype)
        return x, alpha + ac

    x, alpha = jax.lax.fori_loop(
        0, num_layers,
        body,
        (x_ref[:].astype(jnp.float32), jnp.zeros((R, P), jnp.float32)),
    )
    x_out[:] = x.astype(x_out.dtype)
    alpha_out[:] = alpha


def fused_decode_step(
    w: DecodeWeights,
    x: jnp.ndarray,  # (R, E) embedded token (+PE) at `pos`
    pos: jnp.ndarray,  # scalar int32
    cache_k: jnp.ndarray,  # (L, R, T, E)
    cache_v: jnp.ndarray,  # (L, R, T, E)
    mem_k: jnp.ndarray,  # (L, R, P, E)
    mem_v: jnp.ndarray,  # (L, R, P, E)
    num_heads: int,
    *,
    interpret: bool = False,
    precise: bool = None,
    row_tile: int = None,
    layers_per_cell: int = None,
    one_cell: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (x_out (R, E) f32, alpha (R, P) f32, k_new (L, R, E),
    v_new (L, R, E)).  The caches are READ-only here; insert the new rows
    with ``apply_cache_update(cache_k, cache_v, k_new, v_new, pos)`` —
    attention inside the kernel already saw k/v at ``pos`` (register merge),
    so the external insert is pure persistence for the NEXT step and costs
    2 (L, R, 1, E) writes instead of 4 full-cache transfers.

    ``precise``: f32 MXU multiplicands when True, bf16 (f32 accumulation)
    when False.  Default (None) resolves to f32 in interpret mode (exact
    CPU parity tests) and bf16 on TPU — the same one-pass-bf16 class as
    XLA's DEFAULT matmul precision that the rest of the f32 model already
    runs under on TPU (measured: 17.8 vs 21.0 ms/rollout at B=32).

    ``layers_per_cell``: decoder layers executed per grid cell (must divide
    L).  Default 1 — packing was built to amortize the ~50 us fixed cost
    per grid cell that dominates at small row counts, but measured 7.6x
    WORSE at flagship scale (R=32, bf16: 0.33 -> 2.54 ms/step; the
    3x-unrolled body appears to spill and compiles 10x slower), so it ships
    off.  See BENCHMARKING.md round 3."""
    if precise is None:
        precise = interpret
    L, R, T, E = cache_k.shape
    P = mem_k.shape[2]
    # Row-tile so per-step VMEM stays bounded at large R (beam: R = B*k).
    # At RT=32 a step holds ~8 MB weights + ~26 MB mem/cache blocks (f32),
    # comfortably double-bufferable; one-tile fast path for greedy eval.
    RT = row_tile or (R if R <= 32 else 32)
    NR = pl.cdiv(R, RT)
    if one_cell is None:
        one_cell = _onecell_default(w, mem_k, mem_v, cache_k, RT)
    if one_cell and row_tile is None and R > 32:
        # One-cell mode keeps ALL stacked weights resident (~44 MB bf16 at
        # flagship); RT=32 per-row blocks (~40 MB) double-buffered on top
        # exceed the 128 MB VMEM by ~5.5 MB at beam R=160 — halve the tile.
        RT = 16
        NR = pl.cdiv(R, RT)
    if layers_per_cell is None:
        # Default 1: packing measured WORSE at flagship scale — lpc=3 bf16
        # at R=32 ran 2.54 ms/step vs lpc=1's 0.33 (and took a 20-minute
        # Mosaic compile; the 3x-unrolled body appears to spill).  The knob
        # stays for shapes where per-cell fixed cost dominates differently.
        layers_per_cell = 1
    LPC = layers_per_cell
    if L % LPC != 0:
        raise ValueError(f"layers_per_cell={LPC} must divide num_layers={L}")
    pos2 = jnp.reshape(pos.astype(jnp.int32), (1, 1))
    if one_cell:
        return _call_onecell(
            w, pos2, x, cache_k, cache_v, mem_k, mem_v, num_heads,
            interpret=interpret, precise=precise, RT=RT, NR=NR,
        )
    kernel = functools.partial(
        _kernel,
        num_heads=num_heads,
        num_layers=L,
        mxu_dtype=jnp.float32 if precise else jnp.bfloat16,
    )
    perr = lambda shape: pl.BlockSpec(
        shape, lambda g, r: (r,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )
    perl = lambda shape: pl.BlockSpec(
        (LPC,) + shape, lambda g, r: (g,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    perlr = lambda shape: pl.BlockSpec(
        (LPC,) + shape, lambda g, r: (g, r) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )
    weight_specs = [perl(tuple(arr.shape[1:])) for arr in w]
    x_out, alpha, k_new, v_new = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, E), jnp.float32),
            jax.ShapeDtypeStruct((R, P), jnp.float32),
            jax.ShapeDtypeStruct((L, R, E), cache_k.dtype),
            jax.ShapeDtypeStruct((L, R, E), cache_v.dtype),
        ),
        grid=(L // LPC, NR),
        in_specs=[
            pl.BlockSpec((1, 1), lambda g, r: (0, 0), memory_space=pltpu.SMEM),
            perr((RT, E)),
            *weight_specs,
            perlr((RT, P, E)),
            perlr((RT, P, E)),
            perlr((RT, T, E)),
            perlr((RT, T, E)),
        ],
        out_specs=(
            perr((RT, E)),
            perr((RT, P)),
            perlr((RT, E)),
            perlr((RT, E)),
        ),
        scratch_shapes=[
            pltpu.VMEM((NR * RT, E), jnp.float32),  # x carry across layers
            pltpu.VMEM((NR * RT, P), jnp.float32),  # alpha accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            # x/alpha accumulate across grid steps -> sequential grid.
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(pos2, x, *w, mem_k, mem_v, cache_k, cache_v)
    return x_out, alpha, k_new, v_new


def _onecell_default(w, mem_k, mem_v, cache_k, RT) -> bool:
    """The one-cell kernel ships OFF: the round-5 on-chip A/B
    (artifacts/r05_queue/q_onecell_*.json, same relay session per pair)
    measured it SLOWER in both contexts — greedy eval 33.4 vs 30.4
    ms/batch32 bf16, beam-5 247.3 vs 254.7 caps/s.  Residency serializes
    the whole step's operand fetch into the cell prologue, losing more
    than the 5 saved grid-cell transitions: the ~27 us/cell 'fixed cost'
    of the grid-walked kernel is mostly covered fetch latency, not
    removable sequencing overhead (BENCHMARKING.md 'One-cell decode
    kernel').  Env TPU_CAPTIONER_DECODE_ONECELL=1/0 forces it for
    re-measurement on future toolchains."""
    import os

    return os.environ.get(
        "TPU_CAPTIONER_DECODE_ONECELL", ""
    ).strip() == "1"


def _call_onecell(
    w, pos2, x, cache_k, cache_v, mem_k, mem_v, num_heads,
    *, interpret, precise, RT, NR,
):
    L, R, T, E = cache_k.shape
    P = mem_k.shape[2]
    kernel = functools.partial(
        _kernel_onecell,
        num_heads=num_heads,
        num_layers=L,
        mxu_dtype=jnp.float32 if precise else jnp.bfloat16,
    )
    perr = lambda shape: pl.BlockSpec(
        shape, lambda r: (r,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda r: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    allr = lambda shape: pl.BlockSpec(  # (L, RT, ...) blocks, row-indexed
        (L,) + shape, lambda r: (0, r) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )
    weight_specs = [const(tuple(a.shape)) for a in w]
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, E), jnp.float32),
            jax.ShapeDtypeStruct((R, P), jnp.float32),
            jax.ShapeDtypeStruct((L, R, E), cache_k.dtype),
            jax.ShapeDtypeStruct((L, R, E), cache_v.dtype),
        ),
        grid=(NR,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda r: (0, 0), memory_space=pltpu.SMEM),
            perr((RT, E)),
            *weight_specs,
            allr((RT, P, E)),
            allr((RT, P, E)),
            allr((RT, T, E)),
            allr((RT, T, E)),
        ],
        out_specs=(
            perr((RT, E)),
            perr((RT, P)),
            allr((RT, E)),
            allr((RT, E)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(pos2, x, *w, mem_k, mem_v, cache_k, cache_v)


def apply_cache_update(
    cache_k: jnp.ndarray,  # (L, R, T, E)
    cache_v: jnp.ndarray,
    k_new: jnp.ndarray,  # (L, R, E)
    v_new: jnp.ndarray,
    pos: jnp.ndarray,  # scalar int32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Insert the step's per-layer K/V rows at position ``pos``.  With the
    caches threaded through a scan/while carry, XLA performs this update in
    place (the same aliasable dynamic_update_slice the XLA decode path's
    ``inplace_cache`` relies on)."""
    z = jnp.zeros((), jnp.int32)
    ck = jax.lax.dynamic_update_slice(
        cache_k, k_new[:, :, None, :].astype(cache_k.dtype), (z, z, pos, z)
    )
    cv = jax.lax.dynamic_update_slice(
        cache_v, v_new[:, :, None, :].astype(cache_v.dtype), (z, z, pos, z)
    )
    return ck, cv


def cast_weight_matrices(w: DecodeWeights, dtype) -> DecodeWeights:
    """Pre-cast the six big weight MATRICES (not biases/LN params) for the
    kernel's MXU.  With the kernel's default bf16 multiplicands this is
    numerically identical to the in-kernel per-use cast — XLA's DEFAULT
    matmul precision class — but the weights then STREAM from HBM at half
    the bytes (~24 MB/step saved at f32 model params)."""
    return w._replace(
        **{
            f: getattr(w, f).astype(dtype)
            for f in ("w_qkv", "w_so", "w_cq", "w_co", "w_f1", "w_f2")
        }
    )


# ---------------------------------------------------------------------------
# Whole-rollout mega-kernel: ALL greedy decode steps in ONE launch
# ---------------------------------------------------------------------------

def _mega_kernel(
    seed_tok_ref, teacher_ref, use_teacher_ref, pe_ref,
    wqkv, bqkv, wso, bso, wcq, bcq, wco, bco,
    wf1, bf1, wf2, bf2, ln1s, ln1b, ln2s, ln2b, ln3s, ln3b,
    emb_ref, fcw_ref, fcb_ref, memk, memv,
    logits_out, seqs_out, alpha_out,
    x_scr, alpha_scr, ck_scr, cv_scr, tok_scr, fin_scr,
    *, num_heads: int, num_layers: int, end_id: int, mxu_dtype,
    weights_resident: bool,
):
    # Grid (steps, L+1): cell (s, l<L) runs decoder layer l for token s
    # (cell 0 additionally embeds the fed-back token), cell (s, L) runs the
    # vocab head + argmax + feedback epilogue.  One grid cell per layer keeps
    # the Mosaic kernel body ~L+1x smaller than a static layer unroll (the
    # unrolled form OOM-killed the TPU compiler at flagship size).  The
    # hidden state, attention-map accumulator, KV caches and token/finished
    # flags all persist in VMEM scratch across cells (sequential grid).
    s = pl.program_id(0)
    l = pl.program_id(1)
    L = num_layers
    R, P, E = memk.shape[-3], memk.shape[-2], memk.shape[-1]
    T = ck_scr.shape[2]
    V = fcw_ref.shape[1]
    H = num_heads
    dh = E // H
    scale = 1.0 / math.sqrt(dh)
    li = jnp.minimum(l, L - 1)  # clamp for the epilogue cell's index maps

    if weights_resident:
        # Whole (L, ...) arrays live in VMEM; dynamic-slice layer l out.
        def wload(ref):
            return ref[pl.ds(li, 1)][0]
    else:
        # Per-layer (1, ...) blocks streamed by the index maps.
        def wload(ref):
            return ref[0]

    def mm(a, b):
        return jnp.dot(
            a.astype(mxu_dtype), b.astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )

    @pl.when((s == 0) & (l == 0))
    def _():
        tok_scr[:] = seed_tok_ref[:]
        fin_scr[:] = jnp.zeros_like(fin_scr)
        # Uninitialized VMEM may hold NaN; masked positions still touch it
        # via `cv * weights(=0)` (NaN * 0 = NaN), so zero the caches once.
        ck_scr[:] = jnp.zeros_like(ck_scr)
        cv_scr[:] = jnp.zeros_like(cv_scr)

    v_ids = jax.lax.broadcasted_iota(jnp.int32, (R, V), 1)

    @pl.when(l == 0)
    def _():
        tok = tok_scr[0]  # (R,) int32
        # Scheduled-sampling mix happens on the INPUT token
        # (models/transformer.py rollout body); masks precomputed on host.
        tok = jnp.where(use_teacher_ref[0, 0] != 0, teacher_ref[0, 0], tok)
        # Store the POST-mix token: the epilogue's feedback keeps it for
        # frozen rows (rollout semantics).
        tok_scr[0] = tok
        # Embedding lookup as a one-hot matmul (MXU-friendly row gather),
        # then +PE at position s (deterministic mode: no dropout).
        tok_col = tok.reshape(R, 1)
        onehot = (v_ids == tok_col).astype(jnp.float32)
        x_scr[:] = mm(onehot, emb_ref[:]) + pe_ref[0]  # (R, E) + (1, E)
        alpha_scr[:] = jnp.zeros_like(alpha_scr)

    t_ids = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)

    @pl.when(l < L)
    def _():
        e_ids = jax.lax.broadcasted_iota(jnp.int32, (E, H), 0)
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (E, H), 1)
        sel = ((e_ids // dh) == h_ids).astype(jnp.float32)
        keep = t_ids <= s
        is_pos = t_ids == s
        x = x_scr[:]
        qkv = mm(x, wload(wqkv)) + wload(bqkv)
        q = qkv[:, :E] * scale
        # where-based column insert (dynamic-offset stores into the T dim of
        # a 4D scratch don't lower on TPU).  Slice-then-expand: `qkv[:, None,
        # a:b]` traces to a `gather` (no Mosaic lowering); `qkv[:, a:b][:,
        # None]` is a static lax.slice.  Full-cache VMEM rewrite is cheap.
        ck = jnp.where(
            is_pos, qkv[:, E : 2 * E][:, None, :],
            ck_scr[pl.ds(li, 1)][0].astype(jnp.float32),
        )
        cv = jnp.where(
            is_pos, qkv[:, 2 * E :][:, None, :],
            cv_scr[pl.ds(li, 1)][0].astype(jnp.float32),
        )
        ck_scr[pl.ds(li, 1)] = ck[None].astype(ck_scr.dtype)
        cv_scr[pl.ds(li, 1)] = cv[None].astype(cv_scr.dtype)
        prod = ck * q[:, None, :]
        scores = mm(prod.reshape(R * T, E), sel).reshape(R, T, H)
        scores = jnp.where(keep, scores, -1e30)
        mx = jnp.max(scores, axis=1, keepdims=True)
        num = jnp.where(keep, jnp.exp(scores - mx), 0.0)
        probs = num / jnp.sum(num, axis=1, keepdims=True)
        pe_b = mm(probs.reshape(R * T, H), sel.T).reshape(R, T, E)
        ctx = jnp.sum(cv * pe_b, axis=1)
        sa = mm(ctx, wload(wso)) + wload(bso)
        x = _ln(x + sa, wload(ln1s), wload(ln1b))

        q2 = (mm(x, wload(wcq)) + wload(bcq)) * scale
        mk = wload(memk).astype(jnp.float32)
        prod2 = mk * q2[:, None, :]
        scores2 = mm(prod2.reshape(R * P, E), sel).reshape(R, P, H)
        mx2 = jnp.max(scores2, axis=1, keepdims=True)
        num2 = jnp.exp(scores2 - mx2)
        probs2 = num2 / jnp.sum(num2, axis=1, keepdims=True)
        pe2 = mm(probs2.reshape(R * P, H), sel.T).reshape(R, P, E)
        ctx2 = jnp.sum(wload(memv).astype(jnp.float32) * pe2, axis=1)
        ca = mm(ctx2, wload(wco)) + wload(bco)
        alpha_scr[:] = alpha_scr[:] + jnp.mean(probs2, axis=2) / L
        x = _ln(x + ca, wload(ln2s), wload(ln2b))

        h = jnp.maximum(mm(x, wload(wf1)) + wload(bf1), 0.0)
        ff = mm(h, wload(wf2)) + wload(bf2)
        x_scr[:] = _ln(x + ff, wload(ln3s), wload(ln3b))

    @pl.when(l == L)
    def _():
        # Vocab head + greedy argmax (first-max-index, matching jnp.argmax).
        x = x_scr[:]
        logits = mm(x, fcw_ref[:]) + fcb_ref[0]  # (R, V) f32
        mxl = jnp.max(logits, axis=1, keepdims=True)
        pred = jnp.min(
            jnp.where(logits == mxl, v_ids, V), axis=1
        ).astype(jnp.int32)  # (R,)

        tok = tok_scr[0]  # post-mix input token (see l==0 cell)
        fin = fin_scr[0]  # (R,) int32 (0/1)
        act = fin == 0
        # 2D mask built from a 32-bit reshape: Mosaic can't reshape i1
        # vectors ((R,) -> (R,1) "insertion of minor dim" is 32-bit-only).
        act_col = fin.reshape(R, 1) == 0
        logits_out[0] = jnp.where(act_col, logits, 0.0).astype(logits_out.dtype)
        seqs_out[0, 0] = jnp.where(act, pred, 0)
        alpha_out[0] = jnp.where(act_col, alpha_scr[:], 0.0)
        # Feedback carries the POST-mix token for frozen rows.
        tok_scr[0] = jnp.where(act, pred, tok)
        fin_scr[0] = jnp.where(act & (pred == end_id), 1, fin)


def fused_full_rollout(
    w: DecodeWeights,
    embedding: jnp.ndarray,  # (V, E) — pre-zeroed pad row if required
    fc_w: jnp.ndarray,  # (E, V)
    fc_b: jnp.ndarray,  # (V,)
    pe: jnp.ndarray,  # (>=steps, E) positional table
    mem_k: jnp.ndarray,  # (L, R, P, E)
    mem_v: jnp.ndarray,
    start_id: int,
    end_id: int,
    steps: int,
    num_heads: int,
    *,
    teacher: jnp.ndarray = None,  # (steps, R) int32
    use_teacher: jnp.ndarray = None,  # (steps, R) bool/int32
    interpret: bool = False,
    precise: bool = None,
    weights_resident: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ENTIRE greedy rollout — vocab head, argmax, token feedback, one-hot
    embedding lookup and all ``steps`` KV-cached decode steps — as ONE Pallas
    launch over a (steps, L+1) grid (one decoder layer per cell + a vocab-
    head epilogue cell; a statically unrolled body OOM-killed the compiler).
    With ``weights_resident`` the layer weights, embedding/vocab tables and
    cross K/V live in VMEM for the whole generation — per-token HBM traffic
    is just the logits/seqs/alphas writes; otherwise the layer weights and
    cross K/V stream per (step, layer).  The self-attention caches never
    exist outside VMEM scratch either way.  Deterministic mode only
    (eval/test/caption).  Pass bf16 weight/memory arrays to fit the flagship
    in VMEM; f32 compute throughout, matmuls per ``precise`` (see
    fused_decode_step).

    Returns (logits (R, steps, V) f32, seqs (R, steps) i32, alphas
    (R, steps, P) f32) with rows finished earlier zeroed — identical
    semantics to TransformerDecoder.rollout.
    """
    if precise is None:
        precise = interpret
    L, R, P, E = mem_k.shape
    V = fc_w.shape[1]
    T = steps + 1
    if teacher is None:
        teacher = jnp.zeros((steps, R), jnp.int32)
        use_teacher = jnp.zeros((steps, R), jnp.int32)
    # (steps, R) -> (steps, 1, R): TPU block specs need the last two block
    # dims divisible by (8, 128) or equal to the array dims.
    teacher3 = teacher.astype(jnp.int32)[:, None, :]
    use3 = use_teacher.astype(jnp.int32)[:, None, :]
    kernel = functools.partial(
        _mega_kernel,
        num_heads=num_heads,
        num_layers=L,
        end_id=end_id,
        mxu_dtype=jnp.float32 if precise else jnp.bfloat16,
        weights_resident=weights_resident,
    )
    seed_tok = jnp.full((1, R), start_id, jnp.int32)
    const = lambda shape: pl.BlockSpec(
        shape, lambda s, l: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    pers = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda s, l: (s,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    if weights_resident:
        weight_specs = [const(tuple(a.shape)) for a in w]
        mem_spec = const((L, R, P, E))
    else:
        # Stream layer l's slice per cell; the epilogue cell clamps to L-1
        # (same block as the last layer -> no extra fetch).
        perl = lambda shape: pl.BlockSpec(
            (1,) + shape,
            lambda s, l: (jnp.minimum(l, L - 1),) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )
        weight_specs = [perl(tuple(a.shape[1:])) for a in w]
        mem_spec = perl((R, P, E))
    logits, seqs, alphas = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((steps, R, V), jnp.float32),
            jax.ShapeDtypeStruct((steps, 1, R), jnp.int32),
            jax.ShapeDtypeStruct((steps, R, P), jnp.float32),
        ),
        grid=(steps, L + 1),
        in_specs=[
            const((1, R)),
            pers((1, R)),
            pers((1, R)),
            pers((1, E)),  # PE row for this step
            *weight_specs,
            const((V, E)),
            const((E, V)),
            const((1, V)),
            mem_spec,
            mem_spec,
        ],
        out_specs=(
            pers((R, V)),
            pers((1, R)),
            pers((R, P)),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, E), jnp.float32),  # hidden-state carry
            pltpu.VMEM((R, P), jnp.float32),  # attention-map accumulator
            pltpu.VMEM((L, R, T, E), mem_k.dtype),  # self-attn K cache
            pltpu.VMEM((L, R, T, E), mem_k.dtype),  # self-attn V cache
            pltpu.VMEM((1, R), jnp.int32),  # current token
            pltpu.VMEM((1, R), jnp.int32),  # finished flags
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        seed_tok, teacher3, use3,
        pe[:steps, None, :].astype(jnp.float32),
        *w, embedding, fc_w, fc_b[None], mem_k, mem_v,
    )
    return (
        jnp.swapaxes(logits, 0, 1),
        jnp.swapaxes(seqs[:, 0, :], 0, 1),
        jnp.swapaxes(alphas, 0, 1),
    )


def merge_cache_heads(cache_split: jnp.ndarray) -> jnp.ndarray:
    """(L, B, H, T, dh) split-head cache -> (L, B, T, E) kernel layout."""
    L, B, H, T, dh = cache_split.shape
    return cache_split.transpose(0, 1, 3, 2, 4).reshape(L, B, T, H * dh)


def split_cache_heads(cache_merged: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(L, B, T, E) kernel layout -> (L, B, H, T, dh)."""
    L, B, T, E = cache_merged.shape
    dh = E // num_heads
    return cache_merged.reshape(L, B, T, num_heads, dh).transpose(0, 1, 3, 2, 4)
