"""Pallas TPU kernel: fused LSTM+attention decode step.

One launch runs the full per-token body of the reference LSTM decoder
(models/decoder.py:104-161 — the per-step work its beam/greedy loops redo in
~50 small ops): Bahdanau additive attention against the precomputed
encoder projection, the sigmoid-gated context (f_beta), and the LSTMCell —
with every intermediate ((R, P, A) attention energies, (R, 4D) gates) living
only in VMEM.  The embedding lookup and the vocab head stay outside, same
division of labor as the transformer decode kernel (ops/decode_step.py).

Unlike the transformer step there is no KV cache — the whole recurrent
state is (h, c), two (R, D) arrays streamed per row tile — so the kernel is
a single-axis row-tile grid with all weights resident.

Layouts: the gate matmul is split as ``emb @ w_ih[:E] + ctx @ w_ih[E:]``
instead of concatenating ``[emb, ctx]`` (lane-dim concat has no reliable
Mosaic lowering); the full-attention projection (A -> 1) is a VPU
multiply-reduce rather than a 1-lane matmul.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class LstmStepWeights(NamedTuple):
    """Kernel-layout weights for one decode step (see prepare_lstm_weights)."""

    wd: jnp.ndarray  # (D, A)   decoder_att
    bd: jnp.ndarray  # (1, A)
    wfull: jnp.ndarray  # (1, A) full_att weight (used as a VPU reduce)
    bfull: jnp.ndarray  # (1, 1)
    wfb: jnp.ndarray  # (D, C)  f_beta gate
    bfb: jnp.ndarray  # (1, C)
    w_ih_e: jnp.ndarray  # (E, 4D) token-embedding half of w_ih
    w_ih_c: jnp.ndarray  # (C, 4D) context half of w_ih
    w_hh: jnp.ndarray  # (D, 4D)
    b: jnp.ndarray  # (1, 4D)  b_ih + b_hh  (field order == operand order)


def prepare_lstm_weights(p, embed_dim: int) -> LstmStepWeights:
    """Repack DecoderWithAttention params (models/lstm.py:init_params) into
    the kernel layout.  Cheap slices; run once per rollout/beam call."""
    att = p["attention"]
    e = embed_dim

    def b2(x):
        return x[None, :]

    return LstmStepWeights(
        wd=att["decoder_att"]["w"],
        bd=b2(att["decoder_att"]["b"]),
        wfull=att["full_att"]["w"].reshape(1, -1),
        bfull=att["full_att"]["b"].reshape(1, 1),
        wfb=p["f_beta"]["w"],
        bfb=b2(p["f_beta"]["b"]),
        w_ih_e=p["lstm"]["w_ih"][:e],
        w_ih_c=p["lstm"]["w_ih"][e:],
        w_hh=p["lstm"]["w_hh"],
        b=b2(p["lstm"]["b_ih"] + p["lstm"]["b_hh"]),
    )


def cast_lstm_weight_matrices(w: LstmStepWeights, dtype) -> LstmStepWeights:
    """bf16 the big matrices (MXU rounds them per use anyway — XLA DEFAULT
    class); biases and the VPU-reduce full_att vector stay f32."""
    return w._replace(
        **{
            f: getattr(w, f).astype(dtype)
            for f in ("wd", "wfb", "w_ih_e", "w_ih_c", "w_hh")
        }
    )


def _kernel(
    emb_ref, h_ref, c_ref, enc_ref, att1_ref,
    wd, bd, wfull, bfull, wfb, bfb, wihe, wihc, whh, b,
    h_out, c_out, alpha_out,
    *, mxu_dtype,
):
    R, D = h_ref.shape
    P = enc_ref.shape[1]

    def mm(a, w):
        return jnp.dot(
            a.astype(mxu_dtype), w.astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )

    h = h_ref[:].astype(jnp.float32)
    c = c_ref[:].astype(jnp.float32)

    # Additive attention (decoder.py:16-31): energies over the precomputed
    # encoder projection att1; the (A -> 1) projection is a multiply-reduce.
    att2 = mm(h, wd[:]) + bd[0]  # (R, A)
    e = jnp.maximum(att1_ref[:].astype(jnp.float32) + att2[:, None, :], 0.0)
    att = jnp.sum(e * wfull[0].astype(jnp.float32), axis=-1) + bfull[0, 0]
    mx = jnp.max(att, axis=1, keepdims=True)
    num = jnp.exp(att - mx)
    alpha = num / jnp.sum(num, axis=1, keepdims=True)  # (R, P)
    ctx = jnp.sum(
        alpha[:, :, None] * enc_ref[:].astype(jnp.float32), axis=1
    )  # (R, C)

    # Sigmoid-gated context (decoder.py:104-105).
    gate = jax.nn.sigmoid(mm(h, wfb[:]) + bfb[0])
    ctx = gate * ctx

    # torch nn.LSTMCell on [emb ; ctx] without the concat: split matmuls.
    gates = (
        mm(emb_ref[:], wihe[:]) + mm(ctx, wihc[:]) + mm(h, whh[:]) + b[0]
    )  # (R, 4D)
    i = jax.nn.sigmoid(gates[:, :D])
    f = jax.nn.sigmoid(gates[:, D : 2 * D])
    g = jnp.tanh(gates[:, 2 * D : 3 * D])
    o = jax.nn.sigmoid(gates[:, 3 * D :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    h_out[:] = h_new.astype(h_out.dtype)
    c_out[:] = c_new.astype(c_out.dtype)
    alpha_out[:] = alpha


def fused_lstm_step(
    w: LstmStepWeights,
    emb: jnp.ndarray,  # (R, E) token embeddings
    h: jnp.ndarray,  # (R, D)
    c: jnp.ndarray,  # (R, D)
    enc: jnp.ndarray,  # (R, P, C) flattened encoder output
    att1: jnp.ndarray,  # (R, P, A) precomputed encoder_att projection
    *,
    interpret: bool = False,
    precise: bool = None,
    row_tile: int = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (h_new (R, D) f32, c_new (R, D) f32, alpha (R, P) f32) ==
    DecoderWithAttention.step (models/lstm.py:112-118) in one launch.

    ``precise`` as in ops/decode_step.py: None -> f32 in interpret mode,
    bf16 MXU multiplicands on TPU (XLA DEFAULT class)."""
    if precise is None:
        precise = interpret
    R, D = h.shape
    P, A = att1.shape[1], att1.shape[2]
    C = enc.shape[2]
    RT = row_tile or (R if R <= 32 else 32)
    NR = pl.cdiv(R, RT)
    kernel = functools.partial(
        _kernel,
        mxu_dtype=jnp.float32 if precise else jnp.bfloat16,
    )
    perr = lambda shape: pl.BlockSpec(
        shape, lambda r: (r,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda r: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    h_new, c_new, alpha = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, D), jnp.float32),
            jax.ShapeDtypeStruct((R, D), jnp.float32),
            jax.ShapeDtypeStruct((R, P), jnp.float32),
        ),
        grid=(NR,),
        in_specs=[
            perr((RT, emb.shape[1])),
            perr((RT, D)),
            perr((RT, D)),
            perr((RT, P, C)),
            perr((RT, P, A)),
            *[const(tuple(a.shape)) for a in w],
        ],
        out_specs=(
            perr((RT, D)),
            perr((RT, D)),
            perr((RT, P)),
        ),
        interpret=interpret,
    )(emb, h, c, enc, att1, *w)
    return h_new, c_new, alpha
