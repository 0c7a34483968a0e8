"""Functional NN primitives on explicit parameter pytrees.

The decoder families are written functionally (params dict in, arrays out)
rather than as linen modules: every decode loop here is a ``lax.scan`` /
``lax.while_loop`` with KV caches and beam reindexing, which stays simple
with explicit params and explicit PRNG keys.  Parameter layouts are JAX-style
(kernels are (fan_in, fan_out)); the torch porter transposes.

Includes torch-semantics building blocks used across decoders:
- ``linear`` / ``layer_norm`` / ``dropout``
- ``lstm_cell``: torch nn.LSTMCell gate order (i, f, g, o)
- ``multi_head_attention``: torch nn.MultiheadAttention with packed in-proj,
  scaling 1/sqrt(head_dim), optional attn-prob dropout, returns per-head
  weights for attention capture (transformerDecoderAttVis.py:72,83).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_captioner.models import torch_init

Params = Dict


# ---------------------------------------------------------------------------
# Param initializers
# ---------------------------------------------------------------------------

def init_linear(key, fan_in: int, fan_out: int, *, w_init=None, b_init=None) -> Params:
    kw, kb = jax.random.split(key)
    w_init = w_init or torch_init.linear_kaiming_weight()
    b_init = b_init or torch_init.linear_kaiming_bias(fan_in)
    return {"w": w_init(kw, (fan_in, fan_out)), "b": b_init(kb, (fan_out,))}


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def init_lstm_cell(key, input_size: int, hidden_size: int) -> Params:
    ks = jax.random.split(key, 4)
    u = torch_init.lstm_uniform(hidden_size)
    return {
        "w_ih": u(ks[0], (input_size, 4 * hidden_size)),
        "w_hh": u(ks[1], (hidden_size, 4 * hidden_size)),
        "b_ih": u(ks[2], (4 * hidden_size,)),
        "b_hh": u(ks[3], (4 * hidden_size,)),
    }


def init_mha(key, embed_dim: int) -> Params:
    """torch nn.MultiheadAttention: xavier-uniform packed in-proj, zero
    in-proj bias, default-Linear out-proj weight with zero bias."""
    k1, k2 = jax.random.split(key)
    return {
        "in_w": torch_init.xavier_uniform()(k1, (embed_dim, 3 * embed_dim)),
        "in_b": jnp.zeros((3 * embed_dim,)),
        "out_w": torch_init.linear_kaiming_weight()(k2, (embed_dim, embed_dim)),
        "out_b": jnp.zeros((embed_dim,)),
    }


# ---------------------------------------------------------------------------
# Forward primitives
# ---------------------------------------------------------------------------

def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


_POOL_LAYER: Optional[Tuple] = None  # (traced layer index, static layer count)


class pool_layer_scope:
    """Marks dropout sites traced inside as belonging to scanned-layer
    ``index`` of ``count`` identical layers.  A ``lax.scan`` over stacked
    layer params traces its body ONCE, so without this scope every layer
    would slice the SAME pool range and reuse identical masks (the
    reference uses independent per-layer masks — transformerDecoder.py
    layer dropouts).  Inside the scope each site reserves ``count * size``
    pool elements and slices its layer's stripe at ``index * size`` with a
    dynamic slice, so each layer gets independent bits from one body trace."""

    def __init__(self, index, count: int):
        self.index = index
        self.count = int(count)

    def __enter__(self):
        global _POOL_LAYER
        self._prev = _POOL_LAYER
        _POOL_LAYER = (self.index, self.count)
        return self

    def __exit__(self, *exc):
        global _POOL_LAYER
        _POOL_LAYER = self._prev
        return False


def pool_layer_info() -> Optional[Tuple]:
    """(traced index, static count) of the active scanned-layer scope, or
    None.  Consulted by MaskPool.take and the demand-counting trace."""
    return _POOL_LAYER


class MaskPool:
    """Flat pool of precomputed dropout keep-bits, consumed in trace order.

    One hardware-PRNG Pallas launch (ops/dropout_mask.py) fills the pool
    for a whole train step; each `dropout` site slices its elements out.
    Offsets are Python ints advanced at TRACE time — deterministic because
    tracing is — so the same program always assigns the same pool ranges
    to the same sites.  Sites inside a ``pool_layer_scope`` reserve a
    layer-count-wide stripe and dynamic-slice their layer's share (see
    pool_layer_scope).  Overdraw raises at trace (= compile) time, never
    silently."""

    def __init__(self, bits: jnp.ndarray, keep: Optional[float] = None):
        self.bits = bits
        self.keep = keep
        self.offset = 0

    def take(self, shape, keep: Optional[float] = None) -> jnp.ndarray:
        if (
            keep is not None and self.keep is not None
            and abs(keep - self.keep) > 1e-9
        ):
            raise ValueError(
                f"dropout site keep={keep} != pool keep={self.keep}; the "
                "pool is drawn at ONE rate — route this site around the pool"
            )
        n = math.prod(shape)
        layer = pool_layer_info()
        reserve = n if layer is None else n * layer[1]
        if self.offset + reserve > self.bits.shape[0]:
            raise ValueError(
                f"dropout mask pool exhausted: need {reserve} at offset "
                f"{self.offset}, pool holds {self.bits.shape[0]}"
            )
        if layer is None:
            sl = jax.lax.slice_in_dim(self.bits, self.offset, self.offset + n)
        else:
            idx, _ = layer
            start = self.offset + jnp.asarray(idx, jnp.int32) * n
            sl = jax.lax.dynamic_slice_in_dim(self.bits, start, n)
        self.offset += reserve
        return sl.reshape(shape)


_ACTIVE_MASK_POOL: Optional[MaskPool] = None


class mask_pool_scope:
    """Context manager installing a MaskPool for dropout() calls traced
    inside it (models/transformer.py / lstm.py sites all route through
    layers.dropout, so one scope covers a full decoder forward)."""

    def __init__(self, pool: Optional[MaskPool]):
        self.pool = pool

    def __enter__(self):
        global _ACTIVE_MASK_POOL
        self._prev = _ACTIVE_MASK_POOL
        _ACTIVE_MASK_POOL = self.pool
        return self.pool

    def __exit__(self, *exc):
        global _ACTIVE_MASK_POOL
        _ACTIVE_MASK_POOL = self._prev
        return False


def dropout(
    x: jnp.ndarray, rate: float, rng: Optional[jax.Array], deterministic: bool
) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    if _ACTIVE_MASK_POOL is not None:
        mask = _ACTIVE_MASK_POOL.take(x.shape, keep)
    else:
        mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def lstm_cell(
    p: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """torch nn.LSTMCell: gates (i, f, g, o) from one fused matmul pair."""
    gates = x @ p["w_ih"] + p["b_ih"] + h @ p["w_hh"] + p["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, t, e = x.shape
    return x.reshape(b, t, num_heads, e // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def mha_project_qkv(p: Params, q_in, k_in, v_in, num_heads: int):
    """Packed in-projection split into per-head q, k, v (B, H, T, Dh)."""
    e = q_in.shape[-1]
    wq, wk, wv = p["in_w"][:, :e], p["in_w"][:, e : 2 * e], p["in_w"][:, 2 * e :]
    bq, bk, bv = p["in_b"][:e], p["in_b"][e : 2 * e], p["in_b"][2 * e :]
    q = _split_heads(q_in @ wq + bq, num_heads)
    k = _split_heads(k_in @ wk + bk, num_heads)
    v = _split_heads(v_in @ wv + bv, num_heads)
    return q, k, v


def attention_core(
    q: jnp.ndarray,  # (B, H, Tq, Dh)
    k: jnp.ndarray,  # (B, H, Tk, Dh)
    v: jnp.ndarray,  # (B, H, Tk, Dh)
    mask: Optional[jnp.ndarray],  # broadcastable to (B, H, Tq, Tk); True = keep
    attn_dropout: float,
    rng: Optional[jax.Array],
    deterministic: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scaled dot-product attention; returns (context (B,H,Tq,Dh), probs)."""
    dh = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q / math.sqrt(dh), k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    # Fully-masked rows produce NaN; torch yields NaN there too, but those
    # rows are never consumed (loss-masked), so zero them for safety.
    probs = jnp.nan_to_num(probs, nan=0.0, posinf=0.0, neginf=0.0)
    probs_dropped = dropout(probs, attn_dropout, rng, deterministic)
    ctx = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs_dropped.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    return ctx, probs


def multi_head_attention(
    p: Params,
    query: jnp.ndarray,  # (B, Tq, E)
    key: jnp.ndarray,  # (B, Tk, E)
    value: jnp.ndarray,  # (B, Tk, E)
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    attn_dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full torch-equivalent MHA.  Returns (output (B,Tq,E), per-head attn
    probs (B,H,Tq,Tk) — pre-dropout, as torch's need_weights returns)."""
    q, k, v = mha_project_qkv(p, query, key, value, num_heads)
    ctx, probs = attention_core(q, k, v, mask, attn_dropout, rng, deterministic)
    out = _merge_heads(ctx) @ p["out_w"] + p["out_b"]
    return out, probs


def causal_mask(t: int) -> jnp.ndarray:
    """(1, 1, T, T) lower-triangular keep-mask (True = attend)."""
    return jnp.tril(jnp.ones((t, t), dtype=bool))[None, None]


def key_padding_to_mask(key_padding: jnp.ndarray) -> jnp.ndarray:
    """(B, Tk) True-where-pad -> (B, 1, 1, Tk) keep-mask."""
    return (~key_padding)[:, None, None, :]
