"""Jitted fixed-shape beam search with KV caches and attention-map tracking.

Replaces the reference's three Python beam-search drivers (caption.py:
caption_image_beam_search :39-155, ..._transformer :160-255,
..._transformer_attention :260-383) with ONE device-resident
``lax.while_loop`` shared by all decoder families.  Reference semantics
reproduced exactly, per image:

- cumulative log-softmax scores; step-1 candidates come from beam 0 only
  (caption.py:109-110) — expressed as an initial one-hot alive mask;
- top-k over the live beams' (k x V) candidates; ``prev = idx // V``,
  ``word = idx % V`` (caption.py:116-117);
- beams that emit <end> are harvested and the live width shrinks
  (caption.py:125-133): here a slot-admission mask (rank < live_count) plus a
  running archive max — identical to the reference's harvest-then-argmax;
- loop ends when no live beams remain or after 50 extension steps
  (caption.py:136,147);
- per-step attention maps ride along and are re-gathered on every beam
  reshuffle (caption.py:122, 349-353).

TPU-native gains over the reference: the transformer path extends ONE cached
token per step against precomputed memory K/V instead of re-running the full
decoder on the growing prefix (caption.py:204-216, O(L^2) recompute), and the
whole search is one compiled program.  The loop is BATCHED across images —
every decode step runs once over all B*k rows (beam bookkeeping is
vectorized per image), so the model step amortizes weight traffic across the
whole batch instead of per-image vmap instances; with the fused decode-step
kernel (ops/decode_step.py) the transformer step is a single Pallas launch.
Images whose beams all finish have their carries frozen by masking until the
last image completes.

Improvement over the reference (documented divergence): if no beam completes
within the step cap, the reference crashes (max() of an empty list,
caption.py:151); here the best live beam is returned instead.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from tpu_captioner.models.layers import linear
from tpu_captioner.models.lstm import _flatten_pixels


class BeamResult(NamedTuple):
    sequence: jnp.ndarray  # (L,) int32, starts with <start>; padded with 0
    length: jnp.ndarray  # scalar int32 — tokens incl. <start> and <end>
    alphas: jnp.ndarray  # (L, P) — attention map per emitted token (0 at t=0)
    score: jnp.ndarray  # scalar f32 — cumulative log-prob
    # (beam_search_batch returns the same fields with a leading image axis)


class _Carry(NamedTuple):
    t: jnp.ndarray
    prev_words: jnp.ndarray  # (B, k)
    cum: jnp.ndarray  # (B, k) cumulative scores (-inf = dead slot)
    alive: jnp.ndarray  # (B, k) bool
    live: jnp.ndarray  # (B,) int32 — beams still searching per image
    seqs: jnp.ndarray  # (B, k, L)
    alpha_hist: jnp.ndarray  # (B, k, L, P)
    model_state: Any  # decoder-specific (h/c or KV cache), rows = B*k
    best_score: jnp.ndarray  # (B,)
    best_seq: jnp.ndarray  # (B, L)
    best_alpha: jnp.ndarray  # (B, L, P)
    best_len: jnp.ndarray  # (B,)


def _beam_loop(
    step_fn: Callable,  # (state, prev_words (B,k), pos) -> (state, logits (B,k,V), alpha (B,k,P))
    gather_fn: Callable,  # (state, rows (B*k,)) -> state  [global row gather]
    init_state: Any,
    batch: int,
    beam_size: int,
    max_steps: int,
    seq_len: int,
    num_pixels: int,
    start_id: int,
    end_id: int,
    vocab_size: int,
) -> BeamResult:
    B, k = batch, beam_size
    seqs0 = jnp.zeros((B, k, seq_len), jnp.int32).at[:, :, 0].set(start_id)
    carry = _Carry(
        t=jnp.int32(1),
        prev_words=jnp.full((B, k), start_id, jnp.int32),
        cum=jnp.zeros((B, k), jnp.float32),
        alive=jnp.broadcast_to(jnp.arange(k) == 0, (B, k)),  # step-1: beam 0
        live=jnp.full((B,), k, jnp.int32),
        seqs=seqs0,
        alpha_hist=jnp.zeros((B, k, seq_len, num_pixels), jnp.float32),
        model_state=init_state,
        best_score=jnp.full((B,), -jnp.inf, jnp.float32),
        best_seq=jnp.zeros((B, seq_len), jnp.int32),
        best_alpha=jnp.zeros((B, seq_len, num_pixels), jnp.float32),
        best_len=jnp.zeros((B,), jnp.int32),
    )

    def cond(c: _Carry):
        return jnp.any(c.live > 0) & (c.t <= max_steps + 1)

    def body(c: _Carry):
        # Finished images keep stepping (their rows are frozen by the masks
        # below and their model-state rows are never read again).
        frozen = c.live == 0  # (B,)
        new_state, logits, alpha = step_fn(c.model_state, c.prev_words, c.t - 1)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        cand = jnp.where(c.alive[:, :, None], c.cum[:, :, None] + logp, -jnp.inf)
        top_scores, top_idx = jax.lax.top_k(cand.reshape(B, k * vocab_size), k)
        prev_idx = top_idx // vocab_size  # (B, k) in [0, k)
        words = (top_idx % vocab_size).astype(jnp.int32)

        admitted = (jnp.arange(k)[None, :] < c.live[:, None]) & ~frozen[:, None]
        is_end = words == end_id

        def take(x, idx):  # x (B, k, ...), idx (B, k) -> reshuffled beams
            return jnp.take_along_axis(
                x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
            )

        new_seqs = take(c.seqs, prev_idx).at[:, :, c.t].set(words)
        new_hist = take(c.alpha_hist, prev_idx).at[:, :, c.t].set(
            take(alpha, prev_idx)
        )
        # Frozen images must keep their final seqs/history bit-exact.
        new_seqs = jnp.where(frozen[:, None, None], c.seqs, new_seqs)
        new_hist = jnp.where(frozen[:, None, None, None], c.alpha_hist, new_hist)

        # Harvest completed beams into the running-max archive (per image).
        comp_scores = jnp.where(admitted & is_end, top_scores, -jnp.inf)
        b = jnp.argmax(comp_scores, axis=1)  # (B,)
        b_score = jnp.take_along_axis(comp_scores, b[:, None], axis=1)[:, 0]
        improved = b_score > c.best_score
        best_score = jnp.where(improved, b_score, c.best_score)
        b_seq = jnp.take_along_axis(new_seqs, b[:, None, None], axis=1)[:, 0]
        b_alpha = jnp.take_along_axis(new_hist, b[:, None, None, None], axis=1)[:, 0]
        best_seq = jnp.where(improved[:, None], b_seq, c.best_seq)
        best_alpha = jnp.where(improved[:, None, None], b_alpha, c.best_alpha)
        best_len = jnp.where(improved, c.t + 1, c.best_len)

        alive = admitted & ~is_end
        rows = (jnp.arange(B)[:, None] * k + prev_idx).reshape(-1)
        return _Carry(
            t=c.t + 1,
            prev_words=jnp.where(frozen[:, None], c.prev_words, words),
            cum=jnp.where(
                frozen[:, None], c.cum, jnp.where(alive, top_scores, -jnp.inf)
            ),
            alive=alive,
            live=jnp.sum(alive, axis=1).astype(jnp.int32),
            seqs=new_seqs,
            alpha_hist=new_hist,
            model_state=gather_fn(new_state, rows),
            best_score=best_score,
            best_seq=best_seq,
            best_alpha=best_alpha,
            best_len=best_len,
        )

    c = jax.lax.while_loop(cond, body, carry)

    # Fallback (divergence from the reference, which would crash): no beam
    # completed -> return the best live beam.
    none_done = jnp.isneginf(c.best_score)  # (B,)
    fb = jnp.argmax(c.cum, axis=1)
    fb_seq = jnp.take_along_axis(c.seqs, fb[:, None, None], axis=1)[:, 0]
    fb_alpha = jnp.take_along_axis(
        c.alpha_hist, fb[:, None, None, None], axis=1
    )[:, 0]
    fb_score = jnp.take_along_axis(c.cum, fb[:, None], axis=1)[:, 0]
    seq = jnp.where(none_done[:, None], fb_seq, c.best_seq)
    alpha = jnp.where(none_done[:, None, None], fb_alpha, c.best_alpha)
    score = jnp.where(none_done, fb_score, c.best_score)
    length = jnp.where(none_done, c.t, c.best_len)
    return BeamResult(seq, length.astype(jnp.int32), alpha, score)


# ---------------------------------------------------------------------------
# Decoder-family adapters (model-state rows = B * beam_size, image-major)
# ---------------------------------------------------------------------------

def _lstm_attention_beam(model, params, enc_out, beam_size, max_steps, start_id, end_id):
    dec = model.decoder
    p = params["decoder"]
    B = enc_out.shape[0]
    k = beam_size
    enc = _flatten_pixels(enc_out)  # (B, P, C)
    enc_k = jnp.repeat(enc, k, axis=0)  # (B*k, P, C) image-major
    att1 = linear(p["attention"]["encoder_att"], enc_k)
    h0, c0 = dec.init_hidden_state(p, enc_k)
    V = model.cfg.vocab_size
    P = enc.shape[1]

    if model._use_decode_kernel():
        # Per-token attention+LSTMCell body as one Pallas kernel
        # (ops/lstm_step.py) — same math; equality asserted in
        # tests/test_lstm_kernel.py.
        from tpu_captioner.ops.lstm_step import (
            cast_lstm_weight_matrices,
            fused_lstm_step,
            prepare_lstm_weights,
        )

        interpret = jax.default_backend() == "cpu"
        kw = prepare_lstm_weights(p, model.cfg.embed_dim)
        dt = enc.dtype if interpret else jnp.bfloat16
        kw = cast_lstm_weight_matrices(kw, dt)
        enc_s, att1_s = enc_k.astype(dt), att1.astype(dt)

        def step_fn(state, prev_words, _pos):
            h, c = state
            emb = p["embedding"][prev_words.reshape(-1)]
            h2, c2, alpha = fused_lstm_step(
                kw, emb.astype(dt), h, c, enc_s, att1_s, interpret=interpret
            )
            logits = linear(p["fc"], h2)
            return (h2, c2), logits.reshape(B, k, V), alpha.reshape(B, k, P)
    else:
        def step_fn(state, prev_words, _pos):
            h, c = state
            emb = p["embedding"][prev_words.reshape(-1)]
            h2, c2, alpha = dec.step(p, h, c, emb, enc_k, att1)
            logits = linear(p["fc"], h2)  # eval: no dropout (caption.py:512)
            return (h2, c2), logits.reshape(B, k, V), alpha.reshape(B, k, P)

    def gather_fn(state, rows):
        h, c = state
        return h[rows], c[rows]

    return step_fn, gather_fn, (h0, c0)


def _lstm_plain_beam(model, params, enc_out, beam_size, max_steps, start_id, end_id):
    from tpu_captioner.models.layers import lstm_cell

    dec = model.decoder
    p = params["decoder"]
    B = enc_out.shape[0]
    k = beam_size
    enc = _flatten_pixels(enc_out)
    enc_k = jnp.repeat(enc, k, axis=0)
    h0, c0 = dec.init_hidden_state(p, enc_k)
    V = model.cfg.vocab_size
    P = enc.shape[1]

    def step_fn(state, prev_words, _pos):
        h, c = state
        h2, c2 = lstm_cell(p["lstm"], p["embedding"][prev_words.reshape(-1)], h, c)
        logits = linear(p["fc"], h2)
        return (
            (h2, c2),
            logits.reshape(B, k, V),
            jnp.zeros((B, k, P), jnp.float32),
        )

    def gather_fn(state, rows):
        h, c = state
        return h[rows], c[rows]

    return step_fn, gather_fn, (h0, c0)


def _transformer_beam(model, params, enc_out, beam_size, max_steps, start_id, end_id):
    dec = model.decoder
    p = params["decoder"]
    B = enc_out.shape[0]
    k = beam_size
    V = model.cfg.vocab_size
    P = model.cfg.num_pixels
    memory_1 = dec.precompute_memory(p, enc_out)  # rows = B
    memory = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, k, axis=0) if x.ndim == 3
        else jnp.repeat(x, k, axis=1),
        memory_1,
    )
    # mem: (B,P,E)->(B*k,P,E); k/v: (L,B,H,P,Dh)->(L,B*k,H,P,Dh), image-major
    cache0 = dec.init_cache(B * k, max_steps + 2, dtype=memory_1.mem.dtype)

    def step_fn(cache, prev_words, pos):
        # Stacked-cache form: the beam reshuffle below copies the cache
        # every step anyway, so the in-place carry variant only adds
        # slicing cost here (see TransformerDecoder.decode_step).
        logits, new_cache, alpha = dec.decode_step(
            p, prev_words.reshape(-1), pos, cache, memory, deterministic=True,
            inplace_cache=False,
        )
        return new_cache, logits.reshape(B, k, V), alpha.reshape(B, k, P)

    def gather_fn(cache, rows):
        return jax.tree_util.tree_map(lambda x: x[:, rows], cache)

    return step_fn, gather_fn, cache0


def _transformer_beam_fused(model, params, enc_out, beam_size, max_steps, start_id, end_id):
    """Transformer beam step as ONE fused Pallas decode-step kernel over all
    B*k rows (ops/decode_step.py) — used on TPU when the decode kernel is
    enabled.  Identical math to ``_transformer_beam``; equality asserted in
    tests/test_decode_kernel.py."""
    from tpu_captioner.ops.decode_step import (
        apply_cache_update,
        cast_weight_matrices,
        fused_decode_step,
        prepare_cross_memory,
        prepare_decode_weights,
    )

    dec = model.decoder
    p = params["decoder"]
    c = model.cfg
    B = enc_out.shape[0]
    k = beam_size
    V, P, E = c.vocab_size, c.num_pixels, c.embed_dim
    mem = dec._project_memory(p, enc_out)  # (B, P, E)
    mem = jnp.repeat(mem, k, axis=0)  # (B*k, P, E)
    kw = prepare_decode_weights(p["layers"], E)
    mem_k, mem_v = prepare_cross_memory(p["layers"], mem, E)
    interpret = jax.default_backend() == "cpu"
    # bf16 streamed operands in the kernel's bf16-MXU mode; f32 in
    # interpret/parity mode.  See TransformerDecoder.fused_rollout for the
    # rounding-class note (V is one-time-rounded, not per-use-rounded).
    dt = mem.dtype if interpret else jnp.bfloat16
    kw = cast_weight_matrices(kw, dt)
    mem_k, mem_v = mem_k.astype(dt), mem_v.astype(dt)
    T = max_steps + 2
    ck0 = jnp.zeros((c.num_layers, B * k, T, E), dt)
    cv0 = jnp.zeros_like(ck0)

    def step_fn(state, prev_words, pos):
        ck, cv = state
        toks = prev_words.reshape(-1)
        x = dec._embed(p, toks[:, None], pos[None], None, True)[:, 0, :]
        x_out, alpha, k_new, v_new = fused_decode_step(
            kw, x.astype(dt), pos, ck, cv, mem_k, mem_v, c.num_heads,
            interpret=interpret,
        )
        ck, cv = apply_cache_update(ck, cv, k_new, v_new, pos)
        logits = linear(p["fc_out"], x_out.astype(mem.dtype))
        return (ck, cv), logits.reshape(B, k, V), alpha.reshape(B, k, P)

    def gather_fn(state, rows):
        ck, cv = state
        return ck[:, rows], cv[:, rows]

    return step_fn, gather_fn, (ck0, cv0)


def _transformer_adapter(model, *args):
    if model._use_decode_kernel():
        return _transformer_beam_fused(model, *args)
    return _transformer_beam(model, *args)


_ADAPTERS = {
    "lstm": _lstm_attention_beam,
    "lstm_no_attention": _lstm_plain_beam,
    "transformer": _transformer_adapter,
    "transformer_attvis": _transformer_adapter,
}


def _beam_compiler_options(model):
    """core.backend.decode_compiler_options as a hashable tuple-of-pairs
    (the beam jit wrapper is lru_cached on it) or None."""
    from tpu_captioner.core.backend import decode_compiler_options

    opts = decode_compiler_options(model)
    return tuple(opts.items()) if opts else None


_STATIC = ("model", "beam_size", "max_steps", "start_id", "end_id")


@lru_cache(maxsize=None)
def _jitted_beam(impl, opts):
    return jax.jit(
        impl,
        static_argnames=_STATIC,
        compiler_options=dict(opts) if opts else None,
    )


def beam_search(
    model,  # CaptionModel (hashable static: dataclass of config)
    params,
    image_u8: jnp.ndarray,  # (H, W, 3) uint8 — one image
    *,
    beam_size: int = 5,
    max_steps: int = 50,
    start_id: int,
    end_id: int,
) -> BeamResult:
    """Single-image beam-search captioning (caption.py entry semantics)."""
    return _jitted_beam(_beam_search_impl, _beam_compiler_options(model))(
        model, params, image_u8,
        beam_size=beam_size, max_steps=max_steps,
        start_id=start_id, end_id=end_id,
    )


def _beam_search_impl(
    model, params, image_u8, *, beam_size, max_steps, start_id, end_id
):
    enc_out = model.encode(params, image_u8[None], deterministic=True)
    return beam_search_encoded(
        model, params, enc_out,
        beam_size=beam_size, max_steps=max_steps,
        start_id=start_id, end_id=end_id,
    )


def beam_search_encoded(
    model,
    params,
    enc_out: jnp.ndarray,  # (1, e, e, C)
    *,
    beam_size: int = 5,
    max_steps: int = 50,
    start_id: int,
    end_id: int,
) -> BeamResult:
    res = _beam_batched(
        model, params, enc_out,
        beam_size=beam_size, max_steps=max_steps,
        start_id=start_id, end_id=end_id,
    )
    return BeamResult(*(x[0] for x in res))


def _beam_batched(model, params, enc_out, *, beam_size, max_steps, start_id, end_id):
    adapter = _ADAPTERS[model.cfg.decoder]
    step_fn, gather_fn, init_state = adapter(
        model, params, enc_out, beam_size, max_steps, start_id, end_id
    )
    return _beam_loop(
        step_fn,
        gather_fn,
        init_state,
        enc_out.shape[0],
        beam_size,
        max_steps,
        seq_len=max_steps + 2,
        num_pixels=model.cfg.num_pixels,
        start_id=start_id,
        end_id=end_id,
        vocab_size=model.cfg.vocab_size,
    )


def beam_search_batch(
    model,
    params,
    images_u8: jnp.ndarray,  # (B, H, W, 3)
    *,
    beam_size: int = 5,
    max_steps: int = 50,
    start_id: int,
    end_id: int,
) -> BeamResult:
    """Batched beam search: ONE encoder pass + one batched beam loop — the
    throughput path for captions/sec benchmarking (the reference is strictly
    one image per Python call, caption.py:433-)."""
    return _jitted_beam(
        _beam_search_batch_impl, _beam_compiler_options(model)
    )(
        model, params, images_u8,
        beam_size=beam_size, max_steps=max_steps,
        start_id=start_id, end_id=end_id,
    )


def _beam_search_batch_impl(
    model, params, images_u8, *, beam_size, max_steps, start_id, end_id
):
    enc_out = model.encode(params, images_u8, deterministic=True)
    return _beam_batched(
        model, params, enc_out,
        beam_size=beam_size, max_steps=max_steps,
        start_id=start_id, end_id=end_id,
    )
