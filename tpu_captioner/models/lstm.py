"""LSTM decoder family: soft-attention (Show-Attend-Tell style) and the
no-attention baseline.

Functional re-design of the reference decoders (models/decoder.py:16-172,
models/lstmNoAttention.py:13-139) with TPU-native control flow:

- teacher forcing: ONE ``lax.scan`` over the 51 time steps on the full fixed
  batch; the reference's sorted shrinking-batch loop (decoder.py:100-111) is
  replaced by per-(sample, step) masks applied in the loss — numerically
  identical because masked positions simply never contribute.
- free-running: ``lax.scan`` with a ``finished`` flag per row replacing the
  dynamic active-index gather (decoder.py:140-161); logits/alphas/sequences
  for rows already finished are zeroed exactly like the untouched
  preallocated buffers in the reference.

Per-step dropout on the hidden state before the vocab projection matches the
reference's train-mode dropout (decoder.py:109,152); keys are split per step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_captioner.core.config import ModelConfig
from tpu_captioner.models import torch_init
from tpu_captioner.models.layers import (
    Params,
    dropout,
    init_linear,
    init_lstm_cell,
    linear,
    lstm_cell,
)


def _flatten_pixels(encoder_out: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) or (B, P, C) -> (B, P, C)."""
    if encoder_out.ndim == 4:
        b, h, w, c = encoder_out.shape
        return encoder_out.reshape(b, h * w, c)
    return encoder_out


def additive_attention(
    p: Params, encoder_out: jnp.ndarray, hidden: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bahdanau additive attention (decoder.py:16-31).

    encoder_out: (B, P, C); hidden: (B, D).
    Returns (context (B, C), alpha (B, P)).

    The encoder-side projection is hoisted by callers via
    ``precompute_att_enc`` when running decode loops (invariant across steps).
    """
    att1 = linear(p["encoder_att"], encoder_out)  # (B, P, A)
    return _attention_from_projected(p, encoder_out, att1, hidden)


def _attention_from_projected(p, encoder_out, att1, hidden):
    att2 = linear(p["decoder_att"], hidden)  # (B, A)
    att = linear(p["full_att"], jax.nn.relu(att1 + att2[:, None, :]))[..., 0]  # (B, P)
    alpha = jax.nn.softmax(att, axis=1)
    context = jnp.einsum("bp,bpc->bc", alpha, encoder_out)
    return context, alpha


@dataclass(eq=False)
class DecoderWithAttention:
    """Config-bound functional module (reference models/decoder.py:34-172)."""

    cfg: ModelConfig

    # -- parameters ---------------------------------------------------------
    def init_params(self, key: jax.Array) -> Params:
        c = self.cfg
        ks = jax.random.split(key, 9)
        emb_init = torch_init.uniform_pm(0.1)  # decoder.py:59
        return {
            "embedding": emb_init(ks[0], (c.vocab_size, c.embed_dim)),
            "attention": {
                "encoder_att": init_linear(ks[1], c.encoder_dim, c.attention_dim),
                "decoder_att": init_linear(ks[2], c.decoder_dim, c.attention_dim),
                "full_att": init_linear(ks[3], c.attention_dim, 1),
            },
            "init_h": init_linear(ks[4], c.encoder_dim, c.decoder_dim),
            "init_c": init_linear(ks[5], c.encoder_dim, c.decoder_dim),
            "f_beta": init_linear(ks[6], c.decoder_dim, c.encoder_dim),
            "lstm": init_lstm_cell(ks[7], c.embed_dim + c.encoder_dim, c.decoder_dim),
            "fc": init_linear(
                ks[8],
                c.decoder_dim,
                c.vocab_size,
                w_init=torch_init.uniform_pm(0.1),  # decoder.py:60-61
                b_init=jax.nn.initializers.zeros,
            ),
        }

    # -- shared pieces ------------------------------------------------------
    def init_hidden_state(self, p: Params, encoder_out_flat: jnp.ndarray):
        mean_enc = jnp.mean(encoder_out_flat, axis=1)  # decoder.py:63-67
        return linear(p["init_h"], mean_enc), linear(p["init_c"], mean_enc)

    def _gated_context(self, p, encoder_out_flat, att1, h):
        ctx, alpha = _attention_from_projected(p["attention"], encoder_out_flat, att1, h)
        gate = jax.nn.sigmoid(linear(p["f_beta"], h))  # decoder.py:104-105
        return gate * ctx, alpha

    def step(self, p: Params, h, c, token_emb, encoder_out_flat, att1):
        """One decode step (used by scan bodies and beam search).
        Returns (h_new, c_new, pre-dropout hidden, alpha)."""
        ctx, alpha = self._gated_context(p, encoder_out_flat, att1, h)
        h_new, c_new = lstm_cell(p["lstm"], jnp.concatenate([token_emb, ctx], -1), h, c)
        return h_new, c_new, alpha

    # -- teacher forcing ----------------------------------------------------
    def tf_forward(
        self,
        p: Params,
        encoder_out: jnp.ndarray,
        captions: jnp.ndarray,  # (B, L) int32
        *,
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (logits (B, L-1, V), alphas (B, L-1, P)); logits[:, t]
        predicts captions[:, t+1].  Unmasked — the loss applies the
        decode-length mask (≡ the reference's shrinking batch_size_t).

        MXU restructure (the 19%-MFU fix, BENCHMARKING.md round 4): the scan
        body carries only the recurrence.  Everything whose inputs are known
        up front is hoisted into big batched matmuls outside the scan —
        the token half of the LSTM gate matmul ((B·T, E)@(E, 4D)), the vocab
        head ((B·T, D)@(D, V), by far the largest matmul in the step), and
        the dropout mask (one (B, T, D) draw instead of T per-step draws,
        distribution-identical) — and the three h-dependent projections
        (decoder_att, f_beta, w_hh) merge into ONE (B, D)@(D, A+C+4D) matmul
        per step."""
        c = self.cfg
        enc = _flatten_pixels(encoder_out)
        att = p["attention"]
        att1 = linear(att["encoder_att"], enc)
        h0, c0 = self.init_hidden_state(p, enc)
        embs = p["embedding"][captions[:, :-1]]  # (B, T, E)
        E = embs.shape[-1]
        A = att["decoder_att"]["b"].shape[0]
        C = enc.shape[-1]
        emb_gates = embs @ p["lstm"]["w_ih"][:E]  # (B, T, 4D)
        wh = jnp.concatenate(
            [att["decoder_att"]["w"], p["f_beta"]["w"], p["lstm"]["w_hh"]],
            axis=1,
        )  # (D, A + C + 4D)
        w_full = att["full_att"]["w"][:, 0]  # (A,)
        b_full = att["full_att"]["b"][0]
        w_ih_c = p["lstm"]["w_ih"][E:]  # (C, 4D)
        bias = p["lstm"]["b_ih"] + p["lstm"]["b_hh"]

        def body(carry, emb_g):
            h, cc = carry
            hp = h @ wh  # merged h-projections (B, A+C+4D)
            att2 = hp[:, :A] + att["decoder_att"]["b"]
            scores = (
                jax.nn.relu(att1 + att2[:, None, :]) @ w_full + b_full
            )  # (B, P)
            alpha = jax.nn.softmax(scores, axis=1)
            ctx = jnp.einsum("bp,bpc->bc", alpha, enc)
            gate = jax.nn.sigmoid(hp[:, A : A + C] + p["f_beta"]["b"])
            gates = emb_g + (gate * ctx) @ w_ih_c + hp[:, A + C :] + bias
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), (h_new, alpha)

        _, (hids, alphas) = jax.lax.scan(
            body, (h0, c0), jnp.swapaxes(emb_gates, 0, 1), unroll=2
        )
        if rng is None:  # zeros-key fallback, as the pre-hoist scan had
            rng = jnp.zeros((2,), dtype=jnp.uint32)
        hids = dropout(
            jnp.swapaxes(hids, 0, 1), c.dropout, rng, deterministic
        )  # (B, T, D), per-step masks in one draw (decoder.py:109)
        logits = linear(p["fc"], hids)
        return logits, jnp.swapaxes(alphas, 0, 1)

    # -- free running -------------------------------------------------------
    def rollout(
        self,
        p: Params,
        encoder_out: jnp.ndarray,
        start_id: int,
        end_id: int,
        max_decode_len: int,
        *,
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        teacher_tokens: Optional[jnp.ndarray] = None,
        teacher_prob: float = 0.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Greedy decode (decoder.py:119-163).  Returns
        (logits (B,T,V), alphas (B,T,P), sequences (B,T) int32); rows are
        zeroed at steps after their ``<end>``, matching the reference's
        untouched preallocated buffers.

        Scheduled sampling: with ``teacher_tokens`` (B, >=T+1) and
        ``teacher_prob`` p, each step's input is the ground-truth token with
        probability p and the model's argmax otherwise (Bengio et al. 2015) —
        p=0 is the reference's free-running mode."""
        enc = _flatten_pixels(encoder_out)
        att1 = linear(p["attention"]["encoder_att"], enc)
        h0, c0 = self.init_hidden_state(p, enc)
        return self._rollout_scan(
            p, h0, c0,
            lambda h, cc, emb: self.step(p, h, cc, emb, enc, att1),
            start_id, end_id, max_decode_len,
            rng=rng, deterministic=deterministic,
            teacher_tokens=teacher_tokens, teacher_prob=teacher_prob,
            unroll=2,
        )

    def _rollout_scan(
        self, p, h0, c0, step_fn, start_id, end_id, max_decode_len,
        *, rng, deterministic, teacher_tokens, teacher_prob, unroll,
    ):
        """Shared greedy-decode scan (decoder.py:119-163 semantics) over a
        step callable ``(h, c, emb) -> (h_new, c_new, alpha)`` — ONE home
        for the token mix / finished-row freeze / zeroed-output logic that
        both the XLA and fused-kernel rollouts use."""
        c = self.cfg
        B = h0.shape[0]
        tok0 = jnp.full((B,), start_id, dtype=jnp.int32)
        fin0 = jnp.zeros((B,), dtype=bool)
        T = max_decode_len
        rngs = (
            jax.random.split(rng, T)
            if rng is not None
            else jnp.zeros((T, 2), dtype=jnp.uint32)
        )
        steps = jnp.arange(T)

        def body(carry, xs):
            rng_t, t = xs
            h, cc, tok, finished = carry
            if teacher_tokens is not None and teacher_prob > 0.0:
                use_teacher = jax.random.bernoulli(
                    jax.random.fold_in(rng_t, 1), teacher_prob, (B,)
                )
                tok = jnp.where(use_teacher, teacher_tokens[:, t], tok)
            emb = p["embedding"][tok]
            h_new, c_new, alpha = step_fn(h, cc, emb)
            hid = dropout(h_new, c.dropout, rng_t, deterministic)
            logits_t = linear(p["fc"], hid)
            pred = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
            act = ~finished
            logits_out = jnp.where(act[:, None], logits_t, 0.0)
            alpha_out = jnp.where(act[:, None], alpha, 0.0)
            seq_out = jnp.where(act, pred, 0)
            # Freeze state on finished rows (decoder.py:158-161).
            h = jnp.where(act[:, None], h_new, h)
            cc = jnp.where(act[:, None], c_new, cc)
            tok = jnp.where(act, pred, tok)
            finished = finished | (act & (pred == end_id))
            return (h, cc, tok, finished), (logits_out, alpha_out, seq_out)

        if deterministic and rng is None and teacher_tokens is None:
            # Deterministic eval: stop once every row emitted <end>, like
            # the reference's loop break (decoder.py:147-149).  Exactly
            # equal to the full scan (finished rows emit zeros); while_loop
            # is not reverse-differentiable, hence eval-only.
            from tpu_captioner.core.loops import scan_early_exit

            _, (logits, alphas, seqs) = scan_early_exit(
                body, (h0, c0, tok0, fin0), (rngs, steps),
                lambda c: jnp.all(c[3]),
            )
        else:
            _, (logits, alphas, seqs) = jax.lax.scan(
                body, (h0, c0, tok0, fin0), (rngs, steps), unroll=unroll
            )
        return (
            jnp.swapaxes(logits, 0, 1),
            jnp.swapaxes(alphas, 0, 1),
            jnp.swapaxes(seqs, 0, 1),
        )

    # -- fused-kernel rollout -------------------------------------------------
    def fused_rollout(
        self,
        p: Params,
        encoder_out: jnp.ndarray,
        start_id: int,
        end_id: int,
        max_decode_len: int,
        *,
        rng: Optional[jax.Array] = None,
        teacher_tokens: Optional[jnp.ndarray] = None,
        teacher_prob: float = 0.0,
        interpret: bool = False,
        precise: bool = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """``rollout`` with the per-token attention+LSTMCell body as ONE
        Pallas kernel (ops/lstm_step.py).  Deterministic mode only (eval/
        test/caption — dropout is identity there, decoder.py:119-163's eval
        call); training rollouts keep the XLA path.  Equality with
        ``rollout`` is asserted in tests/test_lstm_kernel.py."""
        from tpu_captioner.ops.lstm_step import (
            cast_lstm_weight_matrices,
            fused_lstm_step,
            prepare_lstm_weights,
        )

        c = self.cfg
        if jax.default_backend() == "cpu":
            interpret = True  # Pallas on the CPU backend is interpret-only
        pr = interpret if precise is None else precise
        enc = _flatten_pixels(encoder_out)
        att1 = linear(p["attention"]["encoder_att"], enc)
        h0, c0 = self.init_hidden_state(p, enc)
        kw = prepare_lstm_weights(p, c.embed_dim)
        # bf16 streamed operands in bf16-MXU mode.  Rounding note: the
        # weight matrices feed bf16 MXU matmuls either way, but enc/att1
        # are consumed in f32 VPU adds/reduces inside the kernel — bf16
        # storage rounds them once (~2^-8 relative), where the XLA path
        # keeps att1 f32 and rounds enc per use in its context matmul.
        # Same error class as the model's bf16-MXU default, asserted
        # exactly only in interpret (f32) mode.
        dt = enc.dtype if pr else jnp.bfloat16
        kw = cast_lstm_weight_matrices(kw, dt)
        enc_s, att1_s = enc.astype(dt), att1.astype(dt)
        return self._rollout_scan(
            p, h0, c0,
            lambda h, cc, emb: fused_lstm_step(
                kw, emb.astype(dt), h, cc, enc_s, att1_s,
                interpret=interpret, precise=precise,
            ),
            start_id, end_id, max_decode_len,
            rng=rng, deterministic=True,
            teacher_tokens=teacher_tokens, teacher_prob=teacher_prob,
            unroll=1,
        )


@dataclass(eq=False)
class DecoderWithoutAttention:
    """No-attention baseline (reference models/lstmNoAttention.py:13-139)."""

    cfg: ModelConfig

    def init_params(self, key: jax.Array) -> Params:
        c = self.cfg
        ks = jax.random.split(key, 5)
        emb_init = torch_init.uniform_pm(0.1)
        return {
            "embedding": emb_init(ks[0], (c.vocab_size, c.embed_dim)),
            "init_h": init_linear(ks[1], c.encoder_dim, c.decoder_dim),
            "init_c": init_linear(ks[2], c.encoder_dim, c.decoder_dim),
            "lstm": init_lstm_cell(ks[3], c.embed_dim, c.decoder_dim),
            "fc": init_linear(
                ks[4],
                c.decoder_dim,
                c.vocab_size,
                w_init=torch_init.uniform_pm(0.1),
                b_init=jax.nn.initializers.zeros,
            ),
        }

    def init_hidden_state(self, p: Params, encoder_out_flat: jnp.ndarray):
        mean_enc = jnp.mean(encoder_out_flat, axis=1)
        return linear(p["init_h"], mean_enc), linear(p["init_c"], mean_enc)

    def tf_forward(
        self,
        p: Params,
        encoder_out: jnp.ndarray,
        captions: jnp.ndarray,
        *,
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        # Same MXU restructure as DecoderWithAttention.tf_forward: the token
        # half of the gate matmul and the vocab head are hoisted out of the
        # scan; the body is just the (B, D)@(D, 4D) recurrence.
        c = self.cfg
        enc = _flatten_pixels(encoder_out)
        h0, c0 = self.init_hidden_state(p, enc)
        embs = p["embedding"][captions[:, :-1]]
        emb_gates = embs @ p["lstm"]["w_ih"] + (
            p["lstm"]["b_ih"] + p["lstm"]["b_hh"]
        )  # (B, T, 4D)
        w_hh = p["lstm"]["w_hh"]

        def body(carry, emb_g):
            h, cc = carry
            gates = emb_g + h @ w_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        _, hids = jax.lax.scan(
            body, (h0, c0), jnp.swapaxes(emb_gates, 0, 1), unroll=2
        )
        if rng is None:  # zeros-key fallback, as the pre-hoist scan had
            rng = jnp.zeros((2,), dtype=jnp.uint32)
        hids = dropout(jnp.swapaxes(hids, 0, 1), c.dropout, rng, deterministic)
        return linear(p["fc"], hids)

    def rollout(
        self,
        p: Params,
        encoder_out: jnp.ndarray,
        start_id: int,
        end_id: int,
        max_decode_len: int,
        *,
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        teacher_tokens: Optional[jnp.ndarray] = None,
        teacher_prob: float = 0.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        enc = _flatten_pixels(encoder_out)
        h0, c0 = self.init_hidden_state(p, enc)
        B = enc.shape[0]
        tok0 = jnp.full((B,), start_id, dtype=jnp.int32)
        fin0 = jnp.zeros((B,), dtype=bool)
        T = max_decode_len
        rngs = (
            jax.random.split(rng, T)
            if rng is not None
            else jnp.zeros((T, 2), dtype=jnp.uint32)
        )

        def body(carry, xs):
            rng_t, t = xs
            h, cc, tok, finished = carry
            if teacher_tokens is not None and teacher_prob > 0.0:
                use_teacher = jax.random.bernoulli(
                    jax.random.fold_in(rng_t, 1), teacher_prob, (B,)
                )
                tok = jnp.where(use_teacher, teacher_tokens[:, t], tok)
            h_new, c_new = lstm_cell(p["lstm"], p["embedding"][tok], h, cc)
            hid = dropout(h_new, c.dropout, rng_t, deterministic)
            logits_t = linear(p["fc"], hid)
            pred = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
            act = ~finished
            logits_out = jnp.where(act[:, None], logits_t, 0.0)
            seq_out = jnp.where(act, pred, 0)
            h = jnp.where(act[:, None], h_new, h)
            cc = jnp.where(act[:, None], c_new, cc)
            tok = jnp.where(act, pred, tok)
            finished = finished | (act & (pred == end_id))
            return (h, cc, tok, finished), (logits_out, seq_out)

        if deterministic and rng is None and teacher_tokens is None:
            # Early exit on all-finished (lstmNoAttention.py:118-120 break);
            # eval-only, exactly equal to the full scan.
            from tpu_captioner.core.loops import scan_early_exit

            _, (logits, seqs) = scan_early_exit(
                body, (h0, c0, tok0, fin0), (rngs, jnp.arange(T)),
                lambda c: jnp.all(c[3]),
            )
        else:
            _, (logits, seqs) = jax.lax.scan(
                body, (h0, c0, tok0, fin0), (rngs, jnp.arange(T)), unroll=2
            )
        return jnp.swapaxes(logits, 0, 1), jnp.swapaxes(seqs, 0, 1)
