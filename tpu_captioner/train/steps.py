"""Jitted train/eval steps: losses, gradients, optimizer updates, sharding.

One compiled XLA program per (strategy, fine-tune phase) replaces the
reference's per-batch Python orchestration (train.py:240-361):

- teacher-forcing loss == CrossEntropyLoss over pack_padded_sequence tokens
  (train.py:266-276): masked token CE averaged over valid tokens, the mask
  being (step < caplen-1) — identical numerator/denominator;
- LSTM adds the doubly-stochastic attention regularizer
  alpha_c * mean_{B,P}(1 - sum_t alpha)^2 (train.py:269);
- free-running loss == CrossEntropyLoss over the tokens selected by
  preprocessDecoderOutputForMetrics (train.py:331-337) via rollout_token_mask;
- gradient clip is the elementwise +-5 clamp, then Adam (train.py:284-291);
- frozen-encoder phase: the encoder forward is wrapped in stop_gradient so
  XLA prunes its backward entirely (the reference merely sets
  requires_grad=False); fine-tune phase: encoder grads are computed and
  masked below ``starting_layer`` (encoder.py:29-34 semantics).

Data parallelism: params/state replicated, batch sharded over the 'data'
mesh axis; XLA inserts the gradient/metric psums over ICI (replacing
DDP/NCCL all-reduce, trainMultiGPU.py:96-108,384).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_captioner.core.config import TrainConfig
from tpu_captioner.eval.metrics import (
    masked_cross_entropy,
    rollout_token_mask,
    topk_correct,
)
from tpu_captioner.models.encoder import fine_tune_mask
from tpu_captioner.models.layers import MaskPool, mask_pool_scope
from tpu_captioner.train.model import CaptionModel
from tpu_captioner.train.state import TrainState, zero_frozen


# ---------------------------------------------------------------------------
# Dropout mask pool (one hardware-PRNG launch per train step)
# ---------------------------------------------------------------------------

class _CountingPool:
    """Trace-time stand-in that measures a forward's mask demand.  take()
    returns zeros so the counting trace stays well-typed; its outputs are
    discarded, so XLA dead-code-eliminates the whole counting forward.
    Sites inside a scanned-layer scope reserve count * size, matching
    MaskPool's per-layer stripes (layers.pool_layer_scope)."""

    def __init__(self):
        self.total = 0

    def take(self, shape, keep=None):
        import math

        from tpu_captioner.models.layers import pool_layer_info

        layer = pool_layer_info()
        n = math.prod(shape)
        self.total += n if layer is None else n * layer[1]
        return jnp.zeros(shape, bool)


_POOL_DEMAND_CACHE: Dict[tuple, int] = {}


def _pooled_tf_forward(model, params, enc_out, caps, rng):
    """model.tf_forward with train-mode dropout fed from ONE pooled
    hardware-PRNG draw (ops/dropout_mask.py) instead of ~38 per-site
    threefry draws (~2 ms/step at flagship shape).  Mask demand is counted
    by a discarded (DCE'd) trace, cached per (config, shapes)."""
    ck = (repr(model.cfg), enc_out.shape, str(enc_out.dtype), caps.shape)
    n = _POOL_DEMAND_CACHE.get(ck)
    if n is None:
        cp = _CountingPool()
        with mask_pool_scope(cp):
            model.tf_forward(
                params, enc_out, caps, rng=rng, deterministic=False
            )
        n = _POOL_DEMAND_CACHE[ck] = cp.total
    if n == 0:
        return model.tf_forward(
            params, enc_out, caps, rng=rng, deterministic=False
        )
    from tpu_captioner.core.backend import on_tpu
    from tpu_captioner.ops.dropout_mask import random_mask_pool

    keep = 1.0 - model.cfg.dropout
    bits = random_mask_pool(rng, n, keep, on_tpu=on_tpu())
    with mask_pool_scope(MaskPool(bits, keep)):
        return model.tf_forward(
            params, enc_out, caps, rng=rng, deterministic=False
        )


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def tf_loss(
    model: CaptionModel,
    params,
    batch: Dict[str, jnp.ndarray],
    alpha_c: float,
    rng: Optional[jax.Array],
    deterministic: bool,
    attvis_regularization: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    caps = batch["captions"]
    caplens = batch["caplens"]
    valid = batch["valid"]
    if rng is not None:
        enc_rng, dec_rng = jax.random.split(rng)
    else:
        enc_rng = dec_rng = None
    enc_out = model.encode(
        params, batch["images"], deterministic=deterministic, rng=enc_rng
    )
    dm = model.cfg.dropout_masks
    if dm == "auto":
        from tpu_captioner.core.backend import on_tpu

        dm = "pool" if on_tpu() else "threefry"
    if dm == "pool" and not deterministic and dec_rng is not None \
            and model.cfg.dropout > 0.0:
        logits, alphas = _pooled_tf_forward(model, params, enc_out, caps, dec_rng)
    else:
        logits, alphas = model.tf_forward(
            params, enc_out, caps, rng=dec_rng, deterministic=deterministic
        )
    T = logits.shape[1]
    decode_len = caplens - 1  # don't decode at <end> (decoder.py:91)
    tmask = (jnp.arange(T)[None, :] < decode_len[:, None]) & valid[:, None]
    targets = caps[:, 1:].astype(jnp.int32)
    ce_sum, tokens = masked_cross_entropy(logits, targets, tmask)
    loss = ce_sum / jnp.maximum(tokens, 1.0)
    reg_lstm = model.cfg.decoder == "lstm"
    reg_attvis = (
        attvis_regularization and model.cfg.decoder == "transformer_attvis"
    )
    if (reg_lstm or reg_attvis) and alpha_c and alphas is not None:
        am = alphas * tmask[..., None]
        per_pixel = (1.0 - jnp.sum(am, axis=1)) ** 2  # (B, P)
        denom = jnp.maximum(jnp.sum(valid), 1) * per_pixel.shape[1]
        loss = loss + alpha_c * jnp.sum(per_pixel * valid[:, None]) / denom
    top5 = topk_correct(logits, targets, 5, tmask)
    return loss, {"loss": loss, "tokens": tokens, "top5_correct": top5}


def rollout_loss(
    model: CaptionModel,
    params,
    batch: Dict[str, jnp.ndarray],
    word_ids: Dict[str, int],
    alpha_c: float,
    max_decode_len: int,
    rng: Optional[jax.Array],
    deterministic: bool,
    scheduled_sampling_prob: float = 0.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    caps = batch["captions"]
    valid = batch["valid"]
    if rng is not None:
        enc_rng, dec_rng = jax.random.split(rng)
    else:
        enc_rng = dec_rng = None
    enc_out = model.encode(
        params, batch["images"], deterministic=deterministic, rng=enc_rng
    )
    logits, seqs, alphas = model.rollout(
        params,
        enc_out,
        word_ids["<start>"],
        word_ids["<end>"],
        max_decode_len,
        rng=dec_rng,
        deterministic=deterministic,
        teacher_tokens=caps if scheduled_sampling_prob > 0 else None,
        teacher_prob=scheduled_sampling_prob,
    )
    mask, targets, lengths = rollout_token_mask(
        seqs, caps, word_ids["<end>"], word_ids["<pad>"], max_decode_len, valid
    )
    ce_sum, tokens = masked_cross_entropy(logits, targets, mask)
    loss = ce_sum / jnp.maximum(tokens, 1.0)
    if model.cfg.decoder == "lstm" and alpha_c:
        per_pixel = (1.0 - jnp.sum(alphas, axis=1)) ** 2
        denom = jnp.maximum(jnp.sum(valid), 1) * per_pixel.shape[1]
        loss = loss + alpha_c * jnp.sum(per_pixel * valid[:, None]) / denom
    top5 = topk_correct(logits, targets, 5, mask)
    aux = {
        "loss": loss,
        "tokens": tokens,
        "top5_correct": top5,
        "sequences": seqs,
        "lengths": lengths,
    }
    return loss, aux


# ---------------------------------------------------------------------------
# Step factories
# ---------------------------------------------------------------------------

def _shardings(mesh: Optional[Mesh]):
    if mesh is None:
        return None, None
    return NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))


def train_step_compiler_options(model, cfg, train_encoder: bool):
    """Scoped-VMEM budget for train-step programs with Pallas encoder
    kernels (None when on CPU / kernels off).  XLA places the kernels'
    operand/output tuples on the scoped-VMEM stack; at bs>32 they outgrow
    the ~46 MB default and XLA flips to a pathologically slow placement
    (27 ms @ bs=32 vs 732 ms @ bs=64 — BENCHMARKING.md "Batch-size
    scaling, root-caused").  Sweep-tuned defaults: fine-tune is
    DTYPE-aware as of round 5 — bf16 takes 32 MB (on-chip sweep is flat
    from XLA's default through 64 MB: 61.9/63.1/62.0/61.6 ms at
    default/40/48/64 MB, artifacts/r05_queue/q_ft_budget_*.log, and
    32 MB is the one budget the local libtpu AOT gate also compiles —
    default/40/48/96 MB all OOM staging the stage-3 bwd kernel's 25 MB
    output tuple; q_gate_ft_*.log) while f32 keeps the round-2 64 MB:
    the relay compiler's scoped demand for the f32 stage-3 bwd fusion
    GROWS with the limit (37.28M at a 32 MB limit, 45.24M at 38 MB —
    q_ft_b{32768,38912}_float32.log), so every budget the local gate
    accepts is one the relay rejects for f32 and vice versa; no single
    f32 budget compiles under both (11-configuration matrix in
    BENCHMARKING.md "Fine-tune scoped-VMEM budget, both compilers").
    Frozen keeps XLA's own default at bs<=32
    (raising it costs up to 10% there) and takes 96 MB above (bs=64 is
    732 ms default / 95 ms @ 64 MB / 62 ms @ 96 MB).  Env override:
    TPU_CAPTIONER_SCOPED_VMEM_KIB (0 = keep XLA's default budget)."""
    from tpu_captioner.core.backend import on_tpu

    if not on_tpu():
        return None
    pm = getattr(model.encoder, "pallas_mode", "off")
    uses_pallas = any(m != "off" for m in pm) if isinstance(
        pm, (tuple, list)
    ) else pm != "off"
    if not uses_pallas:
        return None
    import os

    if train_encoder:
        bf16 = model.cfg.compute_dtype == "bfloat16"
        default = 32768 if bf16 else 65536
    elif cfg.batch_size <= 32:
        default = 0
    else:
        default = 98304
    limit = int(os.environ.get("TPU_CAPTIONER_SCOPED_VMEM_KIB", default))
    return {"xla_tpu_scoped_vmem_limit_kib": limit} if limit > 0 else None


def make_train_step(
    model: CaptionModel,
    cfg: TrainConfig,
    word_ids: Dict[str, int],
    dec_opt,
    enc_opt,
    *,
    teacher_forcing: bool = True,
    train_encoder: bool = False,
    mesh: Optional[Mesh] = None,
    raw: bool = False,
) -> Callable:
    """Returns jitted (state, batch, rng) -> (state, metrics).

    ``raw=True`` returns the UNJITTED step_fn instead, for callers that
    embed the step in a larger program (e.g. the scanned-quotient bench
    instruments, which lax.scan the step and must hoist this step's
    ``compiler_options`` to their own top-level jit — nested jits can't
    carry them)."""

    def loss_for(params, batch, rng):
        if teacher_forcing:
            return tf_loss(
                model, params, batch, cfg.alpha_c, rng, False,
                cfg.attvis_regularization,
            )
        return rollout_loss(
            model, params, batch, word_ids, cfg.alpha_c, cfg.max_decode_len,
            rng, False, cfg.scheduled_sampling_prob,
        )

    def step_fn(state: TrainState, batch, rng):
        if train_encoder:
            enc_mask = fine_tune_mask(
                state.params["encoder"], True, cfg.starting_layer
            )

            # stop_gradient on the frozen children's params: children below
            # ``starting_layer`` sit upstream of every trainable one, so with
            # their param grads cut the backward pass prunes at the first
            # trainable stage's input instead of running to the stem and
            # being zeroed after the fact (~19% of encoder FLOPs at layer 5).
            def ft_loss(params, batch, rng):
                enc = jax.tree_util.tree_map(
                    lambda p, m: p if m else jax.lax.stop_gradient(p),
                    params["encoder"], enc_mask,
                )
                return loss_for(
                    {"encoder": enc, "decoder": params["decoder"]}, batch, rng
                )

            grads, aux = jax.grad(ft_loss, has_aux=True)(state.params, batch, rng)
            enc_grads = zero_frozen(grads["encoder"], enc_mask)
            enc_updates, enc_opt_state = enc_opt.update(
                enc_grads, state.enc_opt_state, state.params["encoder"]
            )
            enc_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params["encoder"], enc_updates
            )
        else:
            def dec_loss(dec_params, batch, rng):
                params = {
                    "encoder": jax.lax.stop_gradient(state.params["encoder"]),
                    "decoder": dec_params,
                }
                return loss_for(params, batch, rng)

            dec_grads, aux = jax.grad(dec_loss, has_aux=True)(
                state.params["decoder"], batch, rng
            )
            grads = {"decoder": dec_grads}
            enc_params = state.params["encoder"]
            enc_opt_state = state.enc_opt_state

        dec_grads = grads["decoder"]
        if (
            model.cfg.embedding_path is not None
            and not model.cfg.fine_tune_embeddings
        ):
            # nn.Embedding.from_pretrained(freeze=True) semantics
            # (transformerDecoder.py:74): pretrained embeddings stay fixed.
            dec_grads = dict(dec_grads)
            dec_grads["embedding"] = jnp.zeros_like(dec_grads["embedding"])
        dec_updates, dec_opt_state = dec_opt.update(
            dec_grads, state.dec_opt_state, state.params["decoder"]
        )
        dec_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params["decoder"], dec_updates
        )
        new_state = state.replace(
            params={"encoder": enc_params, "decoder": dec_params},
            dec_opt_state=dec_opt_state,
            enc_opt_state=enc_opt_state,
            step=state.step + 1,
        )
        metrics = {
            "loss": aux["loss"],
            "tokens": aux["tokens"],
            "top5_correct": aux["top5_correct"],
        }
        return new_state, metrics

    if raw:
        return step_fn

    # Fine-tuning with the fused Pallas kernels: XLA stages the backward
    # kernel's stage-4 operands (three 16.8 MB weight blocks + accumulators)
    # in scoped VMEM inside the scan-body fusion, which blows the default
    # 16 MB scoped budget ("Ran out of memory in memory space vmem ...
    # scoped allocation").  Raise the budget for this program only.
    compiler_options = train_step_compiler_options(model, cfg, train_encoder)

    repl, data_sh = _shardings(mesh)
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,), compiler_options=compiler_options)
    batch_sh = {
        "images": data_sh, "captions": data_sh, "caplens": data_sh, "valid": data_sh,
    }
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_sh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
        compiler_options=compiler_options,
    )


def make_eval_step(
    model: CaptionModel,
    cfg: TrainConfig,
    word_ids: Dict[str, int],
    *,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Deterministic free-running eval step (validate/test, train.py:367-441):
    (params, batch) -> metrics incl. generated sequences + decode lengths."""

    def step_fn(params, batch):
        _, aux = rollout_loss(
            model, params, batch, word_ids, cfg.alpha_c, cfg.max_decode_len,
            rng=None, deterministic=True,
        )
        return aux

    # The fused decode-step kernel's scan-carried KV caches (2 x ~25 MB at
    # B=32) are staged in scoped VMEM by XLA; the default 16 MB budget OOMs.
    # Raise it for this program (v5e has 128 MB VMEM).
    from tpu_captioner.core.backend import decode_compiler_options

    compiler_options = decode_compiler_options(model)

    repl, data_sh = _shardings(mesh)
    if mesh is None:
        return jax.jit(step_fn, compiler_options=compiler_options)
    batch_sh_all = {
        "images": data_sh, "captions": data_sh, "caplens": data_sh,
        "valid": data_sh, "all_captions": data_sh,
    }
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_sh_all),
        out_shardings=repl,
        compiler_options=compiler_options,
    )
