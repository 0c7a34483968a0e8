"""CaptionModel: encoder + one decoder family behind a uniform interface.

Bundles the flax ConvNeXt encoder with one of the four functional decoders
(reference model zoo: decoder.py, lstmNoAttention.py, transformerDecoder.py,
transformerDecoderAttVis.py) and exposes the two forward modes every
reference decoder dispatches between (decoder.py:165-172):

- ``tf_forward``  -> (logits (B, L-1, V) aligned to captions[:, 1:], alphas?)
- ``rollout``     -> (logits (B, T, V), sequences (B, T), alphas?)

plus ``encode`` (uint8 NHWC images -> (B, 7, 7, 1024) float).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_captioner.core.config import ModelConfig
from tpu_captioner.models.encoder import ConvNeXtEncoder, preprocess_images
from tpu_captioner.models.lstm import DecoderWithAttention, DecoderWithoutAttention
from tpu_captioner.models.transformer import TransformerDecoder

Params = Dict[str, Any]


def finetune_use_pallas(use_pallas):
    """Kernel selection for train_encoder=True steps (THE one home of this
    policy — Trainer and benches share it): fused kernels stay on stages
    1-3, stage 4 runs on XLA.  Stage 4's 3-block weight-grad stack (48 MB)
    is what XLA insists on staging in scoped VMEM in the backward scan —
    measured 71.9 ms/step vs OOM on v5e (BENCHMARKING.md round 2).
    Explicit per-stage configs are returned unchanged."""
    if isinstance(use_pallas, str):
        return (use_pallas, use_pallas, use_pallas, "off")
    return use_pallas


def finetune_encoder_remat(remat, compute_dtype):
    """Remat policy for train_encoder=True steps (the one home of this
    policy, like finetune_use_pallas above).  'auto' resolves by dtype
    from the round-5 on-chip A/B (artifacts/r05_queue/
    q_ft_remat_savemlp_*.log vs the same-session q_ft_insitu_*_xla.log):

      bf16 -> 'save_mlp_in' (60.9 vs 62.5 ms/step): saving each block's
        dwconv output (8.4 MB x 27 blocks at stage 3) lets the block
        backward replay no forward compute, and the bf16 residual
        traffic is cheap enough to pay off.
      f32  -> 'auto' (== plain full remat, Stage resolves it): the same
        policy at f32 is CATASTROPHIC (465.4 vs 68.8 ms/step) — 454 MB
        of saved f32 residuals across the stage-3 scan flips XLA into
        the same pathological-placement family as the norem/chunked
        variants (BENCHMARKING.md "save_mlp_in remat policy", round 5).

    Explicit values pass through unchanged; frozen-encoder models keep
    their own remat config (remat is inert without an encoder backward)."""
    if remat == "auto" and compute_dtype == "bfloat16":
        return "save_mlp_in"
    return remat


@dataclass(eq=False)
class CaptionModel:
    cfg: ModelConfig
    encoder: ConvNeXtEncoder = field(init=False)
    decoder: Any = field(init=False)

    def __post_init__(self):
        c = self.cfg
        dtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        # Pallas mode for the ConvNeXt blocks: 'auto' -> fused MLP-tail
        # kernel on TPU for ALL decoder families (train: 39.1 -> 26.6
        # ms/step transformer; eval encoder fwd: 28.9 -> 18.3 ms at bs=32;
        # LSTM+att TF train 30.8 -> 22.0 ms bf16, MFU 22.9 -> 32.1%, scanned
        # A/B 2026-08-18 — the round-2 transformer-only restriction was a
        # relay measurement artifact twice over, see BENCHMARKING.md
        # rounds 3-4), XLA elsewhere.
        # 'block' -> fully-fused block kernel; 'on' == 'mlp'; 'off' -> XLA.
        def resolve(mode):
            if mode == "auto":
                from tpu_captioner.core.backend import on_tpu

                return "mlp" if on_tpu() else "off"
            if mode in ("on", True):
                return "mlp"
            if mode in (False, "off"):
                return "off"
            return mode

        # use_pallas may be a per-stage tuple: serialized Pallas launches in
        # a backward-traversed scan cannot pipeline, so fine-tuning wants
        # fused kernels only on the frozen (forward-only) stages.
        if isinstance(c.use_pallas, (tuple, list)):
            mode = tuple(resolve(m) for m in c.use_pallas)
        else:
            mode = resolve(c.use_pallas)
        self.encoder = ConvNeXtEncoder(
            encoded_image_size=c.encoded_image_size,
            dtype=dtype,
            depths=tuple(c.encoder_depths),
            dims=tuple(c.encoder_dims),
            pallas_mode=mode,
            remat=c.encoder_remat,
        )
        if c.decoder == "lstm":
            self.decoder = DecoderWithAttention(c)
        elif c.decoder == "lstm_no_attention":
            self.decoder = DecoderWithoutAttention(c)
        elif c.decoder == "transformer":
            self.decoder = TransformerDecoder(c, capture_alphas=False)
        elif c.decoder == "transformer_attvis":
            self.decoder = TransformerDecoder(c, capture_alphas=True)
        else:
            raise ValueError(c.decoder)

    @property
    def is_lstm(self) -> bool:
        return self.cfg.decoder in ("lstm", "lstm_no_attention")

    @property
    def has_attention(self) -> bool:
        return self.cfg.decoder in ("lstm", "transformer_attvis")

    # -- init ---------------------------------------------------------------
    def init_params(
        self,
        key: jax.Array,
        image_size: int = 256,
        pretrained_embeddings: Optional[jnp.ndarray] = None,
    ) -> Params:
        ke, kd = jax.random.split(key)
        dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        enc_params = self.encoder.init({"params": ke}, dummy)["params"]
        if self.cfg.decoder in ("transformer", "transformer_attvis"):
            dec_params = self.decoder.init_params(kd, pretrained_embeddings)
        else:
            dec_params = self.decoder.init_params(kd)
        return {"encoder": enc_params, "decoder": dec_params}

    # -- forward ------------------------------------------------------------
    def encode(
        self,
        params: Params,
        images_u8: jnp.ndarray,
        *,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """uint8 NHWC -> (B, enc, enc, 1024).  Training mode keeps stochastic
        depth active (the reference calls encoder.train() even while frozen,
        train.py:242)."""
        x = preprocess_images(images_u8, dtype=self.encoder.dtype)
        rngs = {"stochastic_depth": rng} if (rng is not None and not deterministic) else {}
        return self.encoder.apply(
            {"params": params["encoder"]}, x, deterministic=deterministic, rngs=rngs
        )

    def tf_forward(
        self,
        params: Params,
        encoder_out: jnp.ndarray,
        captions: jnp.ndarray,
        *,
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Teacher-forcing logits aligned so logits[:, t] predicts
        captions[:, t+1]; shape (B, L-1, V)."""
        p = params["decoder"]
        c = self.cfg
        if c.decoder == "lstm":
            return self.decoder.tf_forward(
                p, encoder_out, captions, rng=rng, deterministic=deterministic
            )
        if c.decoder == "lstm_no_attention":
            logits = self.decoder.tf_forward(
                p, encoder_out, captions, rng=rng, deterministic=deterministic
            )
            return logits, None
        kpm = captions == 0  # <pad> id (train.py:271)
        logits, alphas = self.decoder.tf_forward(
            p, encoder_out, captions, key_padding_mask=kpm,
            rng=rng, deterministic=deterministic,
        )
        # Transformer predicts at every input position; drop the last so
        # logits align with targets captions[:, 1:] (pack_padded slices the
        # same positions, train.py:274-275).
        logits = logits[:, :-1]
        alphas = alphas[:, :-1] if alphas is not None else None
        return logits, alphas

    def rollout(
        self,
        params: Params,
        encoder_out: jnp.ndarray,
        start_id: int,
        end_id: int,
        max_decode_len: int,
        *,
        rng: Optional[jax.Array] = None,
        deterministic: bool = True,
        teacher_tokens: Optional[jnp.ndarray] = None,
        teacher_prob: float = 0.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        """Greedy free-running decode -> (logits, sequences, alphas?).
        ``teacher_tokens``/``teacher_prob`` enable scheduled sampling."""
        p = params["decoder"]
        c = self.cfg
        kw = dict(rng=rng, deterministic=deterministic,
                  teacher_tokens=teacher_tokens, teacher_prob=teacher_prob)
        if c.decoder == "lstm":
            if deterministic and self._decode_kernel_mode() != "off":
                logits, alphas, seqs = self.decoder.fused_rollout(
                    p, encoder_out, start_id, end_id, max_decode_len,
                    rng=rng, teacher_tokens=teacher_tokens,
                    teacher_prob=teacher_prob,
                )
            else:
                logits, alphas, seqs = self.decoder.rollout(
                    p, encoder_out, start_id, end_id, max_decode_len, **kw
                )
            return logits, seqs, alphas
        if c.decoder == "lstm_no_attention":
            logits, seqs = self.decoder.rollout(
                p, encoder_out, start_id, end_id, max_decode_len, **kw
            )
            return logits, seqs, None
        mode = self._decode_kernel_mode()
        if deterministic and mode == "mega":
            import jax.numpy as jnp

            from tpu_captioner.core.backend import on_tpu

            return self.decoder.mega_rollout(
                p, encoder_out, start_id, end_id, max_decode_len,
                rng=rng, teacher_tokens=teacher_tokens, teacher_prob=teacher_prob,
                storage_dtype=jnp.bfloat16 if on_tpu() else None,
            )
        if deterministic and mode == "step":
            return self.decoder.fused_rollout(
                p, encoder_out, start_id, end_id, max_decode_len,
                rng=rng, teacher_tokens=teacher_tokens, teacher_prob=teacher_prob,
            )
        return self.decoder.rollout(
            p, encoder_out, start_id, end_id, max_decode_len, **kw
        )

    def _decode_kernel_mode(self, context: str = "rollout") -> str:
        """'off' | 'step' (per-token fused kernel) | 'mega' (whole-rollout
        single launch).  'mega' requires the vocab tables + weights to fit
        VMEM (~(2V*E + L*7E^2)*2 bytes bf16); fall back to 'step' when too
        big (COCO's 47k-word vocab without min-freq pruning, say).  For the
        LSTM+attention decoder any non-'off' mode selects its own fused
        step kernel (ops/lstm_step.py) in deterministic rollouts/beam.

        'auto' is FAMILY- and CONTEXT-aware, set from on-chip A/Bs
        (BENCHMARKING.md "LSTM decode-kernel default"): the transformer
        families take the fused step kernel everywhere (measured faster in
        eval and beam), while for the LSTM the plain XLA loop wins BOTH
        contexts (beam-5: 921.7 vs 817.1 caps/s, artifacts/r04_queue/;
        greedy eval: see the r05 A/B artifacts), so 'auto' resolves to
        'off' for the LSTM.  Explicit 'on'/'step'/'mega' still force the
        kernels for any family."""
        mode = self.cfg.decode_kernel
        if mode == "off" or mode is False:
            return "off"
        c = self.cfg
        mega_bytes = 2 * (
            2 * c.vocab_size * c.embed_dim
            + c.num_layers * 7 * c.embed_dim * c.embed_dim
        )
        mega_ok = mega_bytes < 60 * 1024 * 1024
        if mode in ("on", "step"):
            return "step"
        if mode == "mega":
            return "mega" if mega_ok else "step"
        if mode == "auto":
            from tpu_captioner.core.backend import on_tpu

            if not on_tpu():
                return "off"
            if c.decoder == "lstm":
                return "off"
            return "step"
        return "off"

    def _use_decode_kernel(self, context: str = "beam") -> bool:
        """Beam adapters use the per-token kernel when it wins for their
        family (see _decode_kernel_mode)."""
        return self._decode_kernel_mode(context) != "off"
