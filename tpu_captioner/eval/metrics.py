"""Metric helpers: meters, top-k accuracy, rollout alignment masks.

Fixed-shape re-design of the reference's metric plumbing:

- ``AverageMeter`` (utils/utils.py:163-180) — unchanged host-side helper.
- ``topk_correct`` (utils/utils.py:239-254) — counts targets inside the
  top-k logits, on device, mask-weighted.
- ``decode_lengths_from_sequences`` / ``rollout_token_mask`` re-express
  ``preprocessDecoderOutputForMetrics`` (utils/utils.py:261-295) as masks over
  fixed (B, T) grids instead of dynamically-filtered flat tensors: length_i =
  index of the first ``<end>`` + 1 (else maxDecodeLen); a (sample, step) token
  is valid iff step < length_i AND the aligned target caps[i, 1+step] is not
  ``<pad>``.  Losses/accuracies masked by this grid are numerically identical
  to the reference's filtered-concat version.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


class AverageMeter:
    """Most recent / sum / count / average of a metric (utils/utils.py:163)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count if self.count else 0.0


def decode_lengths_from_sequences(
    sequences: jnp.ndarray, end_id: int, max_decode_len: int
) -> jnp.ndarray:
    """(B, T) sequences -> (B,) lengths: first <end> index + 1, else max."""
    is_end = sequences == end_id
    any_end = jnp.any(is_end, axis=1)
    first_end = jnp.argmax(is_end, axis=1)
    return jnp.where(any_end, first_end + 1, max_decode_len).astype(jnp.int32)


def rollout_token_mask(
    sequences: jnp.ndarray,
    captions: jnp.ndarray,
    end_id: int,
    pad_id: int,
    max_decode_len: int,
    row_valid: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (mask (B,T) bool, targets (B,T) int32, lengths (B,)).

    ``targets[:, t] = captions[:, 1+t]`` aligned to rollout step t
    (utils/utils.py:278); mask selects step < length and target != pad,
    optionally ANDed with a batch-padding row mask.
    """
    B, T = sequences.shape
    lengths = decode_lengths_from_sequences(sequences, end_id, max_decode_len)
    targets = jax.lax.dynamic_slice_in_dim(captions, 1, T, axis=1)
    steps = jnp.arange(T)[None, :]
    mask = (steps < lengths[:, None]) & (targets != pad_id)
    if row_valid is not None:
        mask = mask & row_valid[:, None]
    return mask, targets.astype(jnp.int32), lengths


def topk_correct(
    logits: jnp.ndarray,  # (..., V)
    targets: jnp.ndarray,  # (...,)
    k: int,
    mask: jnp.ndarray = None,  # (...,) bool
) -> jnp.ndarray:
    """Count of positions whose target is among the top-k logits
    (utils/utils.py:239-254), mask-weighted.  Ties broken like torch.topk
    (by index order) — equality with the target's logit value is used so tie
    behaviour matches in the non-degenerate case."""
    target_logit = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    rank = jnp.sum(logits > target_logit[..., None], axis=-1)
    correct = rank < k
    if mask is not None:
        correct = correct & mask
    return jnp.sum(correct)


def masked_cross_entropy(
    logits: jnp.ndarray,  # (B, T, V)
    targets: jnp.ndarray,  # (B, T)
    mask: jnp.ndarray,  # (B, T) bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sum of token CE over mask, token count) in f32 — callers divide for
    the mean, matching nn.CrossEntropyLoss on packed/filtered tokens."""
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    ce = lse - tgt
    m = mask.astype(jnp.float32)
    return jnp.sum(ce * m), jnp.sum(m)
