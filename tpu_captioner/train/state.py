"""Train state and optimizers.

Reference semantics reproduced (train.py:110-174, utils/utils.py:183-236):

- two separate Adam optimizers (decoder always; encoder only once fine-tuning
  starts) with torch defaults (b1=0.9, b2=0.999, eps=1e-8);
- gradients clamped ELEMENTWISE to +-grad_clip before the update (the
  reference's clip_gradient is a clamp, not a norm clip);
- learning rates are mutable state (adjust_learning_rate multiplies by 0.8
  after 8 stagnant epochs) via optax.inject_hyperparams;
- the epoch-20 encoder unlock creates a FRESH encoder Adam (train.py:161-165)
  — ``init_encoder_optimizer`` is re-run at the unlock epoch.  Encoder
  freezing below ``starting_layer`` is a gradient mask (zeroed grads keep
  Adam moments at exactly zero, so masking ≡ the reference's param-group
  filtering while keeping the state pytree shape-stable for checkpointing).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


def make_optimizer(lr: float, grad_clip: Optional[float] = 5.0):
    def opt_fn(learning_rate):
        chain = []
        if grad_clip is not None:
            chain.append(optax.clip(grad_clip))
        chain.append(optax.adam(learning_rate))
        return optax.chain(*chain)

    return optax.inject_hyperparams(opt_fn)(learning_rate=lr)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def scale_lr(opt_state, factor: float):
    """adjust_learning_rate (utils/utils.py:227-236) on an inject_hyperparams
    state: returns a new state with lr *= factor."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = opt_state.hyperparams["learning_rate"] * factor
    return opt_state._replace(hyperparams=hp)


class TrainState(struct.PyTreeNode):
    """Jit-carried training state (host bookkeeping lives in the loop)."""

    params: Dict[str, Any]
    dec_opt_state: Any
    enc_opt_state: Any
    step: jnp.ndarray  # int32 scalar

    @classmethod
    def create(cls, params, dec_opt, enc_opt):
        return cls(
            params=params,
            dec_opt_state=dec_opt.init(params["decoder"]),
            enc_opt_state=enc_opt.init(params["encoder"]),
            step=jnp.zeros((), jnp.int32),
        )

    def reinit_encoder_optimizer(self, enc_opt):
        """Fresh encoder Adam at the fine-tune unlock epoch (train.py:164)."""
        return self.replace(enc_opt_state=enc_opt.init(self.params["encoder"]))


def zero_frozen(grads: Dict, mask: Dict) -> Dict:
    """Zero gradients where the boolean mask pytree is False."""
    return jax.tree_util.tree_map(
        lambda g, m: g * jnp.asarray(m, g.dtype), grads, mask
    )
