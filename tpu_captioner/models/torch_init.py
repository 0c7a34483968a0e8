"""Initializers matching PyTorch's default/explicit init distributions.

The reference trains from these exact distributions (models/decoder.py:58-61,
torch nn.Linear/nn.LSTMCell/nn.MultiheadAttention resets), and training
quality parity is sensitive to them, so they are reproduced for JAX:

- ``linear_kaiming``: torch nn.Linear default — W,b ~ U(-1/sqrt(fan_in), +).
- ``uniform_pm``:     U(-a, a) (embedding/fc init in LSTM decoders, +-0.1).
- ``lstm_uniform``:   torch nn.LSTMCell default — U(-1/sqrt(hidden), +).
- ``xavier_uniform``: torch MultiheadAttention in-proj init.
- ``trunc_normal02``: torchvision ConvNeXt conv/linear init (std 0.02).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.nn.initializers import Initializer


def uniform_pm(a: float) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)

    return init


def linear_kaiming_weight() -> Initializer:
    """torch nn.Linear weight default: U(-1/sqrt(fan_in), +).  Flax Dense
    kernels are (fan_in, fan_out), so fan_in = shape[0]."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(shape[0])
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def linear_kaiming_bias(fan_in: int) -> Initializer:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return uniform_pm(bound)


def lstm_uniform(hidden_size: int) -> Initializer:
    return uniform_pm(1.0 / math.sqrt(hidden_size))


def xavier_uniform() -> Initializer:
    return jax.nn.initializers.glorot_uniform()


def trunc_normal02() -> Initializer:
    # torch trunc_normal_(std=0.02) truncates at +-2 (absolute), i.e. 100 sigma
    # ... no: torch default truncates at (a=-2, b=2) in *value*, which at
    # std=0.02 is +-100 sigma — effectively an untruncated normal.
    def init(key, shape, dtype=jnp.float32):
        return 0.02 * jax.random.normal(key, shape, dtype)

    return init
