"""PRNG discipline.

The reference seeds python/numpy/torch with 42 (+rank in the DDP driver,
trainMultiGPU.py:6-11) and relies on global state.  Here randomness is
explicit: one root key per run, folded by (purpose, epoch, step, host) so
every jitted step receives a fresh, reproducible key with no global state.
"""

from __future__ import annotations

import jax

# Stable fold constants per purpose.
_PURPOSES = {"dropout": 0, "stochastic_depth": 1, "init": 2, "data": 3, "rollout": 4}


def root_key(seed: int = 42) -> jax.Array:
    return jax.random.PRNGKey(seed)


def step_key(root: jax.Array, purpose: str, epoch: int, step, host: int = 0):
    k = jax.random.fold_in(root, _PURPOSES[purpose])
    k = jax.random.fold_in(k, epoch)
    k = jax.random.fold_in(k, step)
    if host:
        k = jax.random.fold_in(k, host)
    return k
