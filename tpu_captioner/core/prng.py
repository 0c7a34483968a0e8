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


def root_key(seed: int = 42, impl: str | None = None) -> jax.Array:
    """Root key for a run.  Default: jax's threefry2x32, everywhere.

    ``rbg`` (the TPU hardware counter RNG) was the round-3 default on TPU,
    on the theory that threefry's ~1.9 ms/step of dropout-mask generation
    (BENCHMARKING.md round-3 decomposition) would lower to near-free PRNG
    instructions.  MEASURED on the v5e relay (2026-08-18, libtpu at HEAD):
    the flagship TF train step runs 433.7 ms/step with an rbg key vs
    27.0 ms/step with threefry — a 16x pathological slowdown in how this
    compiler lowers rbg dropout inside the fused train program, not a win.
    rbg therefore remains opt-in only (``TPU_CAPTIONER_PRNG_IMPL=rbg``);
    re-measure before ever flipping the default back.  threefry also keeps
    masks bit-exact across topologies and jax upgrades, which rbg does not
    guarantee under SPMD partitioning.
    """
    if impl is None:
        import os

        impl = os.environ.get("TPU_CAPTIONER_PRNG_IMPL")
    if impl == "threefry2x32":
        impl = None  # jax default
    if impl is None:
        return jax.random.PRNGKey(seed)
    # Typed key: carries the impl through fold_in/split (a legacy uint32
    # PRNGKey would be re-interpreted as threefry by downstream calls).
    return jax.random.key(seed, impl=impl)


def step_key(root: jax.Array, purpose: str, epoch: int, step, host: int = 0):
    k = jax.random.fold_in(root, _PURPOSES[purpose])
    k = jax.random.fold_in(k, epoch)
    k = jax.random.fold_in(k, step)
    if host:
        k = jax.random.fold_in(k, host)
    return k
