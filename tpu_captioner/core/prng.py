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
    """Root key for a run.

    On TPU the default implementation is ``rbg`` (hardware-friendly counter
    RNG): the flagship TF train step draws ~30M dropout-mask bits per step
    across the decoder's 40+ masks, and threefry2x32 spends ~1.9 ms/step of
    pure VPU time generating them (BENCHMARKING.md round-3 decomposition).
    rbg lowers to the TPU PRNG instructions instead.  Elsewhere (CPU tests)
    the jax default threefry is kept.

    Caveats (trade-offs accepted for training dropout, nothing else):
    same-seed reruns on the SAME topology are reproducible, but rbg bit
    streams are implementation-defined under SPMD partitioning — masks may
    differ between mesh shapes (e.g. 8-chip DP vs single chip) and across
    jax/XLA upgrades.  Anything needing cross-topology bit-exactness can
    force threefry with ``TPU_CAPTIONER_PRNG_IMPL=threefry2x32`` (the CPU
    test suite pins the threefry invariants).
    """
    if impl is None:
        import os

        impl = os.environ.get("TPU_CAPTIONER_PRNG_IMPL")
    if impl is None:
        from tpu_captioner.core.backend import on_tpu

        impl = "rbg" if on_tpu() else None
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
