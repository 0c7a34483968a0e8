"""Dispatch-overhead-free benchmarking: the scanned difference quotient.

The axon relay's per-dispatch overhead is large AND drifts (measured 20 ->
100+ ms within one session — BENCHMARKING.md "Relay drift caveat"), so any
timing built from separate dispatches is only comparable to itself.  The
durable instrument: run the step k times inside ONE jitted ``lax.scan``
over k distinct on-device inputs, at two scan lengths, and report
``(t_k2 - t_k1) / (k2 - k1)`` — dispatch overhead and program prologue
cancel in the difference.

Used by bench_full.py and the scripts/bench_*.py family.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional, Tuple


def scanned_quotient(
    scalar_fn: Callable[[Any, Any], Any],
    params: Any,
    xs: Any,  # (>=k2, ...) distinct per-iteration inputs, already on device
    *,
    k1: int,
    k2: int,
    opts: Optional[dict] = None,  # jit compiler_options
    log: Optional[Callable[[str], None]] = None,
    name: str = "",
    reps: int = 1,  # timed repetitions per scan length; min is reported
) -> Tuple[float, float, float]:
    """Returns (sec_per_iteration, t_k1, t_k2).  ``scalar_fn(params, x)``
    must return a f32 scalar whose value depends on the whole step (the
    accumulated sum is fetched to the host, fencing execution through the
    relay)."""
    import jax
    import jax.numpy as jnp

    def scanned(k):
        def run(p, xs):
            def body(c, x):
                return c + scalar_fn(p, x), None
            return jax.lax.scan(body, jnp.float32(0), xs[:k])[0]
        return jax.jit(run, compiler_options=opts)

    f1, f2 = scanned(k1), scanned(k2)
    t0 = time.perf_counter()
    float(f1(params, xs))
    float(f2(params, xs))
    if log is not None:
        log(f"{name} compile+first: {time.perf_counter() - t0:.1f}s")

    def timed(f):
        # Min over reps: relay jitter is strictly additive, so the minimum
        # is the cleanest estimate of the true device time.  reps=1 keeps
        # the historical single-shot behavior.
        best = float("inf")
        for _ in range(max(1, reps)):
            t = time.perf_counter()
            float(f(params, xs))
            best = min(best, time.perf_counter() - t)
        return best

    t1, t2 = timed(f1), timed(f2)
    return (t2 - t1) / (k2 - k1), t1, t2


def scanned_train_quotient(
    step_fn: Callable[[Any, Any], Tuple[Any, Any]],
    state0: Any,
    xs: Any,  # (>=k2, ...) distinct per-iteration inputs, already on device
    *,
    k1: int,
    k2: int,
    opts: Optional[dict] = None,
    log: Optional[Callable[[str], None]] = None,
    name: str = "",
    reps: int = 1,
) -> Tuple[float, float, float]:
    """Same difference-quotient instrument for STATE-CARRYING steps (train
    steps: state -> state).  ``step_fn(state, x) -> (state, scalar)``; the
    state is threaded through the scan carry so iterations serialize, and
    the summed scalars are fetched to fence execution.  Distinct ``xs`` per
    iteration keep XLA from hoisting input-dependent work out of the loop."""
    import jax
    import jax.numpy as jnp

    def scanned(k):
        def run(st, xs):
            def body(c, x):
                st2, s = step_fn(c, x)
                return st2, s

            _, ss = jax.lax.scan(body, st, jax.tree_util.tree_map(
                lambda a: a[:k], xs
            ))
            return jnp.sum(ss)

        return jax.jit(run, compiler_options=opts)

    f1, f2 = scanned(k1), scanned(k2)
    t0 = time.perf_counter()
    float(f1(state0, xs))
    float(f2(state0, xs))
    if log is not None:
        log(f"{name} compile+first: {time.perf_counter() - t0:.1f}s")

    def timed(f):
        best = float("inf")
        for _ in range(max(1, reps)):
            t = time.perf_counter()
            float(f(state0, xs))
            best = min(best, time.perf_counter() - t)
        return best

    t1, t2 = timed(f1), timed(f2)
    return (t2 - t1) / (k2 - k1), t1, t2
