"""Early-exit scan: lax.scan semantics that stop when the batch is done.

The reference's greedy no-TF loops break out as soon as every row has
emitted ``<end>`` (transformerDecoder.py:125-127 ``if len(activeIndices)
== 0: break``, decoder.py:147-149, lstmNoAttention.py:118-120).  The
fixed-shape ``lax.scan`` rollouts here always run ``max_decode_len``
(51) steps; on real captions (mean length ~12) that is ~4x more decode
steps than the reference executes.  ``scan_early_exit`` restores the
early exit TPU-natively: a ``lax.while_loop`` over the same body writes
per-step outputs into zero-initialized buffers, and the condition stops
once ``done(carry)`` — every rollout body emits exact zeros for
finished rows, so a run that stops at step s computes exactly what the
full scan computes (whose remaining steps emit zeros into the stack
anyway); the only deltas are XLA fusion-level float reassociation vs an
unrolled scan (~1e-9, tests/test_early_exit.py pins the tolerance and
exact token-sequence agreement).

Not reverse-differentiable (``while_loop``): training rollouts keep
``lax.scan``; the call sites auto-enable this only on deterministic,
teacher-free (eval/test) rollouts.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp


def scan_early_exit(
    body: Callable[[Any, Any], Tuple[Any, Any]],
    carry0: Any,
    xs: Any,
    done: Callable[[Any], jnp.ndarray],
) -> Tuple[Any, Any]:
    """``lax.scan(body, carry0, xs)`` that stops iterating once
    ``done(carry)`` is True (checked before each step).  Per-step outputs
    of never-executed steps keep their zero initialization, so the result
    equals the full scan exactly whenever the body emits zeros after
    ``done`` would hold.  Returns (final_carry, stacked_outputs); the
    final carry is the carry at exit time (call sites here discard it)."""
    leaves = jax.tree_util.tree_leaves(xs)
    length = leaves[0].shape[0]
    x0 = jax.tree_util.tree_map(lambda a: a[0], xs)
    _, out_sds = jax.eval_shape(body, carry0, x0)
    bufs0 = jax.tree_util.tree_map(
        lambda s: jnp.zeros((length,) + s.shape, s.dtype), out_sds
    )

    def cond(st):
        t, carry, _ = st
        return (t < length) & jnp.logical_not(done(carry))

    def wbody(st):
        t, carry, bufs = st
        x = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, t, 0, keepdims=False),
            xs,
        )
        carry2, outs = body(carry, x)
        bufs2 = jax.tree_util.tree_map(
            lambda b, o: jax.lax.dynamic_update_index_in_dim(b, o, t, 0),
            bufs, outs,
        )
        return (t + 1, carry2, bufs2)

    _, carry_end, bufs = jax.lax.while_loop(
        cond, wbody, (jnp.int32(0), carry0, bufs0)
    )
    return carry_end, bufs
