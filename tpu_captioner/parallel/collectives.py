"""Multi-host collective helpers.

Replaces the reference's hand-rolled DDP communication
(trainMultiGPU.py:96-131, 325-327):

- gradient/metric reduction needs NO helper here — it is implicit in the
  jitted step's sharding (XLA emits the psums over ICI);
- BLEU corpus assembly across hosts: the reference pickles variable-length
  ref/hyp lists and all_gathers padded byte tensors
  (gather_all_data, trainMultiGPU.py:110-131) — a wart.  Here hypotheses are
  already fixed-shape (B, T) int arrays + length vectors, so a plain
  ``process_allgather`` moves them;
- early-stop counter broadcast (trainMultiGPU.py:325-327).
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_coordinator() -> bool:
    return jax.process_index() == 0


def _sorted_addressable_shards(arr):
    return sorted(arr.addressable_shards, key=lambda s: s.index[0].start or 0)


def host_local_rows(arr) -> np.ndarray:
    """This process's rows of a 'data'-sharded (or single-device) array.

    Concatenates the addressable shards in global row order — the full array
    single-process; each host's rows on a pod (device_get of a
    non-replicated global array is not possible there).  Do NOT use on
    replicated arrays (every shard holds the full value)."""
    shards = _sorted_addressable_shards(arr)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def host_local_row_indices(arr) -> np.ndarray:
    """Global row indices corresponding to ``host_local_rows(arr)``, in the
    same order.  Use to slice a REPLICATED array consistently with a sharded
    one — the device order along the mesh axis decides which global rows a
    process owns, and it need not be one contiguous block."""
    n = arr.shape[0]
    return np.concatenate(
        [
            np.arange(*s.index[0].indices(n))
            for s in _sorted_addressable_shards(arr)
        ]
    )


def gather_eval_outputs(
    sequences: np.ndarray, lengths: np.ndarray, all_captions: np.ndarray,
    valid: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All-gather fixed-shape eval outputs across hosts (no-op single-host)."""
    if not is_multiprocess():
        return sequences, lengths, all_captions, valid
    from jax.experimental import multihost_utils as mh

    out = mh.process_allgather((sequences, lengths, all_captions, valid))
    return tuple(np.concatenate(x, axis=0) for x in out)


def broadcast_scalar(value: float) -> float:
    """Broadcast a host scalar from process 0 (== dist.broadcast src=0)."""
    if not is_multiprocess():
        return value
    from jax.experimental import multihost_utils as mh

    return float(mh.broadcast_one_to_all(np.asarray(value)))
