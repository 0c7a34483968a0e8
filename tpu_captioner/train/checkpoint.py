"""Checkpoint save/restore with the reference's payload and naming semantics.

Reference save_checkpoint (utils/utils.py:195-224): every epoch writes
{epoch, epochsSinceImprovement, bleu-4, encoder, decoder, both optimizer
states, results history} under a name encoding decoder type / fine-tune layer
/ encoder LR / embedding / dataset, plus a ``BEST_``-prefixed copy when
validation BLEU-4 improves.

Here the device state (params + optimizer pytrees + step) is stored via
Orbax (async-capable, multi-host-safe) and the host metadata (epoch,
patience counter, BLEU, per-epoch results rows) as JSON next to it.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from tpu_captioner.train.state import TrainState


def checkpoint_name(
    data_name: str,
    lstm_decoder: bool,
    starting_layer: int,
    encoder_lr: float,
    embedding_name: Optional[str] = None,
) -> str:
    """Reference filename scheme (utils/utils.py:217-220), sans .pth.tar."""
    if lstm_decoder:
        return f"checkpoint_LSTM_Finetuning{starting_layer}_{encoder_lr}_{data_name}"
    return (
        f"checkpoint_Transformer_Finetuning{starting_layer}_{encoder_lr}_"
        f"{embedding_name}_{data_name}"
    )


def _ckpt(path: str) -> str:
    return os.path.join(path, "state")


def save_checkpoint(
    directory: str,
    name: str,
    state: TrainState,
    host_meta: Dict[str, Any],
    is_best: bool = False,
) -> str:
    """Write directory/name/{state, meta.json}; copy to BEST_name on best.

    Multi-process: EVERY process must call this — Orbax's save is itself a
    collective (sync_global_devices barriers inside), so a coordinator-only
    call deadlocks the pod at the first checkpoint (found by
    tests/test_distributed_real.py; the reference's rank-0-only torch.save,
    trainMultiGPU.py:295, has no such constraint).  Host-side writes
    (meta.json, the BEST_ copy) still happen on the coordinator only."""
    from tpu_captioner.parallel.collectives import is_coordinator, is_multiprocess

    base = os.path.join(os.path.abspath(directory), name)
    os.makedirs(base, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    state_path = _ckpt(base)
    if is_coordinator() and os.path.exists(state_path):
        shutil.rmtree(state_path)
    if is_multiprocess():
        # Nobody may enter the save while the coordinator clears the old
        # state directory (shared filesystem).
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("tpu_captioner_ckpt_clear")
    ckptr.save(state_path, state)
    ckptr.wait_until_finished()
    if is_coordinator():
        with open(os.path.join(base, "meta.json"), "w") as f:
            json.dump(host_meta, f)
        if is_best:
            best = os.path.join(os.path.abspath(directory), f"BEST_{name}")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(base, best)
    return base


def restore_checkpoint(
    path: str, state_template: TrainState
) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore (state, host_meta) from a directory written by save_checkpoint."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state_template)
    state = ckptr.restore(_ckpt(path), abstract)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return state, meta
