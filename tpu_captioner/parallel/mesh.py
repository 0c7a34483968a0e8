"""Device-mesh construction for data-parallel training over ICI.

Replaces the reference's SLURM/NCCL process-group plumbing
(trainMultiGPU.py:143-158): JAX discovers the topology, and a 1-D 'data'
mesh axis carries gradient psums over ICI (multi-host via
jax.distributed.initialize, handled by the caller's launcher).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(num_devices: int = 0, axis_name: str = "data") -> Mesh:
    """Build a 1-D mesh over the first ``num_devices`` devices (0 = all)."""
    devices = jax.devices()
    if num_devices and num_devices > 0:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} available"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def maybe_initialize_distributed() -> None:
    """Initialize multi-host JAX if launched under a multi-process runtime.

    Single-process runs (the common case here) are a no-op; on a multi-host
    TPU pod slice, `jax.distributed.initialize()` picks up coordinator env
    configuration automatically — no SLURM_PROCID parsing needed
    (contrast trainMultiGPU.py:144-148).
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
