"""Backend predicates shared by kernel selection and compiler options.

One definition of "are we on TPU" — the Pallas kernel enablement
(train/model.py) and the TPU-specific compiler options that make those
kernels compile (train/steps.py scoped-VMEM bump) must agree, or a backend
that enables kernels without the options hits the documented scoped-VMEM
OOM in fine-tune programs.
"""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"
