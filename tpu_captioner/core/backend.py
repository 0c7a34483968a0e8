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


def decode_compiler_options(model):
    """Scoped-VMEM budget for decode programs (greedy eval / beam) whose
    per-token body runs a fused Pallas kernel: XLA stages the loop-carried
    KV caches and the kernel's per-grid-cell operands in scoped VMEM, and
    the 16 MB default OOMs at compile.  Returns a dict or None; ONE home
    for the env knob (TPU_CAPTIONER_DECODE_VMEM_KIB, default 100 MB) shared
    by make_eval_step, the beam jit, and the bench/AOT-gate scripts."""
    if model.cfg.decoder not in ("transformer", "transformer_attvis", "lstm"):
        return None
    if not (model._use_decode_kernel() and on_tpu()):
        return None
    import os

    limit = int(os.environ.get("TPU_CAPTIONER_DECODE_VMEM_KIB", 102400))
    return {"xla_tpu_scoped_vmem_limit_kib": limit}
