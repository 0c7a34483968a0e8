"""Backend predicates shared by kernel selection and compiler options.

One definition of "are we on TPU" — the Pallas kernel enablement
(train/model.py) and the TPU-specific compiler options that make those
kernels compile (train/steps.py scoped-VMEM bump) must agree, or a backend
that enables kernels without the options hits the documented scoped-VMEM
OOM in fine-tune programs.
"""

from __future__ import annotations

import jax


_ON_TPU: bool | None = None  # cached once backend init succeeds


def on_tpu() -> bool:
    """True iff the default JAX backend is TPU.

    Never raises: a dead/unreachable backend (``jax.default_backend()``
    throwing ``RuntimeError: ... UNAVAILABLE`` when the relay is down —
    the BENCH_r03 failure mode) degrades to False so model construction
    and kernel-mode resolution still work; compute will fail later with
    the real error only if the caller actually dispatches to the device.
    The successful answer is cached; failures are NOT, so a backend that
    comes up later is still detected."""
    global _ON_TPU
    if _ON_TPU is None:
        try:
            _ON_TPU = jax.default_backend() == "tpu"
        except Exception:
            return False
    return _ON_TPU


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
