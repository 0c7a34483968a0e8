"""Decode-path microbench: fused Pallas decode-step kernel vs XLA rollout.

Runs the flagship transformer decoder (6 layers, E=512, H=8, ffn=512) on
random encoder output — no encoder, no data pipeline — and times the full
greedy rollout (51 cached steps) both ways.  This isolates the decode body
that BENCHMARKING.md's ablations identified as the eval/beam bottleneck.

Usage: python scripts/bench_decode_kernel.py [--rows 32] [--vocab 9490]
       [--steps 51] [--mode both|fused|xla] [--dtype float32]


WARNING: this script times SEPARATE dispatches; the relay's per-dispatch
overhead DRIFTS (20 -> 100+ ms within one session — BENCHMARKING.md 'Relay
drift caveat'), so its numbers are only comparable same-hour.  Prefer the
scanned difference-quotient instruments (scripts/bench_beam_scanned.py,
scripts/bench_eval_parts.py).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[decode-bench] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--vocab", type=int, default=9490)
    ap.add_argument("--steps", type=int, default=51)
    ap.add_argument("--mode", default="both", choices=["both", "fused", "xla"])
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--precise", default="1")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_captioner.core.config import ModelConfig
    from tpu_captioner.models.transformer import TransformerDecoder

    cfg = ModelConfig(
        decoder="transformer", vocab_size=args.vocab,
        compute_dtype=args.dtype,
    )
    dec = TransformerDecoder(cfg, capture_alphas=False)
    p = jax.jit(dec.init_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(p)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    enc_out = jax.random.normal(
        jax.random.PRNGKey(1), (args.rows, 7, 7, cfg.encoder_dim), dt
    )
    start, end = args.vocab - 2, args.vocab - 1

    # Distinct inputs per rep + a host fetch at the end: repeated identical
    # dispatches and bare block_until_ready are not reliable through the
    # relay (see BENCHMARKING.md measurement-hygiene note).
    enc_outs = [enc_out * (1.0 + 1e-6 * i) for i in range(args.reps)]
    jax.block_until_ready(enc_outs)

    def run(name, fn):
        # The scan-carried KV caches (2 x 25 MB at B=32) get staged in scoped
        # VMEM around the fused kernel; raise the budget (v5e: 128 MB total).
        opts = None
        if name == "fused":
            kib = int(os.environ.get("TPU_CAPTIONER_DECODE_VMEM_KIB", 102400))
            opts = {"xla_tpu_scoped_vmem_limit_kib": kib}
        f = jax.jit(fn, compiler_options=opts)
        t0 = time.perf_counter()
        out = f(p, enc_out)
        jax.block_until_ready(out)
        log(f"{name} compile+first: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for i in range(args.reps):
            out = f(p, enc_outs[i])
        float(out.ravel()[0])
        sec = (time.perf_counter() - t0) / args.reps
        row = {
            "metric": f"decode_rollout_{name}",
            "sec_per_batch": round(sec, 5),
            "ms_per_step": round(sec / args.steps * 1e3, 3),
            "rows": args.rows, "steps": args.steps, "vocab": args.vocab,
            "dtype": args.dtype,
        }
        print(json.dumps(row), flush=True)
        return sec

    res = {}
    if args.mode in ("both", "xla"):
        res["xla"] = run(
            "xla",
            lambda p, e: dec.rollout(p, e, start, end, args.steps,
                                     deterministic=True)[1],
        )
    if args.mode in ("both", "fused"):
        res["fused"] = run(
            "fused",
            lambda p, e: dec.fused_rollout(
                p, e, start, end, args.steps, precise=args.precise == "1"
            )[1],
        )
    if len(res) == 2:
        log(f"speedup: {res['xla'] / res['fused']:.2f}x")


if __name__ == "__main__":
    main()
