"""Beam-5 throughput microbench for the batched beam loop.

Usage: python scripts/bench_beam.py [--batch 32] [--mode fused|xla|both]
Reports captions/sec with the ConvNeXt-Base encoder pass included (same
condition as bench_full.py's beam phase).


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
    print(f"[beam-bench] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--mode", default="both", choices=["both", "fused", "xla"])
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from tpu_captioner.core.config import ModelConfig
    from tpu_captioner.infer.beam import beam_search_batch
    from tpu_captioner.train.model import CaptionModel

    V, B = 9490, args.batch
    base = ModelConfig(decoder="transformer", vocab_size=V,
                       compute_dtype=args.dtype)  # 'auto' encoder kernel
    model_off = CaptionModel(dataclasses.replace(base, decode_kernel="off"))
    params = jax.jit(lambda k: model_off.init_params(k, image_size=256))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8))
    # Distinct inputs per rep (identical repeated dispatches are unreliable
    # through the relay), derived ON-DEVICE — host transfers are lazy over
    # the relay tunnel and would pollute the timed loop.
    vary = jax.jit(lambda x, s: x + s)
    image_list = [vary(images, np.uint8(i + 1)) for i in range(args.reps)]
    jax.block_until_ready(image_list)
    for a in image_list:
        float(a.ravel()[0].astype(jnp.float32))
    kw = dict(beam_size=args.beam, max_steps=50, start_id=V - 2, end_id=V - 1)

    def run(name, model):
        t0 = time.perf_counter()
        res = beam_search_batch(model, params, images, **kw)
        jax.block_until_ready(res.sequence)
        log(f"{name} compile+first: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for i in range(args.reps):
            res = beam_search_batch(model, params, image_list[i], **kw)
        float(res.score[0])
        dt = (time.perf_counter() - t0) / args.reps
        print(json.dumps({
            "metric": f"beam{args.beam}_captions_per_sec_{name}",
            "value": round(B / dt, 2),
            "sec_per_batch": round(dt, 4),
            "batch": B, "dtype": args.dtype,
        }), flush=True)
        return dt

    res = {}
    if args.mode in ("both", "xla"):
        res["xla"] = run("xla", model_off)
    if args.mode in ("both", "fused"):
        res["fused"] = run(
            "fused", CaptionModel(dataclasses.replace(base, decode_kernel="on"))
        )
    if len(res) == 2:
        log(f"speedup: {res['xla'] / res['fused']:.2f}x")


if __name__ == "__main__":
    main()
