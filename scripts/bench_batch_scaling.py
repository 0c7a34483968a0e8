"""Batch-size scaling probe for the frozen TF train step (VERDICT r2 #4).

Round-2 measured a non-monotonic cliff: 27 ms @ bs=32, 177 ms @ bs=128,
229 ms @ bs=256 (723 img/s at 128 — below both neighbors).  This script
sweeps the batch sizes with per-point MFU so the cliff can be located and
explained (suspects: VMEM/layout cliff in the fused ConvNeXt MLP kernel's
row tiling, or an XLA layout change).

Usage: python scripts/bench_batch_scaling.py [--sizes 32,48,64,96,128]
       [--pallas auto|off] [--dtype float32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[bs-scaling] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="32,48,64,96,128")
    ap.add_argument("--pallas", default="auto")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tpu_captioner.core.config import ModelConfig, TrainConfig
    from tpu_captioner.eval.flops import mfu, train_step_flops
    from tpu_captioner.train.model import CaptionModel
    from tpu_captioner.train.state import TrainState, make_optimizer
    from tpu_captioner.train.steps import make_train_step

    V = 9490
    model = CaptionModel(
        ModelConfig(decoder="transformer", vocab_size=V,
                    compute_dtype=args.dtype, use_pallas=args.pallas)
    )
    params = jax.jit(lambda k: model.init_params(k, image_size=256))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    wid = {"<pad>": 0, "<unk>": V - 3, "<start>": V - 2, "<end>": V - 1}
    rng = np.random.default_rng(0)

    for B in sizes:
        tc = TrainConfig(batch_size=B)
        dec_opt = make_optimizer(tc.decoder_lr, tc.grad_clip)
        enc_opt = make_optimizer(tc.encoder_lr, tc.grad_clip)
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, params), dec_opt, enc_opt
        )
        batch = {
            "images": jnp.asarray(
                rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8)
            ),
            "captions": jnp.asarray(rng.integers(1, V - 3, (B, 52), dtype=np.int32)),
            "caplens": jnp.asarray(rng.integers(8, 22, (B,), dtype=np.int32)),
            "valid": jnp.ones((B,), dtype=bool),
        }
        step = make_train_step(
            model, tc, wid, dec_opt, enc_opt,
            teacher_forcing=True, train_encoder=False,
        )
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.PRNGKey(0))
        jax.block_until_ready(m["loss"])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.reps):
            state, m = step(state, batch, jax.random.PRNGKey(i))
        float(m["loss"])
        sec = (time.perf_counter() - t0) / args.reps
        flops = train_step_flops(B, V)
        print(json.dumps({
            "batch": B,
            "sec_per_batch": round(sec, 4),
            "images_per_sec": round(B / sec, 1),
            "mfu": round(mfu(flops, sec) or 0, 4),
            "compile_s": round(compile_s, 1),
            "pallas": args.pallas, "dtype": args.dtype,
        }), flush=True)
        del state, step, batch


if __name__ == "__main__":
    main()
