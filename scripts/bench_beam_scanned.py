"""Dispatch-overhead-free beam-5 throughput: scanned difference quotient.

The per-dispatch beam bench (scripts/bench_beam.py) inherits whatever
per-dispatch overhead the relay has on a given day (measured drifting from
~20 ms to ~100 ms within one session — BENCHMARKING.md measurement
hygiene).  Here the whole batched beam search (`_beam_search_batch_impl`:
one encoder pass + the beam while_loop) runs K times inside ONE jitted
``lax.scan`` over K distinct image batches, at two scan lengths; the
difference quotient cancels dispatch overhead and program prologue.

Usage: python scripts/bench_beam_scanned.py [--batch 32] [--beam 5]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[beam-scanned] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--kernel", default="auto")  # decode_kernel config
    ap.add_argument("--decoder", default="transformer")  # or 'lstm'
    ap.add_argument("--encoder-kernel", default="auto")  # use_pallas config
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tpu_captioner.core.config import ModelConfig
    from tpu_captioner.infer.beam import (
        _beam_compiler_options,
        _beam_search_batch_impl,
    )
    from tpu_captioner.train.model import CaptionModel

    V, B = 9490, args.batch
    K1, K2 = 2, 7
    model = CaptionModel(ModelConfig(
        decoder=args.decoder, vocab_size=V, compute_dtype=args.dtype,
        decode_kernel=args.kernel, use_pallas=args.encoder_kernel,
    ))
    params = jax.jit(lambda k: model.init_params(k, image_size=256))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8))
    mk = jax.jit(
        lambda x: x[None] + jnp.arange(1, K2 + 1, dtype=jnp.uint8)[
            :, None, None, None, None
        ]
    )
    imgs = mk(base)
    jax.block_until_ready(imgs)
    float(imgs.ravel()[0].astype(jnp.float32))

    from tpu_captioner.eval.benchlib import scanned_quotient

    opts = _beam_compiler_options(model)

    def beam_scalar(p, im):
        res = _beam_search_batch_impl(
            model, p, im, beam_size=args.beam, max_steps=args.steps,
            start_id=V - 2, end_id=V - 1,
        )
        return jnp.sum(res.score)

    sec, t1, t2 = scanned_quotient(
        beam_scalar, params, imgs, k1=K1, k2=K2,
        opts=dict(opts) if opts else None, log=log, name="beam",
    )
    print(json.dumps({
        "metric": "beam5_captions_per_sec_scanned",
        "value": round(B / sec, 2),
        "sec_per_batch": round(sec, 5),
        "batch": B, "beam": args.beam, "dtype": args.dtype,
        "kernel": args.kernel, "encoder_kernel": args.encoder_kernel,
        "decoder": args.decoder,
        "k1_s": round(t1, 4), "k2_s": round(t2, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
