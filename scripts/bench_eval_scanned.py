"""Dispatch-overhead-free greedy-eval A/B: scanned difference quotient.

Same instrument as bench_full.py's eval section (K scanned calls at two
lengths; the quotient cancels relay dispatch overhead), parameterized by
decoder family and decode-kernel mode so per-family kernel defaults can be
decided from on-chip data (the LSTM beam A/B showed the XLA loop BEATING
the fused step kernel 921.7 vs 817.1 caps/s — artifacts/r04_queue/).

Usage: python scripts/bench_eval_scanned.py --decoder lstm --kernel off
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[eval-scanned] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--kernel", default="auto")  # decode_kernel config
    ap.add_argument("--decoder", default="lstm")
    # Encoder MLP-tail kernel: 'auto' resolves per train/model.py policy
    # (transformer decoders only); 'on' forces it for LSTM A/Bs.
    ap.add_argument("--encoder-kernel", default="auto")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tpu_captioner.core.config import ModelConfig, TrainConfig
    from tpu_captioner.eval.benchlib import scanned_quotient
    from tpu_captioner.infer.beam import _beam_compiler_options
    from tpu_captioner.train.model import CaptionModel
    from tpu_captioner.train.steps import rollout_loss

    V, B = 9490, args.batch
    K1, K2 = 3, 9
    model = CaptionModel(ModelConfig(
        decoder=args.decoder, vocab_size=V, compute_dtype=args.dtype,
        decode_kernel=args.kernel, use_pallas=args.encoder_kernel,
    ))
    params = jax.jit(lambda k: model.init_params(k, image_size=256))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    tc = TrainConfig(batch_size=B)
    wid = {"<pad>": 0, "<unk>": V - 3, "<start>": V - 2, "<end>": V - 1}

    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8))
    mk = jax.jit(
        lambda x: x[None] + jnp.arange(1, K2 + 1, dtype=jnp.uint8)[
            :, None, None, None, None
        ]
    )
    imgs_k2 = mk(base)
    jax.block_until_ready(imgs_k2)

    batch = {
        "captions": jnp.asarray(rng.integers(1, V - 3, (B, 52), dtype=np.int32)),
        "caplens": jnp.asarray(rng.integers(8, 22, (B,), dtype=np.int32)),
        "valid": jnp.ones((B,), dtype=bool),
        "all_captions": jnp.zeros((B, 5, 52), jnp.int32),
    }

    def eval_scalar(p, im):
        _, aux = rollout_loss(
            model, p, dict(batch, images=im), wid, tc.alpha_c,
            tc.max_decode_len, rng=None, deterministic=True,
        )
        return aux["loss"] + aux["top5_correct"]

    opts = dict(_beam_compiler_options(model) or ()) or None
    sec, k1_s, k2_s = scanned_quotient(
        eval_scalar, params, imgs_k2, k1=K1, k2=K2, opts=opts,
        log=log, name=f"eval-{args.decoder}-{args.kernel}",
    )
    print(json.dumps({
        "metric": "greedy_eval_scanned",
        "sec_per_batch": round(sec, 5),
        "batch": B,
        "dtype": args.dtype,
        "kernel": args.kernel,
        "encoder_kernel": args.encoder_kernel,
        "decoder": args.decoder,
        "k1_s": round(k1_s, 4),
        "k2_s": round(k2_s, 4),
    }))


if __name__ == "__main__":
    main()
