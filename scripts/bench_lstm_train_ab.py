"""A/B the LSTM+attention TF train step with/without the fused encoder
MLP-tail kernel.

The 'auto' kernel policy (train/model.py:resolve) enables the fused
encoder ONLY for transformer-decoder models — a round-2 decision made
when scan-heavy programs were believed to lose with Pallas, later shown
to be a relay measurement artifact for eval (BENCHMARKING.md round 3).
The LSTM TF train step never got the re-measurement: its encoder forward
is the same frozen ConvNeXt pass the transformer step runs 18.3 ms fused
vs 28.9 ms XLA.  This script measures the full LSTM train step both ways
so the per-family policy is data, not belief.

Usage: python scripts/bench_lstm_train_ab.py [--dtype bfloat16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[lstm-train-ab] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--decoder", default="lstm")
    ap.add_argument("--modes", default="auto,on")  # use_pallas values
    # Dispatch-free instrument: the whole step (grad + optimizer) scanned
    # over K distinct image batches at two lengths, difference quotient.
    # The Python-loop instrument is kept for comparability with bench_full,
    # but the relay's per-dispatch overhead DRIFTS (measured 32.6 ->
    # 118.8 ms on the same cached program within 40 min on 2026-08-18).
    ap.add_argument("--scanned", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tpu_captioner.core.config import ModelConfig, TrainConfig
    from tpu_captioner.core.prng import root_key, step_key
    from tpu_captioner.eval.flops import mfu, train_step_flops
    from tpu_captioner.train.model import CaptionModel
    from tpu_captioner.train.state import TrainState, make_optimizer
    from tpu_captioner.train.steps import make_train_step

    V, B = 9490, args.batch
    rkey = root_key(42)
    step_keys = [step_key(rkey, "dropout", 0, i) for i in range(21)]
    jax.block_until_ready(step_keys)

    tc = TrainConfig(batch_size=B)
    dec_opt = make_optimizer(tc.decoder_lr, tc.grad_clip)
    enc_opt = make_optimizer(tc.encoder_lr, tc.grad_clip)
    wid = {"<pad>": 0, "<unk>": V - 3, "<start>": V - 2, "<end>": V - 1}

    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8)),
        "captions": jnp.asarray(rng.integers(1, V - 3, (B, 52), dtype=np.int32)),
        "caplens": jnp.asarray(rng.integers(8, 22, (B,), dtype=np.int32)),
        "valid": jnp.ones((B,), dtype=bool),
    }
    flops = train_step_flops(B, V, decoder=args.decoder)

    for use_pallas in args.modes.split(","):
        model = CaptionModel(ModelConfig(
            decoder=args.decoder, vocab_size=V, compute_dtype=args.dtype,
            use_pallas=use_pallas,
        ))
        params = jax.jit(lambda k: model.init_params(k, image_size=256))(
            jax.random.PRNGKey(0)
        )
        state = TrainState.create(params, dec_opt, enc_opt)
        step = make_train_step(
            model, tc, wid, dec_opt, enc_opt,
            teacher_forcing=True, train_encoder=False,
        )
        if args.scanned:
            K1, K2 = 3, 9
            mk = jax.jit(
                lambda x: x[None] + jnp.arange(1, K2 + 1, dtype=jnp.uint8)[
                    :, None, None, None, None
                ]
            )
            imgs_k2 = mk(batch["images"])
            keys_k2 = jnp.stack(step_keys[:K2])
            jax.block_until_ready((imgs_k2, keys_k2))

            def run(k):
                def body(st, xs):
                    im, key = xs
                    st, m = step(st, dict(batch, images=im), key)
                    return st, m["loss"]

                def scanned(st, imgs, keys):
                    st, losses = jax.lax.scan(
                        body, st, (imgs[:k], keys[:k])
                    )
                    return jnp.sum(losses)

                return jax.jit(scanned)

            f1, f2 = run(K1), run(K2)
            t0 = time.perf_counter()
            float(f1(state, imgs_k2, keys_k2))
            float(f2(state, imgs_k2, keys_k2))
            log(f"use_pallas={use_pallas} scanned compile+first: "
                f"{time.perf_counter() - t0:.1f}s")
            t1 = time.perf_counter()
            float(f1(state, imgs_k2, keys_k2))
            t1 = time.perf_counter() - t1
            t2 = time.perf_counter()
            float(f2(state, imgs_k2, keys_k2))
            t2 = time.perf_counter() - t2
            sec = (t2 - t1) / (K2 - K1)
        else:
            t0 = time.perf_counter()
            state, m = step(state, batch, step_keys[20])
            jax.block_until_ready(m["loss"])
            log(f"use_pallas={use_pallas} compile+first: "
                f"{time.perf_counter() - t0:.1f}s")
            n = 20
            t0 = time.perf_counter()
            for i in range(n):
                state, m = step(state, batch, step_keys[i])
            float(m["loss"])
            sec = (time.perf_counter() - t0) / n
        print(json.dumps({
            "metric": f"tf_train_{args.decoder}",
            "sec_per_batch": round(sec, 5),
            "use_pallas": use_pallas,
            "dtype": args.dtype,
            "scanned": bool(args.scanned),
            "mfu": round(mfu(flops, sec), 4),
        }), flush=True)
        del state, params, model, step


if __name__ == "__main__":
    main()
