"""Early-exit eval rollout on the real chip (core/loops.py).

Times the flagship greedy-eval program (scanned difference quotient,
bench_full methodology) in two regimes:

- random init, random images: no row ever emits <end> -> all 51 decode
  steps run; measures the while_loop's overhead vs the old fixed scan
  (the committed greedy_rollout_eval row);
- vocab head biased toward <end> by ``--end-bias-step k``: every row
  finishes at step k -> the loop exits after k+1 steps; measures what
  real captions (mean length ~12) get back from the early exit.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[early-exit] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--decoder", default="transformer")
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

    V, B = 9490, 32
    K1, K2 = 3, 13
    tc = TrainConfig(batch_size=B)
    wid = {"<pad>": 0, "<unk>": V - 3, "<start>": V - 2, "<end>": V - 1}
    model = CaptionModel(ModelConfig(
        decoder=args.decoder, vocab_size=V, compute_dtype=args.dtype,
    ))
    params = jax.jit(lambda k: model.init_params(k, image_size=256))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8))
    imgs = jax.jit(
        lambda x: x[None] + jnp.arange(1, K2 + 1, dtype=jnp.uint8)[
            :, None, None, None, None
        ]
    )(base)
    batch = {
        "captions": jnp.asarray(rng.integers(1, V - 3, (B, 52), np.int32)),
        "caplens": jnp.asarray(rng.integers(8, 22, (B,), np.int32)),
        "valid": jnp.ones((B,), bool),
        "all_captions": jnp.zeros((B, 5, 52), jnp.int32),
    }
    jax.block_until_ready(imgs)
    opts = dict(_beam_compiler_options(model) or ()) or None

    def eval_scalar(p, im):
        _, aux = rollout_loss(
            model, p, dict(batch, images=im), wid, tc.alpha_c,
            tc.max_decode_len, rng=None, deterministic=True,
        )
        return aux["loss"] + aux["top5_correct"]

    def run(name, p):
        sec, t1, t2 = scanned_quotient(
            eval_scalar, p, imgs, k1=K1, k2=K2, opts=opts,
            log=log, name=name, reps=3,
        )
        print(json.dumps({
            "metric": name, "sec_per_batch32": round(sec, 5),
            "dtype": args.dtype, "decoder": args.decoder,
        }), flush=True)

    run("eval_never_finishes", params)

    # Bias the vocab head so argmax == <end> from step 0: every row
    # finishes immediately and the loop exits after one step.
    head = "fc_out" if args.decoder.startswith("transformer") else "fc"
    biased = dict(params)
    dec = dict(biased["decoder"])
    lay = dict(dec[head])
    lay["b"] = lay["b"].at[wid["<end>"]].add(100.0)
    dec[head] = lay
    biased = {"encoder": params["encoder"], "decoder": dec}
    jax.block_until_ready(biased)
    run("eval_all_finish_step0", biased)


if __name__ == "__main__":
    main()
