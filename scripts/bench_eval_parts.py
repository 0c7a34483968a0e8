"""Decompose the greedy-eval step: encoder vs decode vs loss, and measure
eval-step variants (XLA vs fused decode kernel, XLA vs Pallas-MLP encoder).

Context: BENCH_FULL greedy_rollout_eval = 49.5 ms/batch32 (f32), while the
isolated decode-only rollout is 18.3 ms (scripts/bench_decode_kernel.py) —
the remainder is the encoder forward + vocab-head/loss work.  This script
locates it and checks which combination is fastest end to end.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[eval-parts] {msg}", file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from tpu_captioner.core.config import ModelConfig, TrainConfig
    from tpu_captioner.train.model import CaptionModel
    from tpu_captioner.train.steps import make_eval_step

    V, B = 9490, 32
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    base_cfg = ModelConfig(decoder="transformer", vocab_size=V,
                           compute_dtype=dtype, use_pallas="off",
                           decode_kernel="off")
    model = CaptionModel(base_cfg)
    params = jax.jit(lambda k: model.init_params(k, image_size=256))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    tc = TrainConfig(batch_size=B)
    wid = {"<pad>": 0, "<unk>": V - 3, "<start>": V - 2, "<end>": V - 1}
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8)),
        "captions": jnp.asarray(rng.integers(1, V - 3, (B, 52), dtype=np.int32)),
        "caplens": jnp.asarray(rng.integers(8, 22, (B,), dtype=np.int32)),
        "valid": jnp.ones((B,), dtype=bool),
        "all_captions": jnp.zeros((B, 5, 52), jnp.int32),
    }

    # Distinct image batches per rep + a scalar fetch at the end (identical
    # repeated dispatches / bare block_until_ready are unreliable through
    # the relay — see BENCHMARKING.md measurement hygiene).  Derived
    # ON-DEVICE: host->device transfers are lazy over the relay tunnel and
    # would otherwise pollute the timed loop (~5 s/6 MB batch measured).
    reps = 10
    vary = jax.jit(lambda x, s: x + s)
    image_list = [vary(batch["images"], np.uint8(i)) for i in range(reps)]
    jax.block_until_ready(image_list)
    for a in image_list:
        float(a.ravel()[0].astype(jnp.float32))  # force materialization

    def bench(name, f, make_args):
        t0 = time.perf_counter()
        out = f(*make_args(0))
        jax.block_until_ready(out)
        log(f"{name} compile+first: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for i in range(reps):
            out = f(*make_args(i))
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.ravel()[0])
        sec = (time.perf_counter() - t0) / reps
        print(json.dumps({"metric": name, "sec_per_batch32": round(sec, 5)}),
              flush=True)
        return sec

    # 1) encoder forward alone, XLA vs Pallas-MLP.
    enc_xla = jax.jit(lambda p, im: model.encode(p, im, deterministic=True))
    bench("encoder_fwd_xla", enc_xla, lambda i: (params, image_list[i]))
    model_pl = CaptionModel(dataclasses.replace(base_cfg, use_pallas="on"))
    enc_pl = jax.jit(lambda p, im: model_pl.encode(p, im, deterministic=True))
    bench("encoder_fwd_pallas_mlp", enc_pl, lambda i: (params, image_list[i]))

    # 2) full eval step variants.
    variants = [
        ("eval_xla_enc_xla_decode", "off", "off"),
        ("eval_xla_enc_fused_decode", "off", "step"),
        ("eval_pallas_enc_fused_decode", "on", "step"),
        ("eval_xla_enc_mega_decode", "off", "mega"),
    ]
    for name, enc_mode, dec_mode in variants:
        m = CaptionModel(dataclasses.replace(
            base_cfg, use_pallas=enc_mode, decode_kernel=dec_mode
        ))
        step = make_eval_step(m, tc, wid)
        bench(name, step, lambda i: (params, dict(batch, images=image_list[i])))


if __name__ == "__main__":
    main()
