"""Decompose the greedy-eval step: encoder vs decode vs loss, measured
dispatch-overhead-free.

Relay measurement hygiene (BENCHMARKING.md): per-dispatch overhead through
the axon relay is ~20 ms and run-to-run variance of per-call loops is large,
so every number here comes from an IN-PROGRAM ``lax.scan`` over k distinct
batches — one dispatch per measurement — at two scan lengths, and the
per-batch time is the difference quotient (k2 - k1 executions), which
cancels both the dispatch overhead and any fixed program prologue.
"""

import json
import os
import sys

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
    from tpu_captioner.train.steps import rollout_loss

    V, B = 9490, 32
    K1, K2 = 3, 13
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
    base_images = jnp.asarray(
        rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8)
    )
    captions = jnp.asarray(rng.integers(1, V - 3, (B, 52), dtype=np.int32))
    caplens = jnp.asarray(rng.integers(8, 22, (B,), dtype=np.int32))
    valid = jnp.ones((B,), bool)
    # Distinct per-iteration image batches, derived on-device (host->device
    # transfers are lazy over the relay and must not pollute timing).
    mk = jax.jit(
        lambda x: x[None] + jnp.arange(1, K2 + 1, dtype=jnp.uint8)[
            :, None, None, None, None
        ]
    )
    imgs_k2 = mk(base_images)  # (K2, B, 256, 256, 3)
    jax.block_until_ready(imgs_k2)
    float(imgs_k2.ravel()[0].astype(jnp.float32))

    from tpu_captioner.eval.benchlib import scanned_quotient

    def bench_scanned(name, scalar_fn, opts=None):
        """scalar_fn: (params, images) -> f32 scalar.  Prints ms/batch."""
        sec, t1, t2 = scanned_quotient(
            scalar_fn, params, imgs_k2, k1=K1, k2=K2, opts=opts,
            log=log, name=name,
        )
        print(json.dumps({
            "metric": name,
            "sec_per_batch32": round(sec, 5),
            "k1_s": round(t1, 4), "k2_s": round(t2, 4),
        }), flush=True)
        return sec

    only = os.environ.get("BENCH_ONLY", "")

    def want(name):
        return only in name

    # 1) encoder forward alone, XLA vs Pallas-MLP vs fused-block.
    if want("encoder_fwd_xla"):
        bench_scanned(
            "encoder_fwd_xla",
            lambda p, im: jnp.sum(model.encode(p, im, deterministic=True)),
        )
    for mode in ("on", "block"):
        if not want(f"encoder_fwd_pallas_{mode}"):
            continue
        m_enc = CaptionModel(dataclasses.replace(base_cfg, use_pallas=mode))
        bench_scanned(
            f"encoder_fwd_pallas_{mode}",
            lambda p, im, m_enc=m_enc: jnp.sum(
                m_enc.encode(p, im, deterministic=True)
            ),
        )

    # 2) full eval-step variants (rollout_loss == make_eval_step's body).
    kern_opts = {"xla_tpu_scoped_vmem_limit_kib": int(
        os.environ.get("TPU_CAPTIONER_DECODE_VMEM_KIB", 102400))}
    variants = [
        ("eval_xla_enc_xla_decode", "off", "off", None),
        ("eval_xla_enc_fused_decode", "off", "step", kern_opts),
        ("eval_pallas_enc_fused_decode", "on", "step", kern_opts),
        ("eval_xla_enc_mega_decode", "off", "mega", kern_opts),
        ("eval_pallas_enc_mega_decode", "on", "mega", kern_opts),
    ]
    for name, enc_mode, dec_mode, opts in variants:
        if not want(name):
            continue
        m = CaptionModel(dataclasses.replace(
            base_cfg, use_pallas=enc_mode, decode_kernel=dec_mode
        ))

        def eval_scalar(p, im, m=m):
            batch = {"images": im, "captions": captions, "caplens": caplens,
                     "valid": valid}
            _, aux = rollout_loss(
                m, p, batch, wid, tc.alpha_c, tc.max_decode_len,
                rng=None, deterministic=True,
            )
            return aux["loss"] + aux["top5_correct"]

        try:
            bench_scanned(name, eval_scalar, opts)
        except Exception as e:  # keep sweeping if one variant fails
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
