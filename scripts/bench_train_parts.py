"""Decompose the frozen TF train step: encoder fwd vs decoder TF fwd/bwd
vs vocab head, measured dispatch-overhead-free.

Same methodology as scripts/bench_eval_parts.py (BENCHMARKING.md
"Measurement hygiene"): every number comes from an in-program ``lax.scan``
over k distinct on-device batches at two scan lengths; the per-batch time
is the difference quotient, cancelling dispatch overhead and prologues.

Variants (BENCH_ONLY = comma-separated exact names; empty = all):
  tf_frozen_grad_{off,mlp,block} — grad of the full frozen TF loss w.r.t.
      decoder params, per encoder kernel mode (the train step minus the
      optimizer update, which is negligible);
  tf_decoder_grad      — same grad with the encoder output precomputed:
      the decoder-side fwd+bwd+vocab-head+loss cost alone;
  tf_decoder_fwd       — decoder TF loss without grad (fwd share);
  tf_decoder_grad_v1k  — decoder grad with vocab 9490 -> 1024 (vocab-head
      + embedding-grad share).
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[train-parts] {msg}", file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tpu_captioner.core.config import ModelConfig
    from tpu_captioner.train.model import CaptionModel
    from tpu_captioner.train.steps import tf_loss

    V, B = 9490, 32
    K1, K2 = 3, 13
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    base_cfg = ModelConfig(decoder="transformer", vocab_size=V,
                           compute_dtype=dtype, use_pallas="off")
    model = CaptionModel(base_cfg)
    params = jax.jit(lambda k: model.init_params(k, image_size=256))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    base_images = jnp.asarray(
        rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8)
    )
    captions = jnp.asarray(rng.integers(1, V - 3, (B, 52), dtype=np.int32))
    caplens = jnp.asarray(rng.integers(8, 22, (B,), dtype=np.int32))
    valid = jnp.ones((B,), bool)
    mk = jax.jit(
        lambda x: x[None] + jnp.arange(1, K2 + 1, dtype=jnp.uint8)[
            :, None, None, None, None
        ]
    )
    imgs_k2 = mk(base_images)  # (K2, B, 256, 256, 3)
    jax.block_until_ready(imgs_k2)
    float(imgs_k2.ravel()[0].astype(jnp.float32))

    def gsum(tree):
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x), tree, jnp.float32(0)
        )

    from tpu_captioner.eval.benchlib import scanned_quotient

    def bench_scanned(name, scalar_fn, xs, opts=None):
        """scalar_fn: (params, x) -> f32 scalar, scanned over xs[:k]."""
        sec, t1, t2 = scanned_quotient(
            scalar_fn, params, xs, k1=K1, k2=K2, opts=opts,
            log=log, name=name,
        )
        print(json.dumps({
            "metric": name,
            "sec_per_batch32": round(sec, 5),
            "k1_s": round(t1, 4), "k2_s": round(t2, 4),
        }), flush=True)
        return sec

    # Comma-separated EXACT metric names (substring matching made
    # tf_decoder_grad also select tf_decoder_grad_v1k); empty = all.
    only = os.environ.get("BENCH_ONLY", "")
    names = [s for s in only.split(",") if s]

    def want(name):
        return not names or name in names

    # 1) Full frozen-step grad (sans optimizer) per encoder kernel mode.
    for mode in ("off", "on", "block"):
        name = f"tf_frozen_grad_{'mlp' if mode == 'on' else mode}"
        if not want(name):
            continue
        m = CaptionModel(dataclasses.replace(base_cfg, use_pallas=mode))

        def full_grad(p, im, m=m):
            def dec_loss(dec_params):
                pp = {"encoder": jax.lax.stop_gradient(p["encoder"]),
                      "decoder": dec_params}
                batch = {"images": im, "captions": captions,
                         "caplens": caplens, "valid": valid}
                return tf_loss(m, pp, batch, 1.0, None, True)[0]

            return gsum(jax.grad(dec_loss)(p["decoder"]))

        bench_scanned(name, full_grad, imgs_k2)

    # 1b) Same fused-encoder grad WITH train-mode dropout (rng threaded),
    # per mask source: the delta vs tf_frozen_grad_mlp is the dropout cost
    # (mask generation + apply + its backward) the deterministic variants
    # exclude, and pool-vs-threefry is the ops/dropout_mask.py win.
    for masks in ("pool", "threefry"):
        name = f"tf_frozen_grad_mlp_dropout_{masks}"
        if not want(name):
            continue
        m_drop = CaptionModel(dataclasses.replace(
            base_cfg, use_pallas="on", dropout_masks=masks,
        ))
        key0 = jax.random.PRNGKey(7)

        def full_grad_dropout(p, im, m_drop=m_drop):
            def dec_loss(dec_params):
                pp = {"encoder": jax.lax.stop_gradient(p["encoder"]),
                      "decoder": dec_params}
                batch = {"images": im, "captions": captions,
                         "caplens": caplens, "valid": valid}
                # Per-iteration key folded from on-device image data so the
                # scan iterations stay distinct without host dispatches.
                key = jax.random.fold_in(key0, im[0, 0, 0, 0].astype(jnp.int32))
                return tf_loss(m_drop, pp, batch, 1.0, key, False)[0]

            return gsum(jax.grad(dec_loss)(p["decoder"]))

        bench_scanned(name, full_grad_dropout, imgs_k2)

    # 2) Decoder-only variants on a precomputed encoder output.
    enc0 = jax.jit(
        lambda p, im: model.encode(p, im, deterministic=True)
    )(params, base_images)
    mk_enc = jax.jit(
        lambda e: e[None] + jnp.arange(1, K2 + 1, dtype=e.dtype)[
            :, None, None, None, None
        ] * 1e-3
    )
    encs_k2 = mk_enc(enc0)
    jax.block_until_ready(encs_k2)
    float(encs_k2.ravel()[0])

    def dec_tf_loss(m, p, enc_out):
        logits, _ = m.tf_forward(p, enc_out, captions, rng=None,
                                 deterministic=True)
        from tpu_captioner.eval.metrics import masked_cross_entropy

        T = logits.shape[1]
        tmask = (jnp.arange(T)[None, :] < (caplens - 1)[:, None]) \
            & valid[:, None]
        ce_sum, tokens = masked_cross_entropy(
            logits, captions[:, 1:].astype(jnp.int32), tmask
        )
        return ce_sum / jnp.maximum(tokens, 1.0)

    if want("tf_decoder_grad"):
        bench_scanned(
            "tf_decoder_grad",
            lambda p, e: gsum(jax.grad(
                lambda d: dec_tf_loss(model, {"encoder": p["encoder"],
                                              "decoder": d}, e)
            )(p["decoder"])),
            encs_k2,
        )
    if want("tf_decoder_fwd"):
        bench_scanned(
            "tf_decoder_fwd",
            lambda p, e: dec_tf_loss(model, p, e),
            encs_k2,
        )
    if want("tf_decoder_grad_v1k"):
        v1k_model = CaptionModel(dataclasses.replace(base_cfg, vocab_size=1024))
        v1k_params = jax.jit(
            lambda k: v1k_model.init_params(k, image_size=256)
        )(jax.random.PRNGKey(0))
        jax.block_until_ready(v1k_params)
        caps1k = jnp.clip(captions, 0, 1021)

        def v1k_loss(m, p, enc_out):
            logits, _ = m.tf_forward(p, enc_out, caps1k, rng=None,
                                     deterministic=True)
            from tpu_captioner.eval.metrics import masked_cross_entropy

            T = logits.shape[1]
            tmask = (jnp.arange(T)[None, :] < (caplens - 1)[:, None]) \
                & valid[:, None]
            ce_sum, tokens = masked_cross_entropy(
                logits, caps1k[:, 1:].astype(jnp.int32), tmask
            )
            return ce_sum / jnp.maximum(tokens, 1.0)

        def v1k_grad(_p, e):
            return gsum(jax.grad(
                lambda d: v1k_loss(v1k_model,
                                   {"encoder": v1k_params["encoder"],
                                    "decoder": d}, e)
            )(v1k_params["decoder"]))

        bench_scanned("tf_decoder_grad_v1k", v1k_grad, encs_k2)


if __name__ == "__main__":
    main()
