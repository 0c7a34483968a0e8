"""Decode-step floor: decompose the per-token cost of the fused decode path.

VERDICT r4 #4: greedy eval sits at 22.7% bf16 MFU worst-case and the known
per-token cost is ~0.24 ms on a body whose HBM traffic is ~35-55 MB — either
harvest the gap or publish the measured floor with the encoder-floor rigor.
This instrument produces that decomposition at B=32 flagship shape:

  kernel_only     six-cell fused decode kernel + aliased cache insert, fixed
                  input token (no embed/vocab/argmax) — the Pallas share
  epilogue_only   embedding lookup + PE + vocab head + argmax feedback chain
                  (no kernel) — the XLA share
  full_step       the product's real rollout body (kernel + epilogue)
  full_bf16head   same, with the fc_out weight pre-cast to bf16 once per
                  rollout (halves the vocab-head HBM stream in f32 mode;
                  same one-time-rounded class as the kernel's six matrices)

All arms run T decode positions inside ONE jitted lax.scan with a carried
cache/token dependence, at two lengths; per-token cost is the difference
quotient (relay dispatch cancels — BENCHMARKING.md measurement hygiene).

Analytic HBM floor per token (printed): 6-layer weights + cross K/V reads +
cache read/insert + vocab head + logits write, at the v5e ~819 GB/s pin.

Usage: [BENCH_DTYPE=bfloat16] python scripts/bench_decode_floor.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[decode-floor] {msg}", file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_captioner.core.config import ModelConfig
    from tpu_captioner.infer.beam import _beam_compiler_options
    from tpu_captioner.models.layers import linear
    from tpu_captioner.ops.decode_step import (
        apply_cache_update,
        cast_weight_matrices,
        fused_decode_step,
        prepare_cross_memory,
        prepare_decode_weights,
    )
    from tpu_captioner.train.model import CaptionModel

    V, B = 9490, 32
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    model = CaptionModel(
        ModelConfig(decoder="transformer", vocab_size=V, compute_dtype=dtype)
    )
    params = jax.jit(lambda k: model.init_params(k, image_size=256))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    dec = model.decoder
    p = params["decoder"]
    c = model.cfg
    E, P, L, T = c.embed_dim, c.num_pixels, c.num_layers, 53

    rng = np.random.default_rng(0)
    enc_out = jnp.asarray(
        rng.normal(size=(B, c.encoded_image_size, c.encoded_image_size,
                         c.encoder_dim)).astype(np.float32)
    )
    mem = dec._project_memory(p, enc_out)  # (B, P, E)
    kw = prepare_decode_weights(p["layers"], E)
    mem_k, mem_v = prepare_cross_memory(p["layers"], mem, E)
    kdt = jnp.bfloat16
    kw = cast_weight_matrices(kw, kdt)
    mem_k, mem_v = mem_k.astype(kdt), mem_v.astype(kdt)
    wfc_bf16 = {"w": p["fc_out"]["w"].astype(jnp.bfloat16),
                "b": p["fc_out"]["b"]}
    opts = dict(_beam_compiler_options(model) or ()) or None

    x_fixed = jnp.asarray(rng.normal(size=(B, E)).astype(np.float32))
    toks0 = jnp.full((B,), V - 2, jnp.int32)
    ck0 = jnp.zeros((L, B, T, E), kdt)
    cv0 = jnp.zeros_like(ck0)

    def kernel_body(carry, pos):
        # x depends on the carried cache (row 0 of the previous insert) so
        # no step is foldable/elidable; the first run's fixed-x variant came
        # back 0.0 s/token — the chain below forces real execution.
        ck, cv, x = carry
        x_out, alpha, k_new, v_new = fused_decode_step(
            kw, x.astype(kdt), pos, ck, cv, mem_k, mem_v, c.num_heads,
        )
        ck, cv = apply_cache_update(ck, cv, k_new, v_new, pos)
        x = x_fixed + x_out * 1e-3
        return (ck, cv, x), jnp.sum(x_out[:, 0])

    def epilogue_body(toks, pos):
        x = dec._embed(p, toks[:, None], pos[None], None, True)[:, 0, :]
        logits = linear(p["fc_out"], x)
        return jnp.argmax(logits, -1).astype(jnp.int32), logits[0, 0]

    def full_body(carry, pos):
        ck, cv, toks = carry
        x = dec._embed(p, toks[:, None], pos[None], None, True)[:, 0, :]
        x_out, alpha, k_new, v_new = fused_decode_step(
            kw, x.astype(kdt), pos, ck, cv, mem_k, mem_v, c.num_heads,
        )
        ck, cv = apply_cache_update(ck, cv, k_new, v_new, pos)
        logits = linear(p["fc_out"], x_out.astype(mem.dtype))
        toks = jnp.argmax(logits, -1).astype(jnp.int32)
        return (ck, cv, toks), logits[0, 0]

    def full_bf16head_body(carry, pos):
        ck, cv, toks = carry
        x = dec._embed(p, toks[:, None], pos[None], None, True)[:, 0, :]
        x_out, alpha, k_new, v_new = fused_decode_step(
            kw, x.astype(kdt), pos, ck, cv, mem_k, mem_v, c.num_heads,
        )
        ck, cv = apply_cache_update(ck, cv, k_new, v_new, pos)
        logits = linear(wfc_bf16, x_out.astype(jnp.bfloat16)).astype(jnp.float32)
        toks = jnp.argmax(logits, -1).astype(jnp.int32)
        return (ck, cv, toks), logits[0, 0]

    arms = {
        "kernel_only": (kernel_body, lambda: (ck0, cv0, x_fixed)),
        "epilogue_only": (epilogue_body, lambda: toks0),
        "full_step": (full_body, lambda: (ck0, cv0, toks0)),
        "full_bf16head": (full_bf16head_body, lambda: (ck0, cv0, toks0)),
    }

    T1, T2, REPS = 11, 51, 5
    only = os.environ.get("BENCH_ONLY", "")
    for name, (body, init) in arms.items():
        if only and only not in name:
            continue
        progs = {}
        for n in (T1, T2):
            f = jax.jit(
                lambda init_c, n=n, body=body: jax.lax.scan(
                    body, init_c, jnp.arange(n, dtype=jnp.int32)
                )[1].sum(),
                compiler_options=opts,
            )
            t0 = time.perf_counter()
            jax.block_until_ready(f(init()))
            log(f"{name}[{n}] compile+first {time.perf_counter() - t0:.1f}s")
            progs[n] = f
        best = {}
        for n, f in progs.items():
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                jax.block_until_ready(f(init()))
                ts.append(time.perf_counter() - t0)
            best[n] = min(ts)
        per_tok = (best[T2] - best[T1]) / (T2 - T1)
        print(json.dumps({
            "metric": f"decode_{name}",
            "us_per_token": round(per_tok * 1e6, 1),
            "batch": B, "dtype": dtype,
            "t11_s": round(best[T1], 4), "t51_s": round(best[T2], 4),
        }), flush=True)

    # Analytic HBM floor per token (B=32 rows amortize weight streams).
    bpe = {"float32": 4, "bfloat16": 2}
    # per layer: qkv 3E^2, self-out E^2, cross-q E^2, cross-out E^2,
    # mlp E*FFN + FFN*E with FFN == E at flagship (reference dim_ff=512);
    # cross K/V projections are folded into mem_k/mem_v (not streamed).
    layer_w = L * 8 * E * E
    kernel_w_bytes = layer_w * 2  # bf16 streams
    cross_kv = 2 * L * B * P * E * 2
    cache_rw = 2 * L * B * T * E * 2 + 2 * L * B * E * 2  # full read + 1-row insert
    head_bytes = E * V * bpe[dtype]
    total = kernel_w_bytes + cross_kv + cache_rw + head_bytes
    print(json.dumps({
        "metric": "decode_hbm_floor",
        "weights_mb": round(kernel_w_bytes / 1e6, 1),
        "cross_kv_mb": round(cross_kv / 1e6, 1),
        "cache_rw_mb": round(cache_rw / 1e6, 1),
        "vocab_head_mb": round(head_bytes / 1e6, 1),
        "total_mb": round(total / 1e6, 1),
        "us_at_819GBps": round(total / 819e9 * 1e6, 1),
        "dtype": dtype,
    }), flush=True)


if __name__ == "__main__":
    main()
