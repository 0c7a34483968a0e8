"""A/B: depthwise 7x7 filter-gradient, XLA 49-tap reduction vs the
round-5 Pallas batch-grid-accumulating kernel (ops/dwconv.py:_dw_grad_pallas),
at the fine-tune trainable shapes (batch 32, starting_layer=5).

Also times the full dw VJP (dx via flipped Pallas conv + dw) both ways, so
the in-situ saving for the fine-tune step can be predicted before rewiring.

Usage: BENCH_DTYPE=float32|bfloat16 python scripts/bench_dw_bwd.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[dw-bwd] {msg}", file=sys.stderr, flush=True)


B, K1, K2, REPS = 32, 3, 13, 5
SHAPES = [(16, 512, 27), (8, 1024, 3)]  # (hw, c, depth)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_captioner.eval.benchlib import scanned_quotient
    from tpu_captioner.ops import dwconv

    dtype = jnp.bfloat16 if os.environ.get(
        "BENCH_DTYPE") == "bfloat16" else jnp.float32

    def bench(name, fn, params, xs):
        sec, _, _ = scanned_quotient(
            fn, params, xs, k1=K1, k2=K2, log=log, name=name, reps=REPS)
        print(json.dumps({"metric": name, "sec": round(sec, 6)}), flush=True)
        return sec

    key = jax.random.PRNGKey(0)
    totals = {}
    for hw, c, depth in SHAPES:
        tag = f"{hw}x{hw}x{c}"
        mkg = jax.jit(lambda k, hw=hw, c=c: jax.random.normal(
            k, (K2, B, hw, hw, c), jnp.float32).astype(dtype) * 0.1)
        gs = mkg(key)
        mkp = jax.jit(lambda k, hw=hw, c=c: {
            "x": (jax.random.normal(k, (B, hw, hw, c), jnp.float32) * 0.1
                  ).astype(dtype),
            "w": jax.random.normal(
                jax.random.fold_in(k, 1), (7, 7, c), jnp.float32) * 0.01,
        })
        p = mkp(key)
        jax.block_until_ready((gs, p))

        base = bench(f"sumg_{tag}", lambda p, gi: jnp.sum(gi), p, gs)
        res = {}
        res["dwgrad_xla"] = bench(
            f"dwgrad_xla_{tag}",
            lambda p, gi: jnp.sum(dwconv._dw_grad_xla(p["x"], gi)), p, gs,
        ) - base
        res["dwgrad_pallas"] = bench(
            f"dwgrad_pallas_{tag}",
            lambda p, gi: jnp.sum(dwconv._dw_grad_pallas(p["x"], gi)), p, gs,
        ) - base

        def full_vjp(p, gi, pallas_dw):
            # dx rides the shipping path: XLA grouped conv (the block's
            # forward kernel choice — convnext.py:152).
            # The block casts its f32 filter to the compute dtype before
            # the conv (convnext.py block forward) — mirror that here.
            dx = dwconv.depthwise_conv7x7_nhwc(
                gi, p["w"][::-1, ::-1, :].astype(gi.dtype), False)
            grad = (dwconv._dw_grad_pallas if pallas_dw
                    else dwconv._dw_grad_xla)
            return jnp.sum(dx.astype(jnp.float32)) + jnp.sum(
                grad(p["x"], gi))

        res["vjp_xla_dw"] = bench(
            f"vjp_xladw_{tag}",
            lambda p, gi: full_vjp(p, gi, False), p, gs) - base
        res["vjp_pallas_dw"] = bench(
            f"vjp_pallasdw_{tag}",
            lambda p, gi: full_vjp(p, gi, True), p, gs) - base

        print(json.dumps({
            "stage": tag, "depth": depth, "dtype": str(dtype.__name__),
            **{k: round(v * 1e6, 1) for k, v in res.items()},
            "saving_us_per_block": round(
                (res["vjp_xla_dw"] - res["vjp_pallas_dw"]) * 1e6, 1),
        }), flush=True)
        for k, v in res.items():
            totals[k] = totals.get(k, 0.0) + depth * v * 1e3

    print(json.dumps({
        "totals_x_depth_ms": {k: round(v, 3) for k, v in totals.items()},
        "predicted_step_saving_ms": round(
            totals["vjp_xla_dw"] - totals["vjp_pallas_dw"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
