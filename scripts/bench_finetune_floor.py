"""Component-cost floor for the FINE-TUNE step's encoder backward
(VERDICT r4 #3: "profile the Pallas backward the way the forward was").

The fine-tune step (train_encoder=True, starting_layer=5 — reference
`/root/reference/train.py:161-165`) adds to the frozen step exactly:
the backward (+ remat recompute) of the trainable encoder children —
stage 3 (27 blocks @ 16x16x512), the 8x8 downsample, stage 4
(3 blocks @ 8x8x1024) — plus the encoder optimizer update.  This script
measures each of those pieces IN ISOLATION at the real shapes (batch 32)
with the scanned-difference-quotient + min-over-reps + sum-baseline
methodology of scripts/bench_encoder_floor.py, so the measured
fine-tune-minus-frozen delta (bench_finetune_ab.py) can be compared
against its own component sum and each component against its engine/HBM
floor.

Arms per trainable block shape:
  fwd_mlp      fused ConvNeXt MLP tail forward (shipping kernel policy:
               Pallas stages 1-3, XLA stage 4 — train/model.py:
               finetune_use_pallas)
  vjp_mlp      forward + backward through the shipping custom VJP
  bwd_direct   the Pallas backward kernel alone (stage 3; g varies)
  bwd_bf16mxu  same with bf16 MXU multiplicands (lever probe: the bwd
               has 4 tile matmuls vs the forward's 2, so the forward's
               "bf16 no faster" result need not transfer)
  dw_fwd/vjp_dw  depthwise 7x7 forward / forward+backward (XLA)
  vjp_downsample the stage-3->4 LN + 2x2s2 conv child

Composition: ft_minus_frozen ~= sum_over_trainable(depth x (vjp - fwd))
[the vjp arm pays fwd+bwd; under remat the step pays the same fwd twice
(once in fwd pass, once recomputed) + bwd, so per-block step cost is
(fwd + vjp) and the DELTA over frozen (which already pays one fwd) is
vjp] + downsample vjp delta + encoder opt update (measured at the HBM
floor in bench_opt_update.py).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[ft-floor] {msg}", file=sys.stderr, flush=True)


B = 32
K1, K2 = 3, 13
REPS = 5

# (hw, c, depth, mlp_bwd_is_pallas) — trainable children at starting_layer=5
TRAINABLE_STAGES = [
    (16, 512, 27, True),   # child 5: stage 3 (Pallas fwd+bwd)
    (8, 1024, 3, False),   # child 7: stage 4 (Pallas fwd, XLA bwd: policy)
]


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_captioner.eval.benchlib import scanned_quotient
    from tpu_captioner.models.convnext import depthwise_conv7x7_nhwc
    from tpu_captioner.ops import mlp_block

    def bench(name, fn, params, xs, opts=None):
        sec, _, _ = scanned_quotient(
            fn, params, xs, k1=K1, k2=K2, log=log, name=name, reps=REPS,
            opts=opts,
        )
        print(json.dumps({"metric": name, "sec": round(sec, 6)}), flush=True)
        return sec

    key = jax.random.PRNGKey(0)
    totals_ms = {}
    for hw, c, depth, bwd_pallas in TRAINABLE_STAGES:
        n = B * hw * hw
        tag = f"{hw}x{hw}x{c}"
        mkx = jax.jit(lambda k, n=n, c=c: jax.random.normal(
            k, (K2, n, c), jnp.float32) * 0.1)
        xs = mkx(key)
        mkw = jax.jit(lambda k, c=c: {
            "res": jax.random.normal(k, (n, c), jnp.float32) * 0.1,
            "sd": jnp.ones((n,), jnp.float32),
            "lns": jnp.ones((c,), jnp.float32),
            "lnb": jnp.zeros((c,), jnp.float32),
            "w1": jax.random.normal(k, (c, 4 * c), jnp.float32) * 0.02,
            "b1": jnp.zeros((4 * c,), jnp.float32),
            "w2": jax.random.normal(k, (4 * c, c), jnp.float32) * 0.02,
            "b2": jnp.zeros((c,), jnp.float32),
            "gamma": jnp.full((c,), 1e-6, jnp.float32),
            "dw": jax.random.normal(k, (7, 7, c), jnp.float32) * 0.01,
            "x_fixed": jax.random.normal(
                jax.random.fold_in(k, 1), (n, c), jnp.float32) * 0.1,
        })
        w = mkw(key)
        jax.block_until_ready((xs, w))

        sum_x = bench(f"sumx_{tag}", lambda p, xi: jnp.sum(xi), w, xs)

        def mlp_apply(xi, p, use_pallas):
            return mlp_block.fused_convnext_mlp(
                xi, p["res"], p["sd"], p["lns"], p["lnb"],
                p["w1"], p["b1"], p["w2"], p["b2"], p["gamma"],
                use_pallas, True,
            )

        fwd = bench(
            f"fwd_mlp_{tag}",
            lambda p, xi: jnp.sum(mlp_apply(xi, p, True)), w, xs,
        ) - sum_x

        def mlp_loss(xi, p):
            # Backward follows the shipping policy: custom-VJP Pallas bwd
            # for stage 3, XLA autodiff for stage 4 (use_pallas=False takes
            # _reference_impl whose vjp IS the XLA backward).
            return jnp.sum(mlp_apply(xi, p, bwd_pallas))

        def vjp_fn(p, xi):
            dx, dp = jax.grad(mlp_loss, argnums=(0, 1))(xi, p)
            leaves = [jnp.sum(dx)] + [
                jnp.sum(v) for k, v in sorted(dp.items())
                if k not in ("x_fixed",)
            ]
            return sum(leaves)

        vjp = bench(f"vjp_mlp_{tag}", vjp_fn, w, xs) - sum_x

        res = {"fwd_mlp": fwd, "vjp_mlp": vjp, "bwd_mlp": vjp - fwd}

        if bwd_pallas:
            for nm, mxu in (("bwd_direct", jnp.float32),
                            ("bwd_bf16mxu", jnp.bfloat16)):
                def direct(p, gi, mxu=mxu):
                    outs = mlp_block._bwd_pallas(
                        gi, p["x_fixed"], p["sd"], p["lns"], p["lnb"],
                        p["w1"], p["b1"], p["w2"], p["b2"], p["gamma"],
                        mxu_dtype=mxu,
                    )
                    return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
                # The scanned direct call hits the same staged-output-tuple
                # scoped-VMEM wall the product step does (51.7M > the 46.3M
                # default on the relay); give it the round-4 64 MB headroom.
                res[nm] = bench(
                    f"{nm}_{tag}", direct, w, xs,
                    opts={"xla_tpu_scoped_vmem_limit_kib": 65536},
                ) - sum_x

        dwf = bench(
            f"dw_fwd_{tag}",
            lambda p, xi, hw=hw, c=c: jnp.sum(depthwise_conv7x7_nhwc(
                xi.reshape(B, hw, hw, c), p["dw"], False)), w, xs,
        ) - sum_x

        def dw_vjp2(p, xi, hw=hw, c=c):
            def loss(xi2, dwk):
                return jnp.sum(depthwise_conv7x7_nhwc(
                    xi2.reshape(B, hw, hw, c), dwk, False))
            dx, dk = jax.grad(loss, argnums=(0, 1))(xi, p["dw"])
            return jnp.sum(dx) + jnp.sum(dk)

        dwv = bench(f"vjp_dw_{tag}", dw_vjp2, w, xs) - sum_x
        res["dw_fwd"] = dwf
        res["vjp_dw"] = dwv
        res["bwd_dw"] = dwv - dwf

        # Analytic floors for the MLP tail at this shape.
        mm_flops_fwd = 2 * 2 * n * c * 4 * c  # mm1 + mm2, 2*MAC
        hbm_bwd_mb = (  # g, x reads + d_x write + weight reads/grads
            (3 * n * c + 2 * (c * 4 * c) * 2) * 4 / 1e6
        )
        print(json.dumps({
            "stage": tag, "depth": depth,
            **{k: round(v, 6) for k, v in res.items()},
            "mm_tflops_fwd": round(mm_flops_fwd / 1e12, 4),
            "bwd_mxu_floor_us": round(2 * mm_flops_fwd / 197e12 * 1e6, 1),
            "bwd_hbm_floor_us": round(hbm_bwd_mb / 819e3 * 1e6, 1),
            "hbm_bwd_mb": round(hbm_bwd_mb, 1),
        }), flush=True)
        for k, v in res.items():
            totals_ms[k] = totals_ms.get(k, 0.0) + depth * v * 1e3

    # Downsample child 6 (16x16x512 -> 8x8x1024): LN + 2x2 s2 conv.
    import flax.linen as nn
    ds = nn.Sequential([
        nn.LayerNorm(epsilon=1e-6),
        nn.Conv(1024, (2, 2), strides=(2, 2)),
    ])
    mkxs = jax.jit(lambda k: jax.random.normal(
        k, (K2, B, 16, 16, 512), jnp.float32) * 0.1)
    xs = mkxs(key)
    params = ds.init(key, xs[0])
    jax.block_until_ready((xs, params))
    sum_ds = bench("sumx_ds", lambda p, xi: jnp.sum(xi), params, xs)
    ds_fwd = bench(
        "fwd_downsample", lambda p, xi: jnp.sum(ds.apply(p, xi)), params, xs,
    ) - sum_ds

    def ds_vjp(p, xi):
        def loss(xi2, p2):
            return jnp.sum(ds.apply(p2, xi2))
        dx, dp = jax.grad(loss, argnums=(0, 1))(xi, p)
        return jnp.sum(dx) + sum(jnp.sum(l) for l in jax.tree.leaves(dp))

    ds_v = bench("vjp_downsample", ds_vjp, params, xs) - sum_ds
    totals_ms["fwd_downsample"] = ds_fwd * 1e3
    totals_ms["vjp_downsample"] = ds_v * 1e3

    delta = (
        totals_ms.get("vjp_mlp", 0.0) - 0.0  # vjp already includes one fwd
        + totals_ms.get("vjp_dw", 0.0)
        + totals_ms["vjp_downsample"]
    )
    print(json.dumps({
        "totals_x_depth_ms": {k: round(v, 2) for k, v in totals_ms.items()},
        "ft_minus_frozen_component_sum_ms": round(delta, 2),
        "note": "compare against measured fine-tune minus frozen step "
                "(bench_finetune_ab pallas34off minus bench.py frozen row) "
                "minus the encoder opt update (bench_opt_update.py)",
    }), flush=True)


if __name__ == "__main__":
    main()
