"""Component-cost floor for the ConvNeXt-Base encoder forward (VERDICT #8).

Measures each primitive of a ConvNeXt block IN ISOLATION on the real stage
shapes (batch 32, 256px inputs: stages (3,3,27,3) at dims (128,256,512,1024),
spatial 64/32/16/8), using the scanned difference-quotient methodology of
scripts/bench_eval_parts.py.  The per-stage costs are multiplied by block
depth and summed.

Interpretation: the fused-kernel encoder overlaps these engines (MXU for the
MLP matmuls, VPU for dwconv/GELU/LN, HBM DMA); a perfect implementation
costs max(engine sums) and any implementation costs at least the largest
single engine sum.  Comparing the measured encoder forward against the
serial sum shows how much the fusion already buys.

Measurement notes (the 2026-08-18 first run produced sub-noise values,
several negative — artifacts/r04_queue/q_enc_floor.json):
- each scan length is timed ``reps`` times and the MIN taken (relay
  jitter is additive, so min estimates true device time);
- every scanned body ends in a jnp.sum over the primitive's output (to
  defeat DCE), which costs ~one extra read of that output; a sum-only
  baseline is measured per shape and subtracted (``*_adj`` metrics).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[enc-floor] {msg}", file=sys.stderr, flush=True)


STAGES = [  # (depth, H=W, C) — ConvNeXt-Base at 256px
    (3, 64, 128),
    (3, 32, 256),
    (27, 16, 512),
    (3, 8, 1024),
]
B = 32
K1, K2 = 3, 13
REPS = 5


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_captioner.models.convnext import depthwise_conv7x7_nhwc
    from tpu_captioner.ops.mlp_block import _gelu_exact

    from tpu_captioner.eval.benchlib import scanned_quotient

    def bench_scanned(name, fn, x, w):
        """fn: (x_i, w) -> scalar, scanned over K distinct inputs."""
        sec, _, _ = scanned_quotient(
            lambda w, xi: fn(xi, w), w, x, k1=K1, k2=K2, log=log, name=name,
            reps=REPS,
        )
        print(json.dumps({"metric": name, "sec": round(sec, 6)}), flush=True)
        return sec

    key = jax.random.PRNGKey(0)
    totals = {}
    per_stage = []
    for depth, hw, c in STAGES:
        mk = jax.jit(lambda k, hw=hw, c=c: jax.random.normal(
            k, (K2, B, hw, hw, c), jnp.float32) * 0.1)
        xs = mk(key)
        jax.block_until_ready(xs)
        mkw = jax.jit(lambda k, c=c: {
            "dw": jax.random.normal(k, (7, 7, c), jnp.float32) * 0.01,
            "w1": jax.random.normal(k, (c, 4 * c), jnp.float32) * 0.01,
            "w2": jax.random.normal(k, (4 * c, c), jnp.float32) * 0.01,
        })
        w = mkw(key)
        jax.block_until_ready(w)
        mkh = jax.jit(lambda k, hw=hw, c=c: jax.random.normal(
            k, (K2, B * hw * hw, 4 * c), jnp.float32) * 0.1)
        hs = mkh(key)  # MLP-intermediate-shaped inputs for gelu/w2
        jax.block_until_ready(hs)
        float(xs.ravel()[0])
        float(hs.ravel()[0])

        # Sum-only baselines: what jnp.sum over each operand shape costs.
        sum_x = bench_scanned(
            f"sumx_{hw}x{hw}x{c}", lambda xi, w: jnp.sum(xi), xs, w,
        )
        sum_h = bench_scanned(
            f"sumh_{hw}x{hw}x{4 * c}", lambda hi, w: jnp.sum(hi), hs, w,
        )

        res = {}
        res["dwconv"] = bench_scanned(
            f"dwconv_{hw}x{hw}x{c}",
            lambda xi, w: jnp.sum(depthwise_conv7x7_nhwc(xi, w["dw"], False)),
            xs, w,
        )
        res["mm1"] = bench_scanned(
            f"mm1_{hw}x{hw}x{c}",
            lambda xi, w, c=c: jnp.sum(xi.reshape(-1, c) @ w["w1"]),
            xs, w,
        )
        res["mm2"] = bench_scanned(
            f"mm2_{hw}x{hw}x{c}",
            lambda hi, w: jnp.sum(hi @ w["w2"]),
            hs, w,
        )
        res["gelu"] = bench_scanned(
            f"gelu_{hw}x{hw}x{4 * c}",
            lambda hi, w: jnp.sum(_gelu_exact(hi)),
            hs, w,
        )
        res["ln"] = bench_scanned(
            f"ln_{hw}x{hw}x{c}",
            lambda xi, w, c=c: jnp.sum(
                (lambda r: (r - jnp.mean(r, -1, keepdims=True))
                 * jax.lax.rsqrt(jnp.var(r, -1, keepdims=True) + 1e-6))
                (xi.reshape(-1, c))
            ),
            xs, w,
        )
        res["copy"] = bench_scanned(  # one read + (fused) write + read-back
            f"copy_{hw}x{hw}x{c}",
            lambda xi, w: jnp.sum(xi * 1.0001),
            xs, w,
        )
        # Subtract the sum-only baseline of each primitive's OUTPUT shape
        # (the anti-DCE jnp.sum reads the whole output once).
        baseline = {"dwconv": sum_x, "mm1": sum_h, "mm2": sum_x,
                    "gelu": sum_h, "ln": sum_x, "copy": sum_x}
        adj = {k: max(v - baseline[k], 0.0) for k, v in res.items()}
        per_stage.append({
            "stage": f"{hw}x{hw}x{c}", "depth": depth,
            **{k: round(v, 6) for k, v in res.items()},
            **{f"{k}_adj": round(v, 6) for k, v in adj.items()},
            "sum_x": round(sum_x, 6), "sum_h": round(sum_h, 6),
        })
        for k, v in adj.items():
            totals[k] = totals.get(k, 0.0) + depth * v

    print(json.dumps({"per_stage": per_stage}), flush=True)
    print(json.dumps({
        "totals_x_depth_ms": {k: round(v * 1e3, 2) for k, v in totals.items()},
        "serial_sum_ms": round(sum(totals.values()) * 1e3, 2),
        "mxu_sum_ms": round((totals["mm1"] + totals["mm2"]) * 1e3, 2),
        "vpu_sum_ms": round(
            (totals["dwconv"] + totals["gelu"] + totals["ln"]) * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
