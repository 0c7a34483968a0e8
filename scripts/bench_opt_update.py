"""Isolate the optimizer/metrics share of the frozen TF train step.

The round-3 decomposition (scripts/bench_train_parts.py) attributed
~3.5 ms/step to "opt/metrics" by subtraction.  This bench measures the
pieces directly at flagship decoder shapes so the fused-update lever
(VERDICT r3 #3) is pulled on evidence:

  a) optax chain (clip -> adam via inject_hyperparams) + param apply — the
     shipping path (train/state.py:make_optimizer);
  b) hand-fused single-pass update: (p, g, m, v) -> (p', m', v') in one
     tree_map leaf fn (no separate updates tree).

Both measured as scanned difference quotients (relay-dispatch-proof).
Prints one JSON line with both numbers and the 7-pass HBM floor.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(f"[opt-bench] {m}", file=sys.stderr, flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from tpu_captioner.core.config import ModelConfig
    from tpu_captioner.train.model import CaptionModel
    from tpu_captioner.train.state import make_optimizer

    V = 9490
    model = CaptionModel(ModelConfig(decoder="transformer", vocab_size=V))
    params = jax.jit(lambda k: model.init_params(k, image_size=256))(
        jax.random.PRNGKey(0)
    )
    dec_params = params["decoder"]
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(dec_params))
    log(f"decoder params: {nparams/1e6:.1f}M")
    dec_opt = make_optimizer(1e-4, 5.0)
    opt_state = dec_opt.init(dec_params)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-4), dec_params
    )

    # a) shipping optax path ------------------------------------------------
    def optax_step(carry, _):
        p, s = carry
        g = jax.tree_util.tree_map(lambda x: x * 1.000001, grads)
        u, s = dec_opt.update(g, s, p)
        p = jax.tree_util.tree_map(lambda a, b: a + b, p, u)
        return (p, s), ()

    # b) fused single-pass clip+adam+apply ----------------------------------
    b1, b2, eps, lr, clip = 0.9, 0.999, 1e-8, 1e-4, 5.0

    def fused_step(carry, _):
        p, m, v, count = carry
        count = count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf(pp, gg, mm, vv):
            # optax numerics exactly: clip, adam moments, sqrt(v_hat)+eps.
            gg = jnp.clip(gg * 1.000001, -clip, clip)
            mm = b1 * mm + (1.0 - b1) * gg
            vv = b2 * vv + (1.0 - b2) * gg * gg
            return pp - lr * (mm / bc1) / (jnp.sqrt(vv / bc2) + eps), mm, vv

        out = jax.tree_util.tree_map(leaf, p, grads, m, v)
        p2 = jax.tree_util.tree_map(lambda t: t[0], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
        m2 = jax.tree_util.tree_map(lambda t: t[1], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
        v2 = jax.tree_util.tree_map(lambda t: t[2], out,
                                    is_leaf=lambda t: isinstance(t, tuple))
        return (p2, m2, v2, count), ()

    zeros = jax.tree_util.tree_map(jnp.zeros_like, dec_params)

    # Scanned difference quotient (relay-dispatch-proof, same idea as
    # eval/benchlib.scanned_quotient but over a state->state scan).
    def timed_scan(step_fn, carry0, k1=4, k2=16):
        f1 = jax.jit(lambda c: jax.lax.scan(step_fn, c, None, length=k1)[0])
        f2 = jax.jit(lambda c: jax.lax.scan(step_fn, c, None, length=k2)[0])
        c = f1(carry0)
        jax.block_until_ready(c)
        c = f2(carry0)
        jax.block_until_ready(c)
        reps = 5
        t0 = time.perf_counter()
        c = carry0
        for _ in range(reps):
            c = f1(c)
        jax.block_until_ready(c)
        t1 = (time.perf_counter() - t0) / reps
        t0 = time.perf_counter()
        c = carry0
        for _ in range(reps):
            c = f2(c)
        jax.block_until_ready(c)
        t2 = (time.perf_counter() - t0) / reps
        return (t2 - t1) / (k2 - k1)

    t_optax = timed_scan(optax_step, (dec_params, opt_state))
    log(f"optax: {t_optax*1e3:.3f} ms")

    t_fused = timed_scan(
        fused_step, (dec_params, zeros, zeros, jnp.zeros((), jnp.int32))
    )
    log(f"fused: {t_fused*1e3:.3f} ms")

    floor_ms = 7 * nparams * 4 / 819e9 * 1e3  # read g,m,v,p; write p,m,v @819GB/s
    print(json.dumps({
        "metric": "opt_update_ms",
        "optax_ms": round(t_optax * 1e3, 3),
        "fused_ms": round(t_fused * 1e3, 3),
        "hbm_floor_ms": round(floor_ms, 3),
        "params_m": round(nparams / 1e6, 1),
    }))


if __name__ == "__main__":
    main()
