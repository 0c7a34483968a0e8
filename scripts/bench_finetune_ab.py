"""A/B bench for the fine-tune (train_encoder=True) step on the real chip.

Variants compared (all f32 unless BENCH_DTYPE=bfloat16):
  xla-remat      round-1 behavior: fused fwd kernel, backward = autodiff of
                 the XLA reference under remat (double-forward waste)
  pallas-remat   new hand-written Pallas backward kernel, block remat on
  pallas-norem   new backward kernel, remat off (store custom-VJP residuals)
  off            plain XLA everywhere (control)

Usage: python scripts/bench_finetune_ab.py [variant ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[ab] {msg}", file=sys.stderr, flush=True)


def run_variant(name, mlp_bwd, use_pallas, remat, n=20):
    if mlp_bwd:
        os.environ["TPU_CAPTIONER_MLP_BWD"] = mlp_bwd
    else:
        os.environ.pop("TPU_CAPTIONER_MLP_BWD", None)
    import jax
    import jax.numpy as jnp

    from tpu_captioner.core.config import ModelConfig, TrainConfig
    from tpu_captioner.train.model import CaptionModel
    from tpu_captioner.train.state import TrainState, make_optimizer
    from tpu_captioner.train.steps import make_train_step

    V, B = 9490, 32
    dtype = os.environ.get("BENCH_DTYPE", "float32")
    model = CaptionModel(
        ModelConfig(decoder="transformer", vocab_size=V, compute_dtype=dtype,
                    use_pallas=use_pallas, encoder_remat=remat)
    )
    params = jax.jit(lambda k: model.init_params(k, image_size=256))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    tc = TrainConfig(batch_size=B, starting_layer=5)
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
    state = TrainState.create(params, dec_opt, enc_opt)
    step = make_train_step(model, tc, wid, dec_opt, enc_opt,
                           teacher_forcing=True, train_encoder=True)
    t0 = time.perf_counter()
    state, m = step(state, batch, jax.random.PRNGKey(0))
    loss0 = float(m["loss"])
    log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s loss={loss0:.4f}")
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1e3:.1f} ms/step  loss={loss:.4f}", flush=True)
    return dt


VARIANTS = {
    # name: (TPU_CAPTIONER_MLP_BWD, use_pallas, remat)
    "xla-remat": ("xla", "mlp", "on"),
    "pallas-remat": (None, "mlp", "on"),
    "pallas-norem": (None, "mlp", "off"),
    # Fused kernels on stages 1-3 only: stage 4's 3-block weight-grad stack
    # (48 MB) is what XLA insists on staging in scoped VMEM; stage 3's
    # (113 MB) cannot be staged, so XLA streams it from HBM instead.
    "pallas34off": (None, ("mlp", "mlp", "mlp", "off"), "on"),
    "pallas34off-norem": (None, ("mlp", "mlp", "mlp", "off"), "off"),
    # remat policy that saves each block's dwconv output: backward replays
    # no forward compute (round 5; models/convnext.py Stage).
    "pallas34off-savemlp": (None, ("mlp", "mlp", "mlp", "off"), "save_mlp_in"),
    "off": (None, "off", "on"),
}

if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    names = sys.argv[1:] or list(VARIANTS)
    if len(names) > 1:
        # One subprocess per variant: the env knob is read at trace time and
        # jit caching would otherwise leak between variants.
        import subprocess

        for v in names:
            subprocess.run([sys.executable, __file__, v], check=False)
    else:
        v = names[0]
        run_variant(v, *VARIANTS[v])
