"""Where do the decoder's ~13 ms of the 27 ms frozen TF step go?

Variants of the frozen-encoder transformer TF train step:
  base     current code (threefry dropout keys)
  rbg      same, but the step converts the incoming key to the RBG PRNG
           (hardware-RNG-backed; threefry bit generation is pure VPU work)
  nodrop   dropout=0.0 (upper bound on what killing RNG cost could buy)

Usage: python scripts/bench_decoder_overhead.py [variant ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(name, n=30):
    import jax
    import jax.numpy as jnp

    from tpu_captioner.core.config import ModelConfig, TrainConfig
    from tpu_captioner.train.model import CaptionModel
    from tpu_captioner.train.state import TrainState, make_optimizer
    from tpu_captioner.train.steps import make_train_step

    V, B = 9490, 32
    cfg = ModelConfig(decoder="transformer", vocab_size=V)
    if name == "nodrop":
        cfg = ModelConfig(decoder="transformer", vocab_size=V, dropout=0.0)
    model = CaptionModel(cfg)
    params = jax.jit(lambda k: model.init_params(k, image_size=256))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    tc = TrainConfig(batch_size=B)
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
    inner = make_train_step(model, tc, wid, dec_opt, enc_opt,
                            teacher_forcing=True, train_encoder=False)

    if name == "rbg":
        # Key conversion happens in its own tiny jit; all split/fold_in/
        # bernoulli work inside the main step then runs on the RBG impl.
        @jax.jit
        def to_rbg(key):
            kd = jax.random.key_data(key)
            return jax.random.wrap_key_data(jnp.concatenate([kd, kd]), impl="rbg")

        def step(s, b, key):
            return inner(s, b, to_rbg(key))
    else:
        step = inner

    t0 = time.perf_counter()
    state, m = step(state, batch, jax.random.PRNGKey(0))
    print(f"[{name}] compile+first {time.perf_counter() - t0:.1f}s "
          f"loss={float(m['loss']):.4f}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1e3:.2f} ms/step  loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    names = sys.argv[1:] or ["base", "rbg", "nodrop"]
    if len(names) > 1:
        import subprocess

        for v in names:
            subprocess.run([sys.executable, __file__, v], check=False)
    else:
        run_variant(names[0])
