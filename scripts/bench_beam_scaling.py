"""Beam-search batch scaling: captions/sec at group sizes 8..128.

If throughput grows ~linearly with the group, the vmapped while_loop's
lock-step execution (all images run to the slowest one's step count) and
per-image matmul sizes are not the bottleneck, and a flattened (B*k) beam
formulation (VERDICT round 1, item 6b) has little to win; sublinear scaling
would argue for it.

Usage: python scripts/bench_beam_scaling.py [sizes ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpu_captioner.core.config import ModelConfig
    from tpu_captioner.infer.beam import beam_search_batch
    from tpu_captioner.train.model import CaptionModel

    V = 9490
    sizes = [int(s) for s in sys.argv[1:]] or [8, 32, 64, 128]
    model = CaptionModel(
        ModelConfig(decoder="transformer", vocab_size=V, use_pallas="off")
    )
    params = jax.jit(lambda k: model.init_params(k, image_size=256))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    for B in sizes:
        images = jnp.asarray(
            rng.integers(0, 256, (B, 256, 256, 3), dtype=np.uint8)
        )
        t0 = time.perf_counter()
        res = beam_search_batch(
            model, params, images,
            beam_size=5, max_steps=50, start_id=V - 2, end_id=V - 1,
        )
        jax.block_until_ready(res.sequence)
        print(f"[B={B}] compile+first {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            res = beam_search_batch(
                model, params, images,
                beam_size=5, max_steps=50, start_id=V - 2, end_id=V - 1,
            )
        float(res.score[0])
        dt = (time.perf_counter() - t0) / n
        print(f"B={B}: {B / dt:.1f} captions/sec ({dt * 1e3:.0f} ms/batch)",
              flush=True)


if __name__ == "__main__":
    main()
