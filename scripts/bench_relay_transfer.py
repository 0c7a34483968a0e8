"""Decompose the input-pipeline steady state (VERDICT r2 #5 follow-up).

Measures, for one bs=32 uint8 image batch (6.3 MB):
  1. host-side production cost (memmap gather + collate) — the part our
     pipeline design owns;
  2. host->device transfer through the axon relay, single- and
     multi-threaded — the part the tunnel owns (device_put is LAZY through
     the relay, so each probe forces materialization with a tiny jitted
     reduction + scalar fetch, per BENCHMARKING.md measurement hygiene).

Writes artifacts/input_pipeline/relay_transfer.json.
Run scripts/bench_input_pipeline.py first to build /tmp/pipe_ds.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from tpu_captioner.data.dataset import CaptionDataset

    B = 32
    mb = B * 256 * 256 * 3 / 1e6
    out = {"batch_mb": round(mb, 2)}

    ds = CaptionDataset(
        os.environ.get("PIPE_DATA_DIR", "/tmp/pipe_ds"),
        "synthetic_5_cap_per_img_1_min_word_freq", "TRAIN",
    )
    idx = np.arange(B)
    ds.gather(idx)  # warm the memmap
    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        ds.gather((idx + i * B) % len(ds))
    host_ms = (time.perf_counter() - t0) / n * 1e3
    out["host_gather_ms"] = round(host_ms, 2)

    f = jax.jit(lambda x: x.astype(jnp.float32).sum())
    float(f(jnp.asarray(np.zeros((B, 256, 256, 3), np.uint8))))
    for nthreads in (1, 4):
        imgs = [np.random.randint(0, 256, (B, 256, 256, 3), dtype=np.uint8)
                for _ in range(8)]

        def worker(k):
            for i in range(k, len(imgs), nthreads):
                a = jax.device_put(imgs[i])
                float(f(a))  # force the lazy transfer in this thread

        t0 = time.perf_counter()
        ths = [threading.Thread(target=worker, args=(k,))
               for k in range(nthreads)]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        dt = time.perf_counter() - t0
        out[f"transfer_mb_per_s_threads{nthreads}"] = round(
            mb * len(imgs) / dt, 1
        )

    out["transfer_ms_per_batch"] = round(
        mb / out["transfer_mb_per_s_threads1"] * 1e3, 1
    )
    print(json.dumps(out), flush=True)
    outdir = os.path.join(REPO, "artifacts", "input_pipeline")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "relay_transfer.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
