"""Sustained input-pipeline proof (VERDICT r2 #5).

Builds a ~1k-image (5k-caption, 156-batch) synthetic memmap dataset at full
256px resolution and runs ONE full Trainer epoch on the real chip, so the
single-producer prefetch pipeline (data/loader.py) is measured feeding a
~27 ms train step for 150+ consecutive batches — not the 2-batch demo
epochs of the round-2 artifacts.  Passes when the epoch-average
trainDataTime < 20% of trainBatchTime (reference comparison: 6-worker torch
DataLoader reached 0.0005 s data time on COCO,
results/comparingTimes(msCoco2epochs)/).

The dataset is built with vocab 9490 / max_len 50 / image 256 so the train
step's compiled program is byte-identical to bench.py's (compile cache hit).

Writes artifacts/input_pipeline/epoch.csv.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(f"[input-pipe] {msg}", file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpu_captioner.core.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from tpu_captioner.data.build import build_synthetic_dataset
    from tpu_captioner.train.loop import Trainer

    workdir = os.environ.get("PIPE_DATA_DIR", "/tmp/pipe_ds")
    base = "synthetic_5_cap_per_img_1_min_word_freq"
    if not os.path.exists(os.path.join(workdir, f"WORDMAP_{base}.json")):
        log("building 1000-image 256px dataset (~196 MB)")
        t0 = time.time()
        build_synthetic_dataset(
            workdir,
            num_images={"TRAIN": 1000, "VAL": 8, "TEST": 8},
            vocab_words=9486,  # + <pad>/<unk>/<start>/<end> = 9490 exactly
            max_len=50, image_size=256,
        )
        log(f"built in {time.time() - t0:.0f}s")

    exp = ExperimentConfig(
        data=DataConfig(batch_size=32, image_size=256),
        model=ModelConfig(decoder="transformer"),
        train=TrainConfig(
            epochs=2, batch_size=32, print_freq=50,
            checkpoint_dir="/tmp/pipe_ckpt", results_dir="/tmp/pipe_results",
        ),
    )
    tr = Trainer(exp, workdir, base, verbose=True)
    log(f"vocab={len(tr.word_map)}; {len(tr.train_loader)} batches/epoch")
    n = len(tr.train_loader)
    rows = []
    # Epoch 0 pays the compile (~90 s through the relay) inside batch 1 and
    # dominates its averages; epoch 1 is the sustained steady-state claim.
    for ep in range(2):
        t0 = time.time()
        out = tr.train_epoch(ep)
        wall = time.time() - t0
        rows.append({
            "epoch": ep,
            "n_batches": n,
            "trainBatchTime": round(out["batch_time"], 5),
            "trainDataTime": round(out["data_time"], 5),
            "data_over_batch": round(out["data_time"] / out["batch_time"], 4),
            "epoch_wall_s": round(wall, 1),
            "images_per_sec": round(32 * n / wall, 1),
            "pass_lt_20pct": out["data_time"] / out["batch_time"] < 0.20,
        })
        print(json.dumps(rows[-1]), flush=True)
    row = rows[-1]
    outdir = os.path.join(REPO, "artifacts", "input_pipeline")
    os.makedirs(outdir, exist_ok=True)
    import pandas as pd

    pd.DataFrame(rows).to_csv(os.path.join(outdir, "epoch.csv"), index=False)
    log("wrote artifacts/input_pipeline/epoch.csv")


if __name__ == "__main__":
    main()
