"""End-to-end quality demonstration on the real TPU chip.

Trains the flagship captioner (ConvNeXt-Base encoder + 512-dim Transformer
decoder) on the learnable synthetic dataset (class-coded 256x256 images,
content-derived captions) through the full Trainer — teacher-forcing train
steps, free-running greedy validation, corpus BLEU, best-checkpoint
tracking — until val BLEU-4 approaches 1.0 on unseen images.

This is the no-COCO-on-machine equivalent of the reference's committed
results/*/test-*.csv acceptance rows (reference test.py:86-215): it proves
the whole train -> rollout -> BLEU -> checkpoint pipeline produces real
quality numbers on TPU hardware.

    python scripts/train_bleu_demo.py [--epochs 40] [--out artifacts/bleu_demo]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--decoderLr", type=float, default=3e-4)
    p.add_argument("--out", default="artifacts/bleu_demo")
    p.add_argument("--dataDir", default="/tmp/bleu_demo_ds")
    p.add_argument("--imageSize", type=int, default=256)
    p.add_argument("--stopAtBleu4", type=float, default=0.99)
    p.add_argument(
        "--fineTuneEpoch", type=int, default=10_000,
        help="epoch at which the encoder unlocks (reference default 20); "
        "small values exercise the fine-tune train step (per-stage Pallas "
        "kernels + pruned backward) through the real Trainer on the chip",
    )
    p.add_argument("--startingLayer", type=int, default=5)
    args = p.parse_args()

    from tpu_captioner.core.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from tpu_captioner.data.build import build_synthetic_dataset
    from tpu_captioner.train.loop import Trainer

    os.makedirs(args.out, exist_ok=True)
    build_synthetic_dataset(
        args.dataDir, num_images={"TRAIN": 64, "VAL": 16}, max_len=50,
        image_size=args.imageSize, learnable=True, n_classes=16,
    )
    base = "synthetic_5_cap_per_img_1_min_word_freq"

    exp = ExperimentConfig(
        data=DataConfig(batch_size=32, image_size=args.imageSize),
        model=ModelConfig(decoder="transformer", dropout=0.0),
        train=TrainConfig(
            epochs=args.epochs, batch_size=32, decoder_lr=args.decoderLr,
            fine_tune_epoch=args.fineTuneEpoch,
            starting_layer=args.startingLayer,
            early_stop_patience=10_000,
            print_freq=10_000,
            checkpoint_dir=os.path.join(args.out, "ckpt"),
            results_dir=args.out,
        ),
    )

    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    trainer = Trainer(exp, args.dataDir, base, verbose=False)
    t0 = time.time()
    for epoch in range(args.epochs):
        # Mirror Trainer.run()'s fine-tune unlock (reference train.py:161-165).
        if epoch == exp.train.fine_tune_epoch and not trainer.fine_tune_encoder:
            trainer.fine_tune_encoder = True
            trainer.state = trainer.state.reinit_encoder_optimizer(trainer.enc_opt)
            print(f"epoch {epoch}: encoder fine-tuning unlocked", flush=True)
        tr = trainer.train_epoch(epoch)
        val = trainer.evaluate(trainer.val_loader, epoch)
        trainer.results.append({
            "epoch": epoch, "trainLoss": tr["loss"], "trainTop5Acc": tr["top5"],
            "trainBatchTime": tr["batch_time"], "trainDataTime": tr["data_time"],
            "valLoss": val["loss"], "valTop5Acc": val["top5"],
            "bleu1": val["bleu1"], "bleu2": val["bleu2"],
            "bleu3": val["bleu3"], "bleu4": val["bleu4"],
        })
        is_best = val["bleu4"] > trainer.best_bleu4
        trainer.best_bleu4 = max(trainer.best_bleu4, val["bleu4"])
        # Keep the checkpoint path exercised end to end (Trainer.run's
        # save, including the BEST_ copy on improvement).
        import dataclasses as _dc

        from tpu_captioner.train.checkpoint import checkpoint_name, save_checkpoint

        save_checkpoint(
            exp.train.checkpoint_dir,
            checkpoint_name(base, trainer.model.is_lstm,
                            exp.train.starting_layer, exp.train.encoder_lr,
                            exp.model.embedding_name),
            trainer.state,
            {
                "epoch": epoch,
                "epochs_since_improvement": 0,
                "bleu4": val["bleu4"],
                "results": trainer.results,
                "config": _dc.asdict(exp),
            },
            is_best=is_best,
        )
        print(
            f"epoch {epoch:3d}  trainLoss={tr['loss']:.4f}  "
            f"valLoss={val['loss']:.4f}  bleu4={val['bleu4']:.4f}  "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
        if val["bleu4"] >= args.stopAtBleu4:
            break
    csv = trainer.write_results_csv()
    summary = {
        "backend": jax.default_backend(),
        "epochs_run": len(trainer.results),
        "best_bleu4": trainer.best_bleu4,
        "final": trainer.results[-1],
        "wall_seconds": round(time.time() - t0, 1),
        "csv": csv,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
