"""CLI: deterministic TEST-split evaluation (reference test.py).

Loads a checkpoint (BEST by convention), greedy-decodes the TEST split with
maxDecodeLen=51, reports loss / top-5 / BLEU-1..4, writes the one-row CSV
(test.py:122-136).  Determinism needs no CUBLAS/cudnn flags here: jitted
eval is deterministic by construction.
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    from tpu_captioner.cli.common import add_common_args, config_from_args

    add_common_args(p)
    p.add_argument("--resultsDir", type=str, default="results")
    args = p.parse_args()
    exp = config_from_args(args)

    from tpu_captioner.parallel.mesh import make_mesh

    mesh = make_mesh(exp.num_devices)

    from tpu_captioner.data.dataset import CaptionDataset
    from tpu_captioner.data.loader import ShardedLoader
    from tpu_captioner.train.loop import Trainer

    # Reference .pth.tar checkpoints are ported on load (torch unpickle ->
    # param trees), enabling direct BLEU-parity evaluation of models trained
    # by the reference code.
    ref_ckpt = None
    if exp.train.checkpoint and exp.train.checkpoint.endswith(".pth.tar"):
        ref_ckpt, exp.train.checkpoint = exp.train.checkpoint, None

    trainer = Trainer(exp, args.dataFolder, args.dataName, mesh=mesh)
    if ref_ckpt is not None:
        from tpu_captioner.models.port_torch import port_reference_checkpoint

        enc_p, dec_p, meta = port_reference_checkpoint(
            ref_ckpt, exp.model.decoder, exp.model.num_layers,
            depths=tuple(exp.model.encoder_depths),
        )
        trainer.state = trainer.state.replace(
            params={"encoder": enc_p, "decoder": dec_p}
        )
        print(f"Loaded reference checkpoint (epoch {meta['epoch']}, "
              f"val BLEU-4 {meta['bleu4']})")
    test_loader = ShardedLoader(
        CaptionDataset(args.dataFolder, args.dataName, "TEST"),
        trainer.train_loader.global_batch,
        mesh,
        shuffle=False,
    )
    out = trainer.evaluate(test_loader)

    import pandas as pd

    os.makedirs(args.resultsDir, exist_ok=True)
    row = {
        "testLoss": out["loss"],
        "testTop5Acc": out["top5"],
        "bleu1": out["bleu1"],
        "bleu2": out["bleu2"],
        "bleu3": out["bleu3"],
        "bleu4": out["bleu4"],
    }
    name = (
        f"test-{exp.model.decoder}-Finetuning{args.startingLayer}-"
        f"{args.embeddingName}.csv"
    )
    pd.DataFrame([row]).to_csv(os.path.join(args.resultsDir, name), index=False)
    print(row)


if __name__ == "__main__":
    main()
