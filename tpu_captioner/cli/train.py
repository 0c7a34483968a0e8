"""CLI: train a captioner (reference train.py / trainMultiGPU.py unified).

    python -m tpu_captioner.cli.train --dataFolder inputFiles \
        --dataName coco_5_cap_per_img_5_min_word_freq \
        --teacherForcing --startingLayer 5 --encoderLr 1e-6 \
        --embeddingName glove-wiki-gigaword-200 --numDevices 0

One driver covers single-chip and multi-chip: the 'data' mesh axis spans
however many devices are available (reference needed a separate 599-line
SLURM/DDP script for 2 GPUs).
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    from tpu_captioner.cli.common import add_common_args, config_from_args

    add_common_args(p)
    p.add_argument("--teacherForcing", action="store_true",
                   help="teacher-forcing training strategy")
    p.add_argument("--epochs", type=int, default=120)
    args = p.parse_args()
    exp = config_from_args(args)

    from tpu_captioner.parallel.mesh import make_mesh, maybe_initialize_distributed

    maybe_initialize_distributed()
    mesh = make_mesh(exp.num_devices)

    from tpu_captioner.train.loop import Trainer

    trainer = Trainer(exp, args.dataFolder, args.dataName, mesh=mesh)
    trainer.run()


if __name__ == "__main__":
    main()
