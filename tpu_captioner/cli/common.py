"""Shared CLI plumbing: the reference's argparse surface mapped onto
ExperimentConfig (reference train.py:59-79, trainMultiGPU.py:63-87,
test.py:63-81)."""

from __future__ import annotations

import argparse

from tpu_captioner.core.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dataFolder", type=str, default="inputFiles",
                   help="folder with built input records")
    p.add_argument("--dataName", type=str,
                   default="coco_5_cap_per_img_5_min_word_freq",
                   help="base name of processed dataset")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="path to checkpoint directory to resume/load")
    p.add_argument("--decoder", type=str, default=None,
                   choices=["lstm", "lstm_no_attention", "transformer",
                            "transformer_attvis"],
                   help="decoder family (overrides --lstmDecoder)")
    p.add_argument("--lstmDecoder", action="store_true",
                   help="use the LSTM+attention decoder instead of Transformer")
    p.add_argument("--startingLayer", type=int, default=5,
                   help="first ConvNeXt child index unlocked when fine-tuning")
    p.add_argument("--encoderLr", type=float, default=1e-4,
                   help="encoder learning rate when fine-tuning")
    p.add_argument("--embeddingName", type=str, default=None,
                   help="pretrained embedding preset "
                        "(word2vec-google-news-300 | glove-wiki-gigaword-200)")
    p.add_argument("--pretrainedEncoder", type=str, default=None,
                   help="init the ConvNeXt backbone from a torchvision "
                        "convnext_base state dict (.pth/.pth.tar) or a "
                        ".npz from 'build_data port-backbone' (the reference "
                        "always trains from IMAGENET1K_V1)")
    p.add_argument("--batchSize", type=int, default=32)
    p.add_argument("--numDevices", type=int, default=0,
                   help="data-parallel shards (0 = all local devices)")
    p.add_argument("--computeDtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])


def config_from_args(args) -> ExperimentConfig:
    decoder = args.decoder or ("lstm" if args.lstmDecoder else "transformer")
    model = ModelConfig(
        decoder=decoder,
        embedding_name=args.embeddingName,
        compute_dtype=args.computeDtype,
        pretrained_encoder=getattr(args, "pretrainedEncoder", None),
    )
    train = TrainConfig(
        batch_size=args.batchSize,
        starting_layer=args.startingLayer,
        encoder_lr=args.encoderLr,
        checkpoint=args.checkpoint,
        teacher_forcing=getattr(args, "teacherForcing", True),
        epochs=getattr(args, "epochs", 120),
    )
    data = DataConfig(batch_size=args.batchSize)
    return ExperimentConfig(data=data, model=model, train=train,
                            num_devices=args.numDevices)
