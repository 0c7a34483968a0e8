"""CLI: caption a single image with beam search + attention maps
(reference caption.py __main__, :433-).

    python -m tpu_captioner.cli.caption --img photo.jpg \
        --checkpoint checkpoints/BEST_checkpoint_... \
        --wordMap inputFiles/WORDMAP_coco_5_cap_per_img_5_min_word_freq.json \
        --beamSize 5 --out attention.png

Also accepts a reference .pth.tar checkpoint directly (ported on load), and
can batch-caption a directory into a captions CSV
(graphs/generatedCaptions/*.csv format: imageFile,generatedCaption).
"""

import argparse
import json
import os

import numpy as np


def load_image(path: str, size: int = 256) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    img = img.resize((size, size), Image.BICUBIC)
    return np.asarray(img, dtype=np.uint8)


def build_model_and_params(args, word_map):
    from tpu_captioner.core.config import ModelConfig
    from tpu_captioner.train.model import CaptionModel

    decoder = args.decoder or ("lstm" if args.lstmDecoder else "transformer")
    cfg = None
    meta_path = os.path.join(args.checkpoint, "meta.json")
    if os.path.isdir(args.checkpoint) and os.path.exists(meta_path):
        # Self-describing checkpoint: rebuild the exact training-time model.
        with open(meta_path) as f:
            meta = json.load(f)
        if "config" in meta:
            raw = dict(meta["config"]["model"])
            raw["vocab_size"] = len(word_map)
            cfg = ModelConfig(**raw)
    if cfg is None:
        cfg = ModelConfig(
            decoder=decoder, vocab_size=len(word_map),
            embedding_name=args.embeddingName,
        )
    model = CaptionModel(cfg)

    if args.checkpoint.endswith(".pth.tar"):
        from tpu_captioner.models.port_torch import port_reference_checkpoint

        enc_p, dec_p, _ = port_reference_checkpoint(args.checkpoint, decoder)
        params = {"encoder": enc_p, "decoder": dec_p}
    else:
        import jax

        from tpu_captioner.train.checkpoint import restore_checkpoint
        from tpu_captioner.train.state import TrainState, make_optimizer

        opt = make_optimizer(1e-4)
        template = TrainState.create(
            model.init_params(jax.random.PRNGKey(0)), opt, opt
        )
        state, _ = restore_checkpoint(args.checkpoint, template)
        params = state.params
    return model, params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img", "-i", required=True, help="image file or directory")
    p.add_argument("--checkpoint", "-m", required=True)
    p.add_argument("--wordMap", "-wm", required=True)
    p.add_argument("--beamSize", "-b", type=int, default=5)
    p.add_argument("--dont_smooth", dest="smooth", action="store_false")
    p.add_argument("--decoder", type=str, default=None)
    p.add_argument("--lstmDecoder", action="store_true")
    p.add_argument("--embeddingName", type=str, default=None)
    p.add_argument("--out", type=str, default=None, help="attention grid PNG")
    p.add_argument("--csv", type=str, default=None,
                   help="write imageFile,generatedCaption rows here")
    args = p.parse_args()

    with open(args.wordMap) as f:
        word_map = json.load(f)
    rev = {v: k for k, v in word_map.items()}
    model, params = build_model_and_params(args, word_map)

    import jax.numpy as jnp

    from tpu_captioner.infer.beam import beam_search

    paths = (
        [os.path.join(args.img, f) for f in sorted(os.listdir(args.img))]
        if os.path.isdir(args.img)
        else [args.img]
    )
    from tpu_captioner.infer.beam import beam_search_batch

    # Decode cap: 50 like the reference (caption.py:147), bounded by the
    # model's positional-encoding table for small configs.
    max_steps = min(50, model.cfg.max_len - 2)
    rows = []
    # Directory mode runs batched beam search (one encoder pass + vmapped
    # beams per group) — the reference captions strictly one image per
    # process invocation (caption.py:433-).
    group = 8
    for s in range(0, len(paths), group):
        chunk = paths[s : s + group]
        images = np.stack([load_image(p) for p in chunk])
        if len(paths) == 1:
            res = beam_search(
                model, params, jnp.asarray(images[0]),
                beam_size=args.beamSize, max_steps=max_steps,
                start_id=word_map["<start>"], end_id=word_map["<end>"],
            )
            results = [(res.sequence, res.length, res.alphas, res.score)]
        else:
            # Pad partial chunks to the fixed group size: every group then
            # hits the same compiled beam_search_batch program (a distinct
            # remainder shape would trigger a fresh multi-minute remote
            # compile on relay-attached chips).
            if len(chunk) < group:
                pad = np.repeat(images[-1:], group - len(chunk), axis=0)
                images_in = np.concatenate([images, pad], axis=0)
            else:
                images_in = images
            res = beam_search_batch(
                model, params, jnp.asarray(images_in),
                beam_size=args.beamSize, max_steps=max_steps,
                start_id=word_map["<start>"], end_id=word_map["<end>"],
            )
            results = [
                (res.sequence[j], res.length[j], res.alphas[j], res.score[j])
                for j in range(len(chunk))
            ]
        for path, image, (sequence, length, alphas, score) in zip(
            chunk, images, results
        ):
            n = int(length)
            seq = np.asarray(sequence)[:n]
            words = [rev[int(i)] for i in seq]
            caption = " ".join(w for w in words if w not in ("<start>", "<end>"))
            print(f"{os.path.basename(path)}: {caption}  (score {float(score):.3f})")
            rows.append(
                {"imageFile": os.path.basename(path), "generatedCaption": caption}
            )
            if args.out and len(paths) == 1:
                from tpu_captioner.infer.visualize import visualize_att

                visualize_att(
                    image, seq, np.asarray(alphas)[:n], rev,
                    smooth=args.smooth, out_path=args.out,
                )
    if args.csv:
        import pandas as pd

        pd.DataFrame(rows).to_csv(args.csv, index=False)


if __name__ == "__main__":
    main()
