"""End-to-end: train a tiny model -> self-describing checkpoint -> caption
CLI (beam search + attention PNG + captions CSV) in a subprocess."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_reproducibility import BASE, MAXLEN, make_exp
from tpu_captioner.data.build import build_synthetic_dataset
from tpu_captioner.train.loop import Trainer


@pytest.mark.slow
def test_caption_cli_end_to_end(tmp_path):
    d = tmp_path / "data"
    build_synthetic_dataset(
        str(d), num_images={"TRAIN": 16, "VAL": 8}, max_len=MAXLEN, image_size=32
    )
    exp = make_exp(tmp_path, "cli")
    exp.data.image_size = 32
    trainer = Trainer(exp, str(d), BASE, verbose=False)
    trainer.run()
    ckpts = os.listdir(exp.train.checkpoint_dir)
    best = [c for c in ckpts if c.startswith("BEST_")]
    assert best, ckpts
    ckpt_dir = os.path.join(exp.train.checkpoint_dir, best[0])
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        assert "config" in json.load(f)

    # An input image (any size; the CLI resizes to the config image size...
    # it resizes to 256 by default — the tiny encoder handles any HxW).
    from PIL import Image

    img_path = tmp_path / "img.png"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(img_path)

    out_png = tmp_path / "att.png"
    out_csv = tmp_path / "captions.csv"
    r = subprocess.run(
        [
            sys.executable, "-m", "tpu_captioner.cli.caption",
            "-i", str(img_path),
            "-m", ckpt_dir,
            "-wm", str(d / f"WORDMAP_{BASE}.json"),
            "-b", "3",
            "--out", str(out_png),
            "--csv", str(out_csv),
        ],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS=""),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert out_png.exists() and out_csv.exists()
    import pandas as pd

    df = pd.read_csv(out_csv)
    assert list(df.columns) == ["imageFile", "generatedCaption"]
    assert len(df) == 1

    # Directory mode with a PARTIAL group (3 images < group of 8): the batch
    # is padded to the fixed group size — one compiled program, but exactly
    # one CSV row per real image, and the single image's caption must match.
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for j in range(3):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(img_dir / f"im{j}.png")
    dir_csv = tmp_path / "dir_captions.csv"
    r2 = subprocess.run(
        [
            sys.executable, "-m", "tpu_captioner.cli.caption",
            "-i", str(img_dir),
            "-m", ckpt_dir,
            "-wm", str(d / f"WORDMAP_{BASE}.json"),
            "-b", "3",
            "--csv", str(dir_csv),
        ],
        capture_output=True, text=True, timeout=600,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS=""),
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    df2 = pd.read_csv(dir_csv)
    assert len(df2) == 3
    assert list(df2["imageFile"]) == ["im0.png", "im1.png", "im2.png"]
