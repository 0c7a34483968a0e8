"""CLI surfaces and host-side visualization utilities."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def run_cli(mod, *args):
    return subprocess.run(
        [sys.executable, "-m", mod, *args],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS=""),
    )


@pytest.mark.parametrize(
    "mod",
    [
        "tpu_captioner.cli.train",
        "tpu_captioner.cli.test",
        "tpu_captioner.cli.caption",
        "tpu_captioner.cli.build_data",
        "tpu_captioner.cli.graphs",
    ],
)
def test_cli_help(mod):
    r = run_cli(mod, "--help")
    assert r.returncode == 0, r.stderr
    assert "usage" in r.stdout.lower()


def test_build_data_synthetic_cli(tmp_path):
    out = tmp_path / "syn"
    r = run_cli(
        "tpu_captioner.cli.build_data", "synthetic",
        "--outputFolder", str(out), "--maxLen", "8",
    )
    assert r.returncode == 0, r.stderr
    base = "synthetic_5_cap_per_img_1_min_word_freq"
    assert (out / f"WORDMAP_{base}.json").exists()
    assert (out / f"TRAIN_IMAGES_{base}.npy").exists()


def test_visualize_att_writes_png(tmp_path):
    from tpu_captioner.infer.visualize import upsample_alpha, visualize_att

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    seq = [3, 1, 2, 4]
    alphas = rng.random((4, 49)).astype(np.float32)
    alphas /= alphas.sum(-1, keepdims=True)
    rev = {0: "<pad>", 1: "a", 2: "dog", 3: "<start>", 4: "<end>"}
    out = tmp_path / "att.png"
    words = visualize_att(img, seq, alphas, rev, out_path=str(out))
    assert words == ["<start>", "a", "dog", "<end>"]
    assert out.exists() and out.stat().st_size > 1000

    up = upsample_alpha(alphas[0].reshape(7, 7))
    assert up.shape == (168, 168)


def test_graphs_functions(tmp_path):
    import pandas as pd

    from tpu_captioner.cli.graphs import (
        bleu_curves,
        caption_length_histogram,
        finetune_sweep,
        loss_curves,
        word_frequency_chart,
    )

    # Metrics CSV fixtures.
    df = pd.DataFrame(
        {
            "epoch": [0, 1, 2],
            "trainLoss": [5.0, 4.0, 3.5],
            "valLoss": [5.2, 4.4, 4.0],
            "bleu4": [0.01, 0.05, 0.09],
        }
    )
    csv = tmp_path / "metrics.csv"
    df.to_csv(csv, index=False)
    loss_curves([str(csv)], None, str(tmp_path / "loss.png"))
    bleu_curves([str(csv)], ["run"], str(tmp_path / "bleu.png"))
    assert (tmp_path / "loss.png").exists() and (tmp_path / "bleu.png").exists()
    # Fine-tune-sweep comparison figure (makingGraphs.py:154-202).
    finetune_sweep(
        [str(csv), str(csv)], ["No Fine-tuning", "Layers 5-7, LR=1e-4"],
        str(tmp_path / "ft.png"),
    )
    assert (tmp_path / "ft.png").stat().st_size > 1000

    wm = {"<pad>": 0, "dog": 1, "cat": 2, "the": 3, "<unk>": 4, "<start>": 5, "<end>": 6}
    (tmp_path / "wm.json").write_text(json.dumps(wm))
    caps = np.array([[5, 1, 2, 6, 0], [5, 2, 2, 6, 0]], dtype=np.int32)
    np.save(tmp_path / "caps.npy", caps)
    word_frequency_chart(
        str(tmp_path / "caps.npy"), str(tmp_path / "wm.json"),
        str(tmp_path / "freq.png"), top_n=3,
    )
    np.save(tmp_path / "lens.npy", np.array([4, 4], dtype=np.int32))
    caption_length_histogram(str(tmp_path / "lens.npy"), str(tmp_path / "hist.png"))
    assert (tmp_path / "freq.png").exists() and (tmp_path / "hist.png").exists()
