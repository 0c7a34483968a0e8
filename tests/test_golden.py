"""Golden-value regression test (SURVEY §4: golden tests on fixed-seed
fixtures — the QA layer the reference approximated with committed CSVs of
paired same-seed runs).

Runs one epoch of the tiny fixed-seed transformer config and compares
metrics against ``tests/golden/tiny_transformer.json``.  Regenerate after an
intentional change with:

    REGEN_GOLDEN=1 python -m pytest tests/test_golden.py
"""

import json
import os

import numpy as np
import pytest

from tests.test_reproducibility import BASE, MAXLEN, make_exp
from tpu_captioner.data.build import build_synthetic_dataset
from tpu_captioner.train.loop import Trainer

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_transformer.json")


@pytest.mark.slow
def test_tiny_transformer_golden(tmp_path):
    d = tmp_path / "data"
    build_synthetic_dataset(
        str(d), num_images={"TRAIN": 16, "VAL": 8}, max_len=MAXLEN, image_size=32
    )
    exp = make_exp(tmp_path, "g")
    results = Trainer(exp, str(d), BASE, verbose=False).run()
    row = {
        k: results[0][k]
        for k in ("trainLoss", "trainTop5Acc", "valLoss", "valTop5Acc",
                  "bleu1", "bleu2", "bleu3", "bleu4")
    }
    if os.environ.get("REGEN_GOLDEN"):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(row, f, indent=2)
        pytest.skip("golden regenerated")
    with open(GOLDEN) as f:
        want = json.load(f)
    for k, v in want.items():
        np.testing.assert_allclose(row[k], v, rtol=1e-4, err_msg=k)
