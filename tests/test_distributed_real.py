"""REAL multi-process distributed execution (no mocks).

Spawns two OS processes that each call `jax.distributed.initialize` on the
CPU backend (4 virtual devices each -> 8 global), run the full Trainer over
the shared 8-way 'data' mesh, and writes their results.  Asserts both
processes produce identical results that match a single-process 8-device run
of the same config — certifying the per-process shard reads,
`make_array_from_process_local_data` assembly, `process_allgather` eval
gather, coordinator-only BLEU, and `broadcast_one_to_all` paths that
tests/test_collectives.py can only exercise under monkeypatch.

Reference counterpart: trainMultiGPU.py:143-158 (2-process NCCL init),
110-131 (pickle all_gather), 325-327 (counter broadcast).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def test_two_process_trainer_matches_single_process(tmp_path_factory):
    from tests.test_train_loop import BASE, MAXLEN, tiny_model_cfg, tiny_train_cfg
    from tpu_captioner.core.config import DataConfig, ExperimentConfig
    from tpu_captioner.data.build import build_synthetic_dataset
    from tpu_captioner.parallel.mesh import make_mesh
    from tpu_captioner.train.loop import Trainer

    data_dir = tmp_path_factory.mktemp("dist_data")
    work = tmp_path_factory.mktemp("dist_work")
    build_synthetic_dataset(
        str(data_dir),
        num_images={"TRAIN": 16, "VAL": 8, "TEST": 8},
        max_len=MAXLEN,
        image_size=32,
    )

    # --- single-process 8-device baseline (in this process) ----------------
    exp = ExperimentConfig(
        data=DataConfig(batch_size=1, image_size=32),
        model=tiny_model_cfg(0),
        train=tiny_train_cfg(
            epochs=1,
            batch_size=1,  # x8 shards = global batch 8 (matches the workers)
            checkpoint_dir=str(work / "ckpt_single"),
            results_dir=str(work / "results_single"),
        ),
    )
    tr = Trainer(exp, str(data_dir), BASE, mesh=make_mesh(8), verbose=False)
    base_results = tr.run()
    assert len(base_results) == 1

    # --- two real processes -------------------------------------------------
    port = str(29650 + os.getpid() % 211)
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",  # keep the axon TPU relay out of the workers
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    outs = [str(work / f"proc{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [
                sys.executable, os.path.join(REPO, "tests", "distributed_worker.py"),
                str(i), "2", port, str(data_dir), outs[i], str(work),
            ],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    payloads = []
    for path in outs:
        with open(path) as f:
            payloads.append(json.load(f))
    for i, pay in enumerate(payloads):
        assert pay["process_count"] == 2
        assert pay["local_devices"] == 4
        assert pay["global_devices"] == 8
        assert len(pay["results"]) == 1, pay

    # Both processes must agree exactly (replicated metrics + broadcast BLEU)
    # — modulo wall-clock meter fields, which are process-local by nature.
    def strip_times(rows):
        return [
            {k: v for k, v in r.items()
             if k not in ("trainBatchTime", "trainDataTime")}
            for r in rows
        ]

    assert strip_times(payloads[0]["results"]) == strip_times(payloads[1]["results"])

    # And match the single-process run: same global batches, same RNG keys,
    # same 8-way-partitioned program — only the process topology differs.
    for row_multi, row_single in zip(payloads[0]["results"], base_results):
        assert row_multi["epoch"] == row_single["epoch"]
        for key in ("trainLoss", "valLoss", "trainTop5Acc", "valTop5Acc"):
            np.testing.assert_allclose(
                row_multi[key], row_single[key], rtol=2e-5, err_msg=key
            )
        for key in ("bleu1", "bleu2", "bleu3", "bleu4"):
            np.testing.assert_allclose(
                row_multi[key], row_single[key], atol=1e-9, err_msg=key
            )
