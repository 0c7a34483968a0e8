"""Subprocess worker for tests/test_distributed_real.py.

Runs the REAL multi-process distributed path — `jax.distributed.initialize`
on the CPU backend (Gloo collectives), 4 local + 8 global devices per the
parent's env — through the full Trainer: per-process shard reads
(iterate_batches shard=...), `make_array_from_process_local_data` batch
assembly, sharded train/eval steps, `process_allgather` of eval outputs,
BLEU on the coordinator, and `broadcast_one_to_all` of the scores
(reference counterparts: trainMultiGPU.py:143-158, 110-131, 325-327).

Invoked as: python tests/distributed_worker.py <pid> <nproc> <port> \
    <data_dir> <out_json> [<workdir>]
"""

import json
import os
import sys
import time

T0 = time.time()


def log(msg):
    print(f"[worker +{time.time() - T0:.0f}s] {msg}", flush=True)


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, data_dir, out_path = sys.argv[3], sys.argv[4], sys.argv[5]
    workdir = sys.argv[6] if len(sys.argv) > 6 else out_path + ".d"

    import jax

    log(f"initializing distributed pid={pid}")
    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    log("distributed up")
    assert jax.process_count() == nproc
    assert jax.process_index() == pid

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.test_train_loop import BASE, tiny_model_cfg, tiny_train_cfg
    from tpu_captioner.core.config import DataConfig, ExperimentConfig
    from tpu_captioner.parallel.mesh import make_mesh
    from tpu_captioner.train.loop import Trainer

    mesh = make_mesh()  # all 8 global devices
    exp = ExperimentConfig(
        data=DataConfig(batch_size=1, image_size=32),
        model=tiny_model_cfg(0),
        train=tiny_train_cfg(
            epochs=1,
            batch_size=1,  # x8 mesh shards = global batch 8
            # One SHARED checkpoint dir: the Orbax save is collective, every
            # process enters it against the same path (see train/checkpoint).
            checkpoint_dir=os.path.join(workdir, "ckpt_multi"),
            results_dir=os.path.join(workdir, f"results{pid}"),
        ),
    )
    tr = Trainer(exp, data_dir, BASE, mesh=mesh, verbose=False)
    log("trainer built; running")
    results = tr.run()
    log("trainer done")
    with open(out_path, "w") as f:
        json.dump(
            {
                "pid": pid,
                "process_count": jax.process_count(),
                "local_devices": jax.local_device_count(),
                "global_devices": len(jax.devices()),
                "results": results,
            },
            f,
        )


if __name__ == "__main__":
    main()
