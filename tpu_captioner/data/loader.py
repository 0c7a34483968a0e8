"""Sharded, double-buffered host->device input pipeline.

Replaces the reference's 6-worker torch DataLoader with pinned memory
(train.py:155, trainMultiGPU.py:241): a background thread gathers memmap
batches and places them on the device mesh ahead of the compute stream, so
the TPU never waits on the host (the reference measured 0.047 -> 0.0005
s/batch going 0 -> 6 workers; here one producer thread + on-device
normalization achieves the same overlap).
"""

from __future__ import annotations

import queue
import threading
import warnings
from typing import Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_captioner.data.dataset import Batch, CaptionDataset, iterate_batches


def batch_sharding(mesh: Optional[Mesh]):
    if mesh is None:
        return None
    return NamedSharding(mesh, P("data"))


def device_put_batch(batch: Batch, mesh: Optional[Mesh]):
    """Transfer a host batch to device(s), sharding the leading axis over the
    'data' mesh axis.  Images stay uint8 until the jitted step normalizes.

    On the mesh path the host data is treated as this PROCESS's rows of the
    global batch (`jax.make_array_from_process_local_data`): single-process
    that is the whole batch; on a multi-host pod each process contributes
    its contiguous shard (see ``iterate_batches(shard=...)``) and the
    assembled array is globally sharded without any host gathering."""
    sharding = batch_sharding(mesh)
    d = batch.as_dict()
    if sharding is None:
        return {k: jax.device_put(v) for k, v in d.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in d.items()
    }


def prefetch_to_device(
    host_iter: Iterator[Batch],
    mesh: Optional[Mesh] = None,
    depth: int = 2,
):
    """Wrap a host batch iterator with a background producer thread that keeps
    ``depth`` batches resident on device.

    If the consumer abandons the iterator early (exception mid-epoch,
    generator close), the producer is signalled to stop and joined — it does
    not linger holding device buffers on the bounded queue."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()
    err: list = []

    def producer():
        try:
            for b in host_iter:
                item = device_put_batch(b, mesh)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except Exception as e:  # surface loader errors to the consumer
            err.append(e)
        finally:
            # The sentinel must not be dropped when the queue is full (the
            # consumer would drain the items then wait forever); block until
            # there is room, bailing out only if the consumer signalled stop.
            while not stop.is_set():
                try:
                    q.put(_END, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        # Drain so a blocked producer can observe `stop` and exit promptly;
        # its in-flight put may land in a slot the drain just freed, so keep
        # draining until the thread is gone, then sweep once more so no
        # device-resident batch stays referenced by the queue.
        deadline = 50  # x 0.1s join timeout = 5s total
        while True:
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=0.1)
            deadline -= 1
            if not t.is_alive():
                break
            if deadline <= 0:
                # A producer wedged inside device_put (e.g. a hung transfer)
                # survives as a daemon thread holding device buffers; say so
                # instead of leaking it silently.
                warnings.warn(
                    "prefetch producer thread still alive after 5s shutdown "
                    "deadline; abandoning it (device buffers may stay "
                    "referenced until process exit)",
                    RuntimeWarning,
                )
                break
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


class ShardedLoader:
    """Epoch-aware loader: deterministic seed+epoch shuffle, fixed global batch
    sharded over the mesh 'data' axis, device prefetch."""

    def __init__(
        self,
        dataset: CaptionDataset,
        global_batch: int,
        mesh: Optional[Mesh] = None,
        seed: int = 42,
        shuffle: bool = True,
        prefetch_depth: int = 2,
    ):
        if mesh is not None:
            n_shards = mesh.shape["data"]
            if global_batch % n_shards != 0:
                raise ValueError(
                    f"global_batch {global_batch} not divisible by data axis {n_shards}"
                )
        self.dataset = dataset
        self.global_batch = global_batch
        self.mesh = mesh
        self.seed = seed
        self.shuffle = shuffle
        self.prefetch_depth = prefetch_depth

    def __len__(self) -> int:
        n = len(self.dataset)
        return (n + self.global_batch - 1) // self.global_batch

    def epoch(self, epoch: int):
        host = iterate_batches(
            self.dataset,
            self.global_batch,
            epoch=epoch,
            seed=self.seed,
            shuffle=self.shuffle,
            # Multi-host: every process reads only its contiguous slice of
            # each global batch (single-process: the whole batch).
            shard=(jax.process_index(), jax.process_count()),
        )
        return prefetch_to_device(host, self.mesh, self.prefetch_depth)
