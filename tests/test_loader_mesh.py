"""ShardedLoader over an 8-device mesh: sharding layout, prefetch pipeline,
eval batches, and determinism across epochs."""

import numpy as np
import pytest

import jax

from tpu_captioner.data.build import build_synthetic_dataset
from tpu_captioner.data.dataset import CaptionDataset
from tpu_captioner.data.loader import ShardedLoader
from tpu_captioner.parallel.mesh import make_mesh

BASE = "synthetic_5_cap_per_img_1_min_word_freq"


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("loader")
    build_synthetic_dataset(
        str(d), num_images={"TRAIN": 8, "VAL": 4}, max_len=8, image_size=16
    )
    return str(d)


def test_sharded_loader_train(data_dir):
    mesh = make_mesh(8)
    ds = CaptionDataset(data_dir, BASE, "TRAIN")  # 40 captions
    loader = ShardedLoader(ds, global_batch=16, mesh=mesh, shuffle=True)
    assert len(loader) == 3
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    for b in batches:
        assert b["images"].shape == (16, 16, 16, 3)
        # Leading axis sharded over the 8 devices.
        assert len(b["images"].sharding.device_set) == 8
        assert b["captions"].shape == (16, 10)
    # Final batch padding (40 = 2*16 + 8): last 8 rows invalid.
    valid = np.asarray(batches[-1]["valid"])
    assert valid.sum() == 8 and not valid[8:].any()


def test_sharded_loader_eval_and_determinism(data_dir):
    mesh = make_mesh(8)
    ds = CaptionDataset(data_dir, BASE, "VAL")
    loader = ShardedLoader(ds, global_batch=8, mesh=mesh, shuffle=True, seed=7)
    e0a = [np.asarray(b["captions"]) for b in loader.epoch(0)]
    e0b = [np.asarray(b["captions"]) for b in loader.epoch(0)]
    e1 = [np.asarray(b["captions"]) for b in loader.epoch(1)]
    for a, b in zip(e0a, e0b):
        np.testing.assert_array_equal(a, b)
    assert any(not np.array_equal(a, b) for a, b in zip(e0a, e1))
    batch = next(iter(loader.epoch(0)))
    assert "all_captions" in batch
    assert batch["all_captions"].shape == (8, 5, 10)


def test_shard_slices_reassemble_global_batches(data_dir):
    """iterate_batches(shard=(i, n)) on every i must concatenate to exactly
    the unsharded global batches — same rows, same valid flags (the
    multi-host DistributedSampler-equivalent split)."""
    from tpu_captioner.data.dataset import iterate_batches

    ds = CaptionDataset(data_dir, BASE, "TRAIN")  # 40 captions
    gb = 16  # 40 = 2 full batches + padded final (8 real rows)
    full = list(iterate_batches(ds, gb, epoch=3, shuffle=True))
    n = 4
    sharded = [
        list(iterate_batches(ds, gb, epoch=3, shuffle=True, shard=(i, n)))
        for i in range(n)
    ]
    for b, want in enumerate(full):
        got_caps = np.concatenate([sharded[i][b].captions for i in range(n)])
        got_valid = np.concatenate([sharded[i][b].valid for i in range(n)])
        got_imgs = np.concatenate([sharded[i][b].images for i in range(n)])
        np.testing.assert_array_equal(got_caps, want.captions)
        np.testing.assert_array_equal(got_valid, want.valid)
        np.testing.assert_array_equal(got_imgs, want.images)

    with pytest.raises(ValueError):
        next(iterate_batches(ds, 10, shard=(0, 4)))  # 10 % 4 != 0


def test_abandoned_epoch_stops_producer(data_dir):
    """Dropping the epoch iterator mid-epoch must terminate the prefetch
    producer thread (it must not linger blocked on the bounded queue)."""
    import threading
    import time

    ds = CaptionDataset(data_dir, BASE, "TRAIN")
    loader = ShardedLoader(ds, global_batch=8, prefetch_depth=1)
    before = {t.ident for t in threading.enumerate()}
    it = loader.epoch(0)
    next(it)  # producer is now alive, possibly blocked on a full queue
    it.close()  # consumer abandons the epoch
    deadline = time.time() + 10
    while time.time() < deadline:
        alive = [
            t for t in threading.enumerate()
            if t.ident not in before and t.is_alive()
        ]
        if not alive:
            break
        time.sleep(0.05)
    assert not alive, f"prefetch producer still alive: {alive}"


def test_prefetch_propagates_loader_errors(data_dir):
    from tpu_captioner.data.loader import prefetch_to_device

    def failing():
        raise ValueError("boom")
        yield  # pragma: no cover — makes this a generator

    with pytest.raises(ValueError, match="boom"):
        list(prefetch_to_device(failing()))


def test_indivisible_batch_rejected(data_dir):
    mesh = make_mesh(8)
    ds = CaptionDataset(data_dir, BASE, "TRAIN")
    with pytest.raises(ValueError):
        ShardedLoader(ds, global_batch=12, mesh=mesh)
