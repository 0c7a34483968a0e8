"""Data layer: word-map semantics, builder round-trip on a toy Karpathy JSON,
dataset indexing, epoch-keyed shuffling, final-batch padding."""

import json
import os

import numpy as np
import pytest

from tpu_captioner.data.build import build_synthetic_dataset, create_input_files
from tpu_captioner.data.dataset import CaptionDataset, epoch_indices, iterate_batches
from tpu_captioner.data.vocab import build_word_map, encode_caption


def test_word_map_semantics():
    """Reference rules (utils/utils.py:82-87): words with freq > threshold in
    first-seen order from id 1; <unk>/<start>/<end> appended; <pad>=0."""
    caps = [
        ["b", "a", "b"],
        ["c", "a", "b"],
        ["d"],
    ]
    wm = build_word_map(caps, min_word_freq=1)
    # freq: b=3, a=2, c=1, d=1 -> kept (freq>1): b, a (first-seen order)
    assert wm["b"] == 1 and wm["a"] == 2
    assert wm["<unk>"] == 3 and wm["<start>"] == 4 and wm["<end>"] == 5
    assert wm["<pad>"] == 0
    assert "c" not in wm and "d" not in wm


def test_encode_caption():
    wm = build_word_map([["x", "y"], ["x", "y"]], min_word_freq=1)
    ids, caplen = encode_caption(["x", "z", "y"], wm, max_len=5)
    assert caplen == 5
    assert ids == [wm["<start>"], wm["x"], wm["<unk>"], wm["y"], wm["<end>"],
                   wm["<pad>"], wm["<pad>"]]
    assert len(ids) == 5 + 2


def _toy_karpathy(tmp_path, n_imgs=4):
    """Tiny Karpathy-format JSON + images on disk."""
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images = []
    words = ["cat", "dog", "sits", "runs", "fast", "big"]
    splits = ["train", "train", "val", "test"]
    for i in range(n_imgs):
        fname = f"im{i}.jpg"
        arr = rng.integers(0, 255, (40, 30, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / fname)
        sents = [
            {"tokens": [words[(i + j) % 6], words[(i + 2 * j + 1) % 6]]}
            for j in range(3)
        ]
        images.append({"filename": fname, "split": splits[i], "sentences": sents})
    j = tmp_path / "karpathy.json"
    with open(j, "w") as f:
        json.dump({"images": images}, f)
    return str(j), str(img_dir)


def test_create_input_files_roundtrip(tmp_path):
    jpath, imgdir = _toy_karpathy(tmp_path)
    out = tmp_path / "built"
    wm = create_input_files(
        "flickr8k", jpath, imgdir,
        captions_per_image=5, min_word_freq=0, output_folder=str(out), max_len=10,
    )
    base = "flickr8k_5_cap_per_img_0_min_word_freq"
    with open(out / f"WORDMAP_{base}.json") as f:
        assert json.load(f) == wm
    for split, n in [("TRAIN", 2), ("VAL", 1), ("TEST", 1)]:
        imgs = np.load(out / f"{split}_IMAGES_{base}.npy")
        caps = np.load(out / f"{split}_CAPTIONS_{base}.npy")
        lens = np.load(out / f"{split}_CAPLENS_{base}.npy")
        assert imgs.shape == (n, 256, 256, 3) and imgs.dtype == np.uint8
        assert caps.shape == (n * 5, 12) and caps.dtype == np.int32
        assert lens.shape == (n * 5,)
        # Every caption: <start> ... <end> ... <pad>; caplen = tokens + 2.
        for row, ln in zip(caps, lens):
            assert row[0] == wm["<start>"]
            assert row[ln - 1] == wm["<end>"]
            assert all(x == wm["<pad>"] for x in row[ln:])
    ds = CaptionDataset(str(out), base, "VAL")
    assert len(ds) == 5
    batch = ds.gather(np.arange(3))
    assert batch.images.shape == (3, 256, 256, 3)
    assert batch.all_captions.shape == (3, 5, 12)


def test_caption_indexing_image_sharing(tmp_path):
    build_synthetic_dataset(
        str(tmp_path), num_images={"TRAIN": 4}, max_len=8, image_size=16
    )
    base = "synthetic_5_cap_per_img_1_min_word_freq"
    ds = CaptionDataset(str(tmp_path), base, "TRAIN")
    assert len(ds) == 20  # captions, not images (dataLoader.py:55-56)
    b = ds.gather(np.array([0, 1, 4, 5]))
    # Captions 0,1,4 share image 0; caption 5 is image 1 (i // cpi).
    np.testing.assert_array_equal(b.images[0], b.images[1])
    np.testing.assert_array_equal(b.images[0], b.images[2])
    assert not np.array_equal(b.images[0], b.images[3])


def test_epoch_shuffle_deterministic_and_distinct():
    a = epoch_indices(100, epoch=3, seed=42)
    b = epoch_indices(100, epoch=3, seed=42)
    c = epoch_indices(100, epoch=4, seed=42)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    np.testing.assert_array_equal(np.sort(a), np.arange(100))


def test_final_batch_padding(tmp_path):
    build_synthetic_dataset(
        str(tmp_path), num_images={"TRAIN": 2}, max_len=8, image_size=16
    )
    base = "synthetic_5_cap_per_img_1_min_word_freq"
    ds = CaptionDataset(str(tmp_path), base, "TRAIN")  # 10 captions
    batches = list(iterate_batches(ds, 4, epoch=0, shuffle=False))
    assert len(batches) == 3
    assert all(b.images.shape[0] == 4 for b in batches)
    assert batches[-1].valid.tolist() == [True, True, False, False]
    assert batches[0].valid.all()


def test_reference_hdf5_artifacts_read_directly(tmp_path):
    """Reference-format HDF5 + JSON artifacts (utils/utils.py:102-160 output
    layout) load without conversion, images transposed CHW -> HWC."""
    import h5py

    base = "coco_5_cap_per_img_5_min_word_freq"
    rng = np.random.default_rng(0)
    imgs_chw = rng.integers(0, 256, (3, 3, 16, 16), dtype=np.uint8)
    with h5py.File(tmp_path / f"VAL_IMAGES_{base}.hdf5", "w") as h:
        h.attrs["captions_per_image"] = 5
        h.create_dataset("images", data=imgs_chw)
    caps = rng.integers(0, 40, (15, 12)).astype(int).tolist()
    lens = rng.integers(3, 12, (15,)).astype(int).tolist()
    (tmp_path / f"VAL_CAPTIONS_{base}.json").write_text(json.dumps(caps))
    (tmp_path / f"VAL_CAPLENS_{base}.json").write_text(json.dumps(lens))

    ds = CaptionDataset(str(tmp_path), base, "VAL")
    assert len(ds) == 15 and ds.cpi == 5
    batch = ds.gather(np.array([0, 6, 14]))
    np.testing.assert_array_equal(
        batch.images, imgs_chw[[0, 1, 2]].transpose(0, 2, 3, 1)
    )
    np.testing.assert_array_equal(batch.captions, np.asarray(caps)[[0, 6, 14]])
    assert batch.all_captions.shape == (3, 5, 12)


def test_builder_deterministic_sampling(tmp_path):
    """seed(123) caption sampling (utils/utils.py:97,117-120): two builds of
    the same inputs produce byte-identical caption records (covers both the
    duplication and subsampling paths)."""
    from PIL import Image

    img_dir = tmp_path / "im"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    images = []
    for i in range(3):
        fn = f"x{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)
        ).save(img_dir / fn)
        n_caps = [2, 5, 9][i]  # fewer / exact / more than cpi=5
        sents = [
            {"tokens": [f"w{(i + j) % 7}", f"w{(2 * j) % 7}"]} for j in range(n_caps)
        ]
        images.append({"filename": fn, "split": "train", "sentences": sents})
    j = tmp_path / "k.json"
    j.write_text(json.dumps({"images": images}))

    outs = []
    for tag in ("a", "b"):
        out = tmp_path / tag
        create_input_files(
            "flickr8k", str(j), str(img_dir), 5, 0, str(out), max_len=6
        )
        outs.append(
            np.load(out / "TRAIN_CAPTIONS_flickr8k_5_cap_per_img_0_min_word_freq.npy")
        )
    np.testing.assert_array_equal(outs[0], outs[1])
    assert outs[0].shape == (15, 8)
