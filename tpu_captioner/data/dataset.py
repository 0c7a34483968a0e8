"""In-memory/memmap caption dataset (reference dataLoader.py:15-56).

Indexing follows the reference exactly: item ``i`` is caption ``i`` paired
with image ``i // captions_per_image``; ``len(dataset)`` is the number of
captions, not images (dataLoader.py:43,55-56).  VAL/TEST items also carry all
``cpi`` reference captions of their image for BLEU (dataLoader.py:51-53).

TPU-first departures:
- images stay **uint8 NHWC** on host; the /255 + ImageNet normalization
  (dataLoader.py:43-45, train.py:152) runs on-device inside the jitted step,
  cutting host->device transfer 4x;
- batches are fixed-shape; a short final batch is padded with wrap-around
  samples and flagged via a ``valid`` mask instead of shrinking the batch.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, Iterator

import numpy as np

# ImageNet statistics used by the reference transform (train.py:152).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


@dataclass
class Batch:
    """One training batch: uint8 images + int32 captions/lengths + valid mask."""

    images: np.ndarray  # (B, H, W, 3) uint8
    captions: np.ndarray  # (B, L) int32
    caplens: np.ndarray  # (B,) int32
    valid: np.ndarray  # (B,) bool — False for wrap-around padding rows

    def as_dict(self) -> Dict[str, np.ndarray]:
        return {
            "images": self.images,
            "captions": self.captions,
            "caplens": self.caplens,
            "valid": self.valid,
        }


@dataclass
class EvalBatch(Batch):
    all_captions: np.ndarray = None  # (B, cpi, L) int32

    def as_dict(self) -> Dict[str, np.ndarray]:
        d = super().as_dict()
        d["all_captions"] = self.all_captions
        return d


class CaptionDataset:
    def __init__(self, data_folder: str, data_name: str, split: str):
        assert split in {"TRAIN", "VAL", "TEST"}
        self.split = split
        self.data_folder = data_folder
        self.data_name = data_name
        self._h5 = None

        npy = os.path.join(data_folder, f"{split}_IMAGES_{data_name}.npy")
        h5 = os.path.join(data_folder, f"{split}_IMAGES_{data_name}.hdf5")
        if os.path.exists(npy):
            self.images = np.load(npy, mmap_mode="r")
            self.captions = np.load(
                os.path.join(data_folder, f"{split}_CAPTIONS_{data_name}.npy")
            )
            self.caplens = np.load(
                os.path.join(data_folder, f"{split}_CAPLENS_{data_name}.npy")
            )
            with open(
                os.path.join(data_folder, f"{split}_META_{data_name}.json")
            ) as f:
                meta = json.load(f)
            self.cpi = int(meta["captions_per_image"])
            n_images = self.images.shape[0]
        elif os.path.exists(h5):
            # Drop-in read of REFERENCE-format artifacts (utils/utils.py
            # :102-160 outputs): NCHW uint8 HDF5 + caption/caplen JSONs.
            # Images are transposed to NHWC lazily per batch.
            import h5py

            self._h5_path = h5
            with h5py.File(h5, "r") as h:
                self.cpi = int(h.attrs["captions_per_image"])
                n_images = h["images"].shape[0]
            with open(
                os.path.join(data_folder, f"{split}_CAPTIONS_{data_name}.json")
            ) as f:
                self.captions = np.asarray(json.load(f), dtype=np.int32)
            with open(
                os.path.join(data_folder, f"{split}_CAPLENS_{data_name}.json")
            ) as f:
                self.caplens = np.asarray(json.load(f), dtype=np.int32)
            self.images = None
        else:
            raise FileNotFoundError(
                f"no {split} image records ({npy} or reference-format {h5})"
            )
        assert len(self.captions) == len(self.caplens)
        assert len(self.captions) == n_images * self.cpi

    def __len__(self) -> int:
        return len(self.captions)

    @property
    def max_caption_len(self) -> int:
        return self.captions.shape[1]

    def _gather_images_h5(self, img_idx: np.ndarray) -> np.ndarray:
        if self._h5 is None:
            import h5py

            # Lazy per-process open, like the reference's per-worker handle
            # (dataLoader.py:39-41).
            self._h5 = h5py.File(self._h5_path, "r")["images"]
        imgs = np.stack([self._h5[int(i)] for i in img_idx])  # (B, 3, H, W)
        return np.ascontiguousarray(imgs.transpose(0, 2, 3, 1))

    def gather(self, indices: np.ndarray) -> Batch:
        """Materialise a batch for caption indices (memmap gather; C++
        thread-pool fast path when the native lib is built)."""
        from tpu_captioner.native.gather import gather_batch_native

        img_idx = indices // self.cpi
        if self.images is None:
            images = self._gather_images_h5(img_idx)
            captions = self.captions[indices]
            caplens = self.caplens[indices]
        else:
            images, captions, caplens = gather_batch_native(
                self.images, self.captions, self.caplens, img_idx, indices
            )
        valid = np.ones(len(indices), dtype=bool)
        if self.split == "TRAIN":
            return Batch(images, captions, caplens, valid)
        # VAL/TEST: all cpi captions of each image (dataLoader.py:51-53).
        base = (img_idx * self.cpi)[:, None] + np.arange(self.cpi)[None, :]
        all_caps = self.captions[base]
        return EvalBatch(images, captions, caplens, valid, all_caps)


def epoch_indices(
    n: int,
    epoch: int,
    seed: int = 42,
    shuffle: bool = True,
) -> np.ndarray:
    """Deterministic epoch-keyed permutation, replacing DistributedSampler's
    seed+epoch shuffle (trainMultiGPU.py:240,248)."""
    if not shuffle:
        return np.arange(n)
    rng = np.random.default_rng(seed + epoch)
    return rng.permutation(n)


def iterate_batches(
    dataset: CaptionDataset,
    global_batch: int,
    epoch: int = 0,
    seed: int = 42,
    shuffle: bool = True,
    pad_final: bool = True,
    shard: tuple = (0, 1),
) -> Iterator[Batch]:
    """Yield fixed-shape global batches.  The final short batch is padded with
    wrap-around rows marked invalid (so jitted steps see one static shape).

    ``shard=(index, count)``: gather only this process's contiguous rows of
    every global batch (multi-host data loading — replaces the reference's
    DistributedSampler rank split, trainMultiGPU.py:240-245; the epoch index
    order is identical on every host, so shards are disjoint and complete).
    """
    sh_i, sh_n = shard
    if global_batch % sh_n != 0:
        raise ValueError(f"global_batch {global_batch} not divisible by {sh_n}")
    per = global_batch // sh_n
    idx = epoch_indices(len(dataset), epoch, seed, shuffle)
    n = len(idx)
    for s in range(0, n, global_batch):
        chunk = idx[s : s + global_batch]
        pad = global_batch - len(chunk)
        if pad > 0:
            if not pad_final:
                break
            chunk = np.concatenate([chunk, idx[:pad]])
        local = chunk[sh_i * per : (sh_i + 1) * per]
        batch = dataset.gather(local)
        if pad > 0:
            # Wrap-around padding occupies the global tail; flag the rows of
            # THIS shard that fall inside it.
            start = sh_i * per
            local_pad_from = max(0, (global_batch - pad) - start)
            batch.valid[local_pad_from:] = False
        yield batch


def normalize_images_host(images_u8: np.ndarray) -> np.ndarray:
    """Host-side reference normalization (for tests / CPU paths only)."""
    x = images_u8.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD
