"""Native threaded batch gather (falls back to numpy fancy indexing).

Drop-in accelerated path for CaptionDataset.gather: memcpy B image rows +
caption rows into contiguous batch buffers with a C++ thread pool
(native/dataloader.cpp) — the role torch's DataLoader worker pool plays for
the reference (train.py:155).
"""

from __future__ import annotations

import ctypes as c
import os

import numpy as np

from tpu_captioner.native.lib import get_lib


def gather_batch_native(
    images: np.ndarray,  # (N, H, W, 3) uint8, C-contiguous (memmap ok)
    captions: np.ndarray,  # (M, L) int32
    caplens: np.ndarray,  # (M,) int32
    img_indices: np.ndarray,
    cap_indices: np.ndarray,
    n_threads: int = 0,
):
    lib = get_lib()
    B = len(cap_indices)
    if lib is None:
        return (
            np.ascontiguousarray(images[img_indices]),
            captions[cap_indices],
            caplens[cap_indices],
        )
    n_threads = n_threads or min(8, os.cpu_count() or 1)
    H, W, _ = images.shape[1:]
    out_images = np.empty((B, H, W, 3), dtype=np.uint8)
    out_captions = np.empty((B, captions.shape[1]), dtype=np.int32)
    out_caplens = np.empty((B,), dtype=np.int32)
    img_idx = np.ascontiguousarray(img_indices, dtype=np.int64)
    cap_idx = np.ascontiguousarray(cap_indices, dtype=np.int64)
    captions = np.ascontiguousarray(captions, dtype=np.int32)
    caplens = np.ascontiguousarray(caplens, dtype=np.int32)

    def p(arr, typ):
        return arr.ctypes.data_as(c.POINTER(typ))

    lib.gather_batch(
        images.ctypes.data_as(c.POINTER(c.c_uint8)),
        H * W * 3,
        p(captions, c.c_int32),
        p(caplens, c.c_int32),
        captions.shape[1],
        p(img_idx, c.c_int64),
        p(cap_idx, c.c_int64),
        B,
        p(out_images, c.c_uint8),
        p(out_captions, c.c_int32),
        p(out_caplens, c.c_int32),
        n_threads,
    )
    return out_images, out_captions, out_caplens
