"""Image encoder: ConvNeXt-Base features + adaptive pool to (B, 7, 7, 1024).

Mirrors the reference Encoder (models/encoder.py:14-34): forward gives the
same (batch, enc_size, enc_size, 1024) NHWC tensor the decoders consume — but
natively, without the NCHW->NHWC permute (encoder.py:26), because the whole
backbone already runs NHWC on TPU.

Image normalization (/255 then ImageNet mean/std — dataLoader.py:43-45,
train.py:152) happens on-device in ``preprocess_images`` so the host ships
uint8.

Staged fine-tuning (encoder.py:29-34) is expressed as a trainable-parameter
mask over the 8 ``features_*`` children rather than requires_grad mutation;
see ``fine_tune_mask``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_captioner.data.dataset import IMAGENET_MEAN, IMAGENET_STD
from tpu_captioner.models.convnext import ConvNeXtFeatures, adaptive_avg_pool_nhwc


def preprocess_images(images_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 NHWC -> normalized float NHWC, on device.

    Folds /255 into the mean/std affine so it is one fused multiply-add.
    """
    scale = (1.0 / (255.0 * IMAGENET_STD)).astype(dtype)
    bias = (-IMAGENET_MEAN / IMAGENET_STD).astype(dtype)
    return images_u8.astype(dtype) * jnp.asarray(scale) + jnp.asarray(bias)


class ConvNeXtEncoder(nn.Module):
    encoded_image_size: int = 7
    dtype: jnp.dtype = jnp.float32
    depths: tuple = (3, 3, 27, 3)
    dims: tuple = (128, 256, 512, 1024)
    pallas_mode: Any = "off"  # str or per-stage tuple (see ConvNeXtFeatures)
    remat: str = "auto"

    @nn.compact
    def __call__(self, images, *, deterministic: bool = True):
        """images: normalized float NHWC (B, H, W, 3).
        Returns (B, enc, enc, dims[-1])."""
        x = ConvNeXtFeatures(
            depths=self.depths, dims=self.dims, pallas_mode=self.pallas_mode,
            remat=self.remat, dtype=self.dtype, name="convnext"
        )(images, deterministic=deterministic)
        x = adaptive_avg_pool_nhwc(x, self.encoded_image_size)
        return x


def fine_tune_mask(
    params: Dict[str, Any], fine_tune: bool = True, starting_layer: int = 7
) -> Dict[str, Any]:
    """Boolean pytree: True where the encoder parameter is trainable.

    Matches Encoder.fine_tune (encoder.py:29-34): everything frozen, then
    children [starting_layer:] trainable iff ``fine_tune``.
    """

    def child_index(name: str) -> int:
        return int(name.split("_")[-1])

    def mask_child(name, sub):
        trainable = fine_tune and child_index(name) >= starting_layer
        return jax.tree_util.tree_map(lambda _: trainable, sub)

    out = {}
    for top, sub in params.items():
        if top == "convnext":
            out[top] = {name: mask_child(name, s) for name, s in sub.items()}
        else:
            out[top] = jax.tree_util.tree_map(lambda _: False, sub)
    return out
