"""Attention-map visualization (reference caption.py:386-416 visualize_att).

Renders the generated caption word-by-word over the image with the 7x7
attention map upsampled 24x.  The reference uses
skimage.transform.pyramid_expand(upscale=24, sigma=8); skimage is not a
dependency here, so the same operation is built from scipy: nearest/linear
upsample followed by a gaussian blur with the same sigma (pyramid_expand is
exactly zoom + gaussian smoothing).  First frame (<start>) renders the bare
image (alpha overlay 0), later frames use overlay alpha 0.8 and the Greys_r
colormap, 5 columns, 50-word cap — all as in the reference.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def upsample_alpha(
    alpha_2d: np.ndarray, upscale: int = 24, sigma: float = 8.0, smooth: bool = True
) -> np.ndarray:
    """7x7 -> (7*upscale)^2 attention map (pyramid_expand equivalent)."""
    from scipy import ndimage

    up = ndimage.zoom(alpha_2d, upscale, order=1)
    if smooth:
        up = ndimage.gaussian_filter(up, sigma=sigma)
    return up


def visualize_att(
    image,  # path or (H, W, 3) uint8 array
    seq: Sequence[int],
    alphas: np.ndarray,  # (len(seq), P)
    rev_word_map: Dict[int, str],
    smooth: bool = True,
    enc_image_size: int = 7,
    out_path: Optional[str] = None,
    show: bool = False,
) -> List[str]:
    """Render the per-word attention grid; returns the caption words."""
    import matplotlib

    if out_path is not None and not show:
        matplotlib.use("Agg")
    import matplotlib.cm as cm
    import matplotlib.pyplot as plt
    from PIL import Image

    if isinstance(image, (str, bytes)):
        img = Image.open(image)
    else:
        img = Image.fromarray(np.asarray(image))
    side = enc_image_size * 24
    img = img.resize([side, side], Image.Resampling.LANCZOS)

    words = [rev_word_map[int(i)] for i in seq]
    num_cols = 5
    num_rows = int(np.ceil(len(words) / num_cols))
    print("Caption:", " ".join(words))

    plt.figure(figsize=(num_cols * 2.2, num_rows * 2.4))
    for t, word in enumerate(words):
        if t > 50:
            break
        plt.subplot(num_rows, num_cols, t + 1)
        plt.text(
            0, 1.09, word, color="black", backgroundcolor="white",
            fontsize=12, va="bottom", transform=plt.gca().transAxes,
        )
        plt.imshow(img)
        cur = np.asarray(alphas[t]).reshape(enc_image_size, enc_image_size)
        up = upsample_alpha(cur, 24, 8.0, smooth)
        plt.imshow(up, alpha=0.0 if t == 0 else 0.8)
        plt.set_cmap(cm.Greys_r)
        plt.axis("off")
    plt.subplots_adjust(hspace=0.05)
    if out_path is not None:
        plt.savefig(out_path, bbox_inches="tight")
        plt.close()
    elif show:
        plt.show()
    return words
