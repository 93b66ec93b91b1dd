"""Visualization grids (reference: trainers' log_images_* / save_train_images).

PIL-only: id maps are colorized with the PASCAL colormap; rows of images are
stacked into overview grids (rgb / gt / pred / noisy / sampled / inpaint).
The detectron2 overlay (utils.py:289-353) is approximated by alpha-blending
the colorized panoptic map over the RGB image.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from ldmseg_tpu.data.encodings import color_map


def colorize_ids(id_map: np.ndarray, cmap: Optional[np.ndarray] = None) -> np.ndarray:
    """Int id map [H, W] -> uint8 RGB via the fixed colormap."""
    cmap = color_map() if cmap is None else cmap
    return cmap[np.clip(id_map, 0, len(cmap) - 1).astype(np.int64)]


def to_uint8(img: np.ndarray) -> np.ndarray:
    """float [0,1] HWC or uint8 -> uint8 HWC."""
    if img.dtype == np.uint8:
        return img
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def make_row(images: Sequence[np.ndarray], size: int, offset_frac: float = 0.02):
    """Horizontally tile equally-sized images with a small gap."""
    offset = int(offset_frac * size)
    n = len(images)
    row = np.zeros((size, n * (size + offset), 3), dtype=np.uint8)
    ptr = 0
    for img in images:
        img = to_uint8(img)
        if img.shape[:2] != (size, size):
            img = np.array(
                Image.fromarray(img).resize((size, size), Image.BILINEAR)
            )
        row[:, ptr: ptr + size] = img
        ptr += size + offset
    return row


def stack_rows(rows: Sequence[np.ndarray]) -> np.ndarray:
    return np.vstack(rows)


def overlay_panoptic(
    rgb: np.ndarray, panoptic: np.ndarray, alpha: float = 0.8
) -> np.ndarray:
    """Blend the colorized panoptic map over the RGB image (void stays RGB)."""
    rgb = to_uint8(rgb).astype(np.float32)
    colors = colorize_ids(panoptic).astype(np.float32)
    mask = (panoptic > 0)[..., None].astype(np.float32)
    out = rgb * (1 - alpha * mask) + colors * alpha * mask
    return out.astype(np.uint8)


def write_image(img: np.ndarray, directory: str, name: str) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, name)
    Image.fromarray(to_uint8(img)).save(path)
    return path
