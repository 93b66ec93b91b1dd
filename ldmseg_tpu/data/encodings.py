"""Panoptic segmentation-map encodings.

The reference bit-encodes 128-way instance-ID maps into a 7-channel image in
the dataloader (reference: ldmseg/data/coco.py:377-390), remaps instance ids
to a random permutation in [1, 128) per example (coco.py:320-351) and offers
color / random-color encodings (coco.py:353-375).

Host-side (numpy) versions feed the input pipeline; jnp versions run
on-device (decode_bitmap_jnp is used by on-device panoptic decoding).
Layout note: we are NHWC — bit channels live LAST, unlike the reference's
channel-first (n, H, W).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def color_map(N: int = 256, normalized: bool = False) -> np.ndarray:
    """PASCAL-style color map (reference: ldmseg/utils/utils.py:240-258)."""
    i = np.arange(N, dtype=np.uint32)
    cmap = np.zeros((N, 3), dtype=np.uint8)
    for j in range(8):
        cmap[:, 0] |= (((i >> 0) & 1) << (7 - j)).astype(np.uint8)
        cmap[:, 1] |= (((i >> 1) & 1) << (7 - j)).astype(np.uint8)
        cmap[:, 2] |= (((i >> 2) & 1) << (7 - j)).astype(np.uint8)
        i = i >> 3
    if normalized:
        return cmap.astype(np.float32) / 255.0
    return cmap


@functools.lru_cache(maxsize=8)
def _bit_lut(n: int, fill_value: float, ignore_label: int) -> np.ndarray:
    lut = ((np.arange(256)[:, None] >> np.arange(n)) % 2).astype(np.float32)
    lut[ignore_label] = fill_value
    return lut


def encode_bitmap(
    x: np.ndarray,
    n: int = 7,
    fill_value: float = 0.5,
    ignore_label: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Bit-encode an integer id map [H, W] -> float [H, W, n] in {0,1}.

    Void pixels (== ignore_label) are set to ``fill_value`` in every bit
    channel (coco.py:377-382). Returns (bits, ignore_mask).
    """
    x = np.asarray(x)
    ignore = x == ignore_label
    if np.issubdtype(x.dtype, np.integer) and 0 <= ignore_label < 256:
        # hot path (per-read at train time): one [256, n] lookup table +
        # a single gather instead of n shift/mod passes over [H, W] temps
        lut = _bit_lut(n, float(fill_value), int(ignore_label))
        if x.dtype == np.uint8:
            return lut[x], ignore
        if x.size and 0 <= int(x.min()) and int(x.max()) < 256:
            return lut[x], ignore
    shifts = np.arange(n, dtype=x.dtype)
    bits = ((x[..., None] >> shifts) % 2).astype(np.float32)
    bits[ignore] = fill_value
    return bits, ignore


def decode_bitmap(x: np.ndarray) -> np.ndarray:
    """Invert encode_bitmap for outputs in [-1, 1]: [H, W, n] -> int64 [H, W].

    Thresholds at 0 (the AE input is scaled to [-1, 1]; coco.py:384-390).
    """
    x = np.asarray(x)
    n = x.shape[-1]
    bits = (x > 0.0).astype(np.int64)
    weights = (1 << np.arange(n)).astype(np.int64)
    return (bits * weights).sum(axis=-1)


def encode_bitmap_jnp(
    x: jnp.ndarray, n: int = 7, fill_value: float = 0.5, ignore_label: int = 0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side bit encode: int [..., H, W] -> float32 [..., H, W, n]."""
    ignore = x == ignore_label
    shifts = jnp.arange(n, dtype=x.dtype)
    bits = ((x[..., None] >> shifts) % 2).astype(jnp.float32)
    bits = jnp.where(ignore[..., None], fill_value, bits)
    return bits, ignore


def decode_bitmap_jnp(x: jnp.ndarray) -> jnp.ndarray:
    """Device-side bit decode: float [..., H, W, n] -> int32 [..., H, W]."""
    n = x.shape[-1]
    bits = (x > 0.0).astype(jnp.int32)
    weights = (1 << jnp.arange(n, dtype=jnp.int32))
    return jnp.sum(bits * weights, axis=-1)


def remap_labels(
    labels: np.ndarray,
    num_classes: int = 128,
    ignore_label: int = 0,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, Dict[int, int]]:
    """Randomly remap instance ids to ids sampled w/o replacement in [1, N).

    The ignore label is kept fixed (reference: coco.py:320-351). Returns the
    remapped map and the old->new mapping dict.
    """
    rng = rng or np.random.default_rng()
    # one unique pass with inverse indices: the remap becomes a single
    # gather instead of a full-image masked write per id
    uv, inv = np.unique(labels, return_inverse=True)
    keep = uv != ignore_label
    n_ids = int(keep.sum())
    assert n_ids < num_classes, (
        f"{n_ids} unique ids >= num_classes {num_classes}"
    )
    targets = rng.choice(num_classes - 1, size=n_ids, replace=False) + 1
    new_vals = np.full(uv.shape, ignore_label, dtype=labels.dtype)
    new_vals[keep] = targets.astype(labels.dtype)
    remapped = new_vals[inv].reshape(labels.shape)
    mapping = dict(zip((int(v) for v in uv[keep]), (int(t) for t in targets)))
    return remapped, mapping


def encode_semseg_color(
    semseg: np.ndarray, cmap: Optional[np.ndarray] = None, ignore_label: int = 0
) -> np.ndarray:
    """Fixed-colormap encoding: id map -> uint8 [H, W, 3] (coco.py:353-361)."""
    if cmap is None:
        cmap = color_map()
    seg = semseg.astype(np.uint8)
    out = np.full(seg.shape + (cmap.shape[1],), ignore_label, dtype=cmap.dtype)
    for class_i in np.unique(seg):
        out[seg == class_i] = cmap[class_i]
    return out


def encode_semseg_random_color(
    semseg: np.ndarray,
    ignore_label: int = 0,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Random-palette encoding (coco.py:363-375): each id gets a random color."""
    rng = rng or np.random.default_rng()
    seg = semseg.astype(np.uint8)
    out = np.full(seg.shape + (3,), ignore_label, dtype=np.uint8)
    unique_classes = np.unique(seg)
    palette = set()
    while len(palette) < len(unique_classes):
        palette.add(tuple(int(v) for v in rng.choice(256, size=3)))
    palette = list(palette)
    for idx, class_i in enumerate(unique_classes):
        if class_i == ignore_label:
            continue
        out[seg == class_i] = np.asarray(palette[idx], dtype=np.uint8)
    return out
