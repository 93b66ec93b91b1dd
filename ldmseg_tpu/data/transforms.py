"""PIL-based transforms producing NHWC numpy arrays.

Reference: ldmseg/data/util/pil_transforms.py — dict-of-named-entries
transforms with per-key interpolation (image/image_semseg bicubic,
semseg/mask nearest). ``CropResize`` is resize-only (its crop_mode is forced
to None in the reference, pil_transforms.py:100-103); ``ToNumpy`` replaces
ToTensor and emits channels-LAST float arrays.
"""

from __future__ import annotations

import random
from typing import Dict, Optional, Tuple

import numpy as np
from PIL import Image

INT_MODES = {
    "image": Image.BICUBIC,
    "semseg": Image.NEAREST,
    "class_labels": Image.NEAREST,
    "mask": Image.NEAREST,
    "image_semseg": Image.BICUBIC,
    "image_class_labels": Image.BICUBIC,
}

_SKIP = ("meta", "text", "tokens", "inpainting_mask")


class Compose:
    def __init__(self, transforms):
        self.transforms = [t for t in transforms if t is not None]

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample

    def __repr__(self):
        return "Compose(" + ", ".join(repr(t) for t in self.transforms) + ")"


class RandomHorizontalFlip:
    def __init__(self, rng: Optional[random.Random] = None):
        self.rng = rng or random

    def __call__(self, sample):
        if self.rng.random() < 0.5:
            for k, v in sample.items():
                if k in _SKIP:
                    continue
                sample[k] = v.transpose(Image.FLIP_LEFT_RIGHT)
        return sample

    def __repr__(self):
        return "RandomHorizontalFlip(p=0.5)"


class CropResize:
    """Resize every spatial entry to a fixed size (resize-only, as in ref)."""

    def __init__(self, size: Tuple[int, int]):
        self.size = size

    def __call__(self, sample):
        h, w = self.size
        for k, v in sample.items():
            if k in _SKIP:
                continue
            sample[k] = v.resize((w, h), resample=INT_MODES[k], reducing_gap=None)
        return sample

    def __repr__(self):
        return f"CropResize(size={self.size})"


class ToNumpy:
    """PIL -> numpy: images float32 [0,1] HWC; semseg/mask int32 HW."""

    def __call__(self, sample):
        for k, v in sample.items():
            if k in _SKIP:
                continue
            if k in ("image", "image_semseg", "image_class_labels"):
                arr = np.asarray(v, dtype=np.float32) / 255.0
                if arr.ndim == 2:
                    arr = arr[..., None]
                sample[k] = arr
            elif k in ("semseg", "mask", "class_labels"):
                sample[k] = np.asarray(v, dtype=np.int32)
            else:
                raise NotImplementedError(k)
        return sample

    def __repr__(self):
        return "ToNumpy"


class Normalize:
    def __init__(self, mean, std):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, sample):
        for k in ("image", "image_semseg"):
            if k in sample and isinstance(sample[k], np.ndarray):
                sample[k] = (sample[k] - self.mean) / self.std
        return sample

    def __repr__(self):
        return f"Normalize(mean={self.mean.tolist()}, std={self.std.tolist()})"


def get_train_transforms(p: Dict, rng: Optional[random.Random] = None) -> Compose:
    """Reference: dataset_base.py:26-49."""
    if p["type"] not in ("crop_resize_pil",):
        raise NotImplementedError(f"transform type '{p['type']}'")
    size = p["size"]
    return Compose([
        RandomHorizontalFlip(rng) if p.get("flip", True) else None,
        CropResize((size, size)),
        ToNumpy(),
        Normalize(**p["normalize_params"]) if p.get("normalize") else None,
    ])


def get_val_transforms(p: Dict) -> Compose:
    """Reference: dataset_base.py:51-72."""
    if p["type"] not in ("crop_resize_pil", "random_crop_resize_pil"):
        raise NotImplementedError(f"transform type '{p['type']}'")
    size = p["size"]
    return Compose([
        CropResize((size, size)),
        ToNumpy(),
        Normalize(**p["normalize_params"]) if p.get("normalize") else None,
    ])
