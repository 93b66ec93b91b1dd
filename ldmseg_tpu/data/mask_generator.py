"""Inpainting-mask sampling.

Reference: ldmseg/data/util/mask_generator.py — three modes:
  * ``random_local``  — iid Bernoulli(strength) over the grid (:87-91),
  * ``random_global`` — BEiT-style block masking (:43-85),
  * ``random_global_plus_local`` — union of both (:103-105).

Host-side numpy with an explicit Generator so runs are reproducible
(the reference uses global RNG state).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import numpy as np


class MaskingGenerator:
    def __init__(
        self,
        input_size: Union[int, Tuple[int, int]] = (32, 32),
        num_masking_patches: int = 512,
        min_num_patches: int = 4,
        max_num_patches: Optional[int] = 128,
        min_aspect: float = 0.3,
        max_aspect: Optional[float] = None,
        mode: str = "random_global",
        rng: Optional[np.random.Generator] = None,
    ):
        if not isinstance(input_size, (tuple, list)):
            input_size = (input_size, input_size)
        self.height, self.width = input_size
        self.num_patches = self.height * self.width
        self.num_masking_patches = num_masking_patches
        self.min_num_patches = min_num_patches
        self.max_num_patches = (
            num_masking_patches if max_num_patches is None else max_num_patches
        )
        max_aspect = max_aspect or 1.0 / min_aspect
        self.log_aspect_ratio = (math.log(min_aspect), math.log(max_aspect))
        self.mode = mode
        self.rng = rng or np.random.default_rng()

    def get_shape(self) -> Tuple[int, int]:
        return self.height, self.width

    def _mask(self, mask: np.ndarray, max_mask_patches: int) -> int:
        """Try to place one random block; returns #newly-masked patches."""
        delta = 0
        for _ in range(10):
            lo, hi = sorted((self.min_num_patches, max_mask_patches))
            target_area = self.rng.uniform(lo, hi)
            aspect_ratio = math.exp(self.rng.uniform(*self.log_aspect_ratio))
            h = int(round(math.sqrt(target_area * aspect_ratio)))
            w = int(round(math.sqrt(target_area / aspect_ratio)))
            if w < self.width and h < self.height:
                top = int(self.rng.integers(0, self.height - h + 1))
                left = int(self.rng.integers(0, self.width - w + 1))
                region = mask[top: top + h, left: left + w]
                num_masked = int(region.sum())
                if 0 < h * w - num_masked <= max_mask_patches:
                    delta = int((region == 0).sum())
                    region[:] = 1
                if delta > 0:
                    break
        return delta

    def _get_global_mask(self, mask: np.ndarray) -> np.ndarray:
        mask_count = 0
        while mask_count < self.num_masking_patches:
            max_mask_patches = min(
                self.num_masking_patches - mask_count, self.max_num_patches
            )
            delta = self._mask(mask, max_mask_patches)
            if delta == 0:
                break
            mask_count += delta
        return mask

    def _get_local_mask(self, mask: np.ndarray, strength: float = 0.5) -> np.ndarray:
        mask[self.rng.random(self.get_shape()) < strength] = 1
        return mask

    def __call__(self, t: float = 0.5) -> np.ndarray:
        mask = np.zeros(self.get_shape(), dtype=np.int64)
        if self.mode == "random_local":
            return self._get_local_mask(mask, strength=t)
        if self.mode == "random_global":
            return self._get_global_mask(mask)
        if self.mode == "random_global_plus_local":
            out = self._get_global_mask(mask) + self._get_local_mask(
                np.zeros_like(mask), strength=t
            )
            return (out > 0).astype(np.int64)
        raise NotImplementedError(f"mask mode '{self.mode}'")

    def __repr__(self) -> str:
        return (
            f"MaskingGenerator(mode={self.mode}, {self.height}x{self.width}, "
            f"[{self.min_num_patches}~{self.max_num_patches}], "
            f"total={self.num_masking_patches})"
        )
