"""Image-resize helpers matching torch semantics where parity matters."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def nearest_resize_torch(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') indexing: src = floor(i * in/out).

    x: [..., H, W] (no channel axis). Used for loss-mask and inpainting-mask
    resizing (trainers_ldm_cond.py:645,654,657,715).
    """
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = size
    ys = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[..., ys, :][..., :, xs]


def nearest_downsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Exact-integer-factor torch-nearest downsample == strided slice."""
    return x[..., ::factor, ::factor]
