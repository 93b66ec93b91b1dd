"""Standalone latent -> logits upscaler/decoder.

Reference: ldmseg/models/upscaler.py — the seg-AE decoder topology as an
independent module for decoding diffusion latents, with optional RGB-latent
fusion (channel concat) and non-strict loading from an AE checkpoint.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from .vae_seg import SegDecoder, SegVAEConfig


@struct.dataclass
class UpscalerConfig:
    latent_channels: int = 4
    int_channels: int = 256
    upscaler_channels: int = 256
    out_channels: int = 128
    num_mid_blocks: int = 0
    num_upscalers: int = 1
    fuse_rgb: bool = False
    downsample_factor: int = 8
    norm_num_groups: int = 32
    dtype: str = "float32"

    def to_seg_cfg(self) -> SegVAEConfig:
        return SegVAEConfig(
            latent_channels=self.latent_channels * (2 if self.fuse_rgb else 1),
            int_channels=self.int_channels,
            upscale_channels=self.upscaler_channels,
            out_channels=self.out_channels,
            num_mid_blocks=self.num_mid_blocks,
            num_upscalers=self.num_upscalers,
            norm_num_groups=self.norm_num_groups,
            # interpolation factor derives from these two:
            block_out_channels=tuple(
                [32] * (1 + {1: 0, 2: 1, 4: 2, 8: 3}[self.downsample_factor])
            ),
            dtype=self.dtype,
        )


class Upscaler(nn.Module):
    cfg: UpscalerConfig

    def setup(self):
        self.decoder = SegDecoder(self.cfg.to_seg_cfg())

    def __call__(
        self,
        z: jnp.ndarray,
        interpolate: bool = False,
        z_rgb: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        if z_rgb is not None and self.cfg.fuse_rgb:
            z = jnp.concatenate([z, z_rgb.astype(z.dtype)], axis=-1)
        return self.decoder(z, interpolate=interpolate)
