"""Stable-Diffusion AutoencoderKL (image VAE), NHWC Flax.

The reference uses diffusers' pretrained ``AutoencoderKL`` as a frozen RGB
latent encoder (decoder replaced by Identity during LDM training,
tools/main_ldm.py:137-139) with scaling factor 0.18215. This is a
from-scratch NHWC implementation of the same topology so SD v1-4 torch
checkpoints convert 1:1 (see convert.py):

  encoder: conv_in -> 4 DownEncoderBlock2D (128,128,256,512,512; 2 resnets
  each, stride-2 conv downsample with asymmetric (0,1,0,1) padding after the
  first three) -> mid (resnet, 1-head attention, resnet) -> GN+SiLU ->
  conv_out (2*latent moments) -> 1x1 quant_conv.

  decoder: 1x1 post_quant_conv -> conv_in -> mid -> 4 UpDecoderBlock2D
  (512,512,256,128; 3 resnets each, nearest+conv upsample after the first
  three) -> GN+SiLU -> conv_out(3).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from .bottlenecks import gaussian_bottleneck
from .layers import (
    Conv2d,
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    UNetMidBlock2D,
    Upsample2D,
)


@struct.dataclass
class SDVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: str = "bfloat16"  # frozen encoder runs in bf16

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype in ("bfloat16", "bf16") else jnp.float32

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


class SDEncoder(nn.Module):
    cfg: SDVAEConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dt = cfg.compute_dtype
        x = x.astype(dt)
        x = Conv2d(cfg.block_out_channels[0], 3, dtype=dt, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(
                    ch, temb_channels=None, groups=cfg.norm_num_groups,
                    eps=1e-6, dtype=dt, name=f"down_blocks_{i}_resnets_{j}",
                )(x)
            if i < len(cfg.block_out_channels) - 1:
                x = Downsample2D(
                    ch, asymmetric_pad=True, dtype=dt,
                    name=f"down_blocks_{i}_downsamplers_0",
                )(x)
        x = UNetMidBlock2D(
            cfg.block_out_channels[-1], add_attention=True, temb_channels=None,
            groups=cfg.norm_num_groups, eps=1e-6, dtype=dt, name="mid_block",
        )(x)
        x = GroupNorm(cfg.norm_num_groups, 1e-6, dtype=dt, act=True,
                      name="conv_norm_out")(x)
        x = Conv2d(2 * cfg.latent_channels, 3, dtype=dt, name="conv_out")(x)
        return x.astype(jnp.float32)


class SDDecoder(nn.Module):
    cfg: SDVAEConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dt = cfg.compute_dtype
        rev = tuple(reversed(cfg.block_out_channels))  # (512, 512, 256, 128)
        x = z.astype(dt)
        x = Conv2d(rev[0], 3, dtype=dt, name="conv_in")(x)
        x = UNetMidBlock2D(
            rev[0], add_attention=True, temb_channels=None,
            groups=cfg.norm_num_groups, eps=1e-6, dtype=dt, name="mid_block",
        )(x)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(
                    ch, temb_channels=None, groups=cfg.norm_num_groups,
                    eps=1e-6, dtype=dt, name=f"up_blocks_{i}_resnets_{j}",
                )(x)
            if i < len(rev) - 1:
                x = Upsample2D(ch, dtype=dt, name=f"up_blocks_{i}_upsamplers_0")(x)
        x = GroupNorm(cfg.norm_num_groups, 1e-6, dtype=dt, act=True,
                      name="conv_norm_out")(x)
        x = Conv2d(cfg.out_channels, 3, dtype=dt, name="conv_out")(x)
        return x.astype(jnp.float32)


class SDVAE(nn.Module):
    """AutoencoderKL: encode -> DiagonalGaussian moments; decode."""

    cfg: SDVAEConfig

    def setup(self):
        self.encoder = SDEncoder(self.cfg)
        self.decoder = SDDecoder(self.cfg)
        dt = self.cfg.compute_dtype
        self.quant_conv = Conv2d(
            2 * self.cfg.latent_channels, 1, padding=0, dtype=dt, name="quant_conv"
        )
        self.post_quant_conv = Conv2d(
            self.cfg.latent_channels, 1, padding=0, dtype=dt, name="post_quant_conv"
        )

    def encode_moments(self, x: jnp.ndarray) -> jnp.ndarray:
        """Images in [-1, 1] -> Gaussian moments [B, H/8, W/8, 8]."""
        h = self.encoder(x)
        return self.quant_conv(h.astype(self.cfg.compute_dtype)).astype(jnp.float32)

    def encode(
        self,
        x: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        sample_posterior: bool = False,
    ):
        """Returns (z, mean, kl); scaling factor applied by the caller."""
        moments = self.encode_moments(x)
        return gaussian_bottleneck(moments, rng, sample_posterior=sample_posterior)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        h = self.post_quant_conv(z.astype(self.cfg.compute_dtype))
        return self.decoder(h)

    def __call__(
        self,
        x: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        sample_posterior: bool = False,
    ):
        z, mean, kl = self.encode(x, rng, sample_posterior)
        return self.decode(z), z, kl
