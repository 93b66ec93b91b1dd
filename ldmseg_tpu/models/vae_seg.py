"""Shallow panoptic auto-encoder (stage 1), TPU-native NHWC Flax.

Capabilities of the reference GeneralVAESeg (ldmseg/models/vae.py:42-306):
  * conv stem + 3 stride-2 stages over block_out_channels=(32,64,128,256),
    8x spatial compression to a (latent_channels * num_latents)-moment map,
  * 4 bottleneck parametrizations (gaussian default; see bottlenecks.py),
  * decoder: conv -> optional mid blocks -> num_upscalers x
    (ConvT k2s2 + LayerNorm2d + SiLU) -> GN+SiLU+conv to 128 logits, then
    bilinear x interpolation_factor to full resolution (vae.py:267-271),
  * fuse_rgb input concat (vae.py:286-287), resize_input / skip_encoder
    encoder variants (vae.py:187-211), valid-mask latent zeroing
    (vae.py:297-299), clamp/act bottleneck knobs.

The encoder/decoder are separate submodules so the shared-SD-encoder option
(tools/main_ae.py:140-143) composes at the trainer level: SD-VAE moments are
fed straight into the bottleneck/decoder.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from .bottlenecks import (
    auto_bottleneck,
    discrete_codebook_bottleneck,
    gaussian_bottleneck,
    gumbel_softmax_bottleneck,
    orthogonal_codebook_init,
)
from .layers import (
    Conv2d,
    ConvTranspose2x2,
    GroupNorm,
    LayerNorm2d,
    UNetMidBlock2D,
    resize_bilinear,
)


@struct.dataclass
class SegVAEConfig:
    in_channels: int = 7  # bit encoding (coco.py:377-382)
    int_channels: int = 256
    out_channels: int = 128  # instance logits
    block_out_channels: Tuple[int, ...] = (32, 64, 128, 256)
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    num_mid_blocks: int = 0
    num_latents: int = 2
    num_upscalers: int = 1
    upscale_channels: int = 256
    parametrization: str = "gaussian"
    fuse_rgb: bool = False
    resize_input: bool = False
    act_fn: str = "none"
    clamp_output: bool = False
    freeze_codebook: bool = False
    skip_encoder: bool = False
    num_embeddings: int = 128
    dtype: str = "float32"

    def __post_init__(self):
        assert self.parametrization in (
            "gaussian", "discrete_gumbel_softmax", "discrete_codebook", "auto",
        )

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @property
    def interpolation_factor(self) -> int:
        return self.downsample_factor // (2 ** self.num_upscalers)

    @property
    def effective_num_latents(self) -> int:
        # discrete: encoder emits codebook logits; auto: plain latents
        if "discrete" in self.parametrization:
            return self.num_embeddings // self.latent_channels
        if self.parametrization == "auto":
            return 1
        return self.num_latents

    @property
    def encoder_in_channels(self) -> int:
        return self.in_channels + (3 if self.fuse_rgb else 0)

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype in ("bfloat16", "bf16") else jnp.float32


class SegEncoder(nn.Module):
    """Shallow conv encoder producing bottleneck moments (vae.py:174-244)."""

    cfg: SegVAEConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dt = cfg.compute_dtype
        moment_ch = cfg.latent_channels * cfg.effective_num_latents
        x = x.astype(dt)

        if cfg.skip_encoder:
            # single 8x8/s8 conv (vae.py:186-188)
            return nn.Conv(
                moment_ch, kernel_size=(8, 8), strides=(8, 8), padding="VALID",
                dtype=dt, name="skip_conv",
            )(x)

        blocks = cfg.block_out_channels
        stem_ch = cfg.int_channels if cfg.resize_input else blocks[0]
        x = Conv2d(stem_ch, 3, dtype=dt, name="conv_in")(x)
        x = jax.nn.silu(x)

        if cfg.resize_input:
            b, h, w, c = x.shape
            f = cfg.downsample_factor
            x = resize_bilinear(x, (h // f, w // f))
        else:
            for i in range(len(blocks) - 1):
                x = Conv2d(blocks[i], 3, dtype=dt, name=f"down_{i}_conv1")(x)
                x = Conv2d(blocks[i + 1], 3, stride=2, dtype=dt, name=f"down_{i}_conv2")(x)
                x = jax.nn.silu(x)
        # applied in both branches (vae.py:212-215)
        x = Conv2d(cfg.int_channels, 3, dtype=dt, name="conv_mid_in")(x)

        for i in range(cfg.num_mid_blocks):
            x = UNetMidBlock2D(
                cfg.int_channels, add_attention=False, temb_channels=None,
                groups=cfg.norm_num_groups, eps=1e-6, dtype=dt, name=f"mid_{i}",
            )(x)

        x = GroupNorm(cfg.norm_num_groups, 1e-6, dtype=dt, act=True, name="norm_out")(x)
        x = Conv2d(moment_ch, 3, dtype=dt, name="conv_out")(x)
        return x.astype(jnp.float32)


class SegDecoder(nn.Module):
    """Latent -> 128-way instance logits decoder (vae.py:123-172)."""

    cfg: SegVAEConfig
    fuse_rgb_latents: bool = False  # Upscaler variant: concat rgb latents

    @nn.compact
    def __call__(self, z: jnp.ndarray, interpolate: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        dt = cfg.compute_dtype
        x = z.astype(dt)
        x = Conv2d(cfg.int_channels, 3, dtype=dt, name="conv_in")(x)
        if cfg.num_mid_blocks > 0:
            x = UNetMidBlock2D(
                cfg.int_channels, add_attention=False, temb_channels=None,
                groups=cfg.norm_num_groups, eps=1e-6, dtype=dt, name="mid_0",
            )(x)
        dim = cfg.upscale_channels
        for i in range(cfg.num_upscalers):
            x = ConvTranspose2x2(dim, dtype=dt, name=f"up_{i}_convt")(x)
            x = LayerNorm2d(1e-6, dtype=dt, name=f"up_{i}_norm")(x)
            x = jax.nn.silu(x)
        # decoder GroupNorm uses torch's default eps=1e-5 (vae.py:162)
        x = GroupNorm(cfg.norm_num_groups, 1e-5, dtype=dt, act=True, name="norm_out")(x)
        x = Conv2d(cfg.out_channels, 3, dtype=dt, name="conv_out")(x)
        x = x.astype(jnp.float32)
        if interpolate and cfg.interpolation_factor > 1:
            b, h, w, c = x.shape
            f = cfg.interpolation_factor
            x = resize_bilinear(x, (h * f, w * f))
        return x


class SegVAE(nn.Module):
    """Full seg auto-encoder: encode -> bottleneck -> decode.

    Methods are exposed individually (``encode`` / ``bottleneck`` /
    ``decode``) so the LDM trainer can call the pieces it needs, and the
    shared-encoder option can substitute SD-VAE moments.
    """

    cfg: SegVAEConfig

    def setup(self):
        self.encoder = SegEncoder(self.cfg)
        self.decoder = SegDecoder(self.cfg)
        if "discrete" in self.cfg.parametrization:
            if self.cfg.freeze_codebook:
                init = lambda rng, shape: orthogonal_codebook_init(*shape)
            else:
                init = nn.initializers.normal(1.0)
            self.codebook = self.param(
                "codebook", init, (self.cfg.num_embeddings, self.cfg.latent_channels)
            )

    def encode(self, x: jnp.ndarray, rgb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if rgb is not None and self.cfg.fuse_rgb:
            x = jnp.concatenate([x, rgb.astype(x.dtype)], axis=-1)
        return self.encoder(x)

    def bottleneck(
        self,
        moments: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        sample_posterior: bool = True,
    ):
        cfg = self.cfg
        kw = dict(sample_posterior=sample_posterior)
        if cfg.parametrization == "gaussian":
            return gaussian_bottleneck(
                moments, rng, clamp_output=cfg.clamp_output, act_fn=cfg.act_fn, **kw
            )
        if cfg.parametrization == "discrete_gumbel_softmax":
            cb = jax.lax.stop_gradient(self.codebook) if cfg.freeze_codebook else self.codebook
            return gumbel_softmax_bottleneck(
                moments, cb, rng, clamp_output=cfg.clamp_output, **kw
            )
        if cfg.parametrization == "discrete_codebook":
            cb = jax.lax.stop_gradient(self.codebook) if cfg.freeze_codebook else self.codebook
            return discrete_codebook_bottleneck(
                moments, cb, rng, clamp_output=cfg.clamp_output, **kw
            )
        return auto_bottleneck(moments, rng, act_fn=cfg.act_fn, **kw)

    def decode(self, z: jnp.ndarray, interpolate: bool = True) -> jnp.ndarray:
        return self.decoder(z, interpolate=interpolate)

    def __call__(
        self,
        sample: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        sample_posterior: bool = True,
        rgb_sample: Optional[jnp.ndarray] = None,
        valid_mask: Optional[jnp.ndarray] = None,
    ):
        """Forward pass (vae.py:273-306). Returns (logits, z, kl).

        Note: matches the reference in NOT interpolating inside forward —
        training losses point-sample the 256x256 logits directly; the final
        upsample happens at eval time.
        """
        moments = self.encode(sample, rgb_sample)
        z, mode, kl = self.bottleneck(moments, rng, sample_posterior)
        if valid_mask is not None:
            z = z * valid_mask[..., None]
        dec = self.decode(z, interpolate=False)
        return dec, z, kl
