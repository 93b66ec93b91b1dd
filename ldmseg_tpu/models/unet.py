"""Conditional denoising UNet (SD v1-4 topology), NHWC Flax.

From-scratch re-implementation of diffusers' ``UNet2DConditionModel`` plus
every capability the reference grafts onto it (ldmseg/models/unet.py:24-436):

  * modified conv_in for 8(+cond) input channels — the seg/image/cond
    channel-slice init modes live in convert.py (param surgery),
  * removable cross-attention (``use_cross_attention=False``; unet.py:83-105),
  * ``separate_conv``: summed seg/img input convs (unet.py:140-173,352-355),
  * ``separate_encoder``: a ControlNet-style duplicated RGB down-block tower
    feeding additive residuals, optional zero-init adaptor convs, and a
    separate image timestep embedding (unet.py:42-63,309-351),
  * ``upscaler_head``: conv_out replaced by a 2x upscaling head
    (unet.py:65-81),
  * encoder_hid_proj / learnable object queries (unet.py:121-122,38-40),
  * input dropout, standard or gaussian (unet.py:26-36,478-491),
  * dual timesteps (timestep_img) for the RGB tower (unet.py:309-316).

SD v1 structure: blocks (320, 640, 1280, 1280), 2 layers/block, 8 attention
heads (dim_head = ch/8), cross-attn dim 768; down 3xCrossAttn + 1 plain,
mid resnet-attn-resnet, up 1 plain + 3xCrossAttn (3 resnets each).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ldmseg_tpu.core.mesh import constrain_batch_fwd
from ldmseg_tpu.kernels.quant import quant_scope

from .layers import (
    Conv2d,
    ConvTranspose2x2,
    Downsample2D,
    GroupNorm,
    LayerNorm2d,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    timestep_embedding,
)


@struct.dataclass
class UNetConfig:
    in_channels: int = 4              # after modify_encoder: 8 + cond_channels
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_attention_heads: int = 8      # SD v1 'attention_head_dim'
    # TPU-native head partitioning: when set, heads = ch // attention_head_dim
    # per level (e.g. 128 -> 2x160 / 5x128 / 10x128 at 320/640/1280ch).
    # QKV/out projections stay [ch, ch] so the parameter tree is identical;
    # only the head split changes. MXU cost of per-head attention is
    # heads * ceil(d/128) score tiles — SD v1's 8 heads of d=40 pad 40->128
    # lanes (3.2x waste) while 2x160 / 5x128 halve the tile count and the
    # VPU softmax work. Must stay None for converted SD checkpoints (the
    # pretrained weights bake in the 8-head split).
    attention_head_dim: Optional[int] = None
    cross_attention_dim: int = 768
    use_cross_attention: bool = True  # False == reference 'remove' descriptor
    norm_num_groups: int = 32
    freq_shift: float = 0.0
    flip_sin_to_cos: bool = True
    # reference graft options
    cond_channels: int = 0
    separate_conv: bool = False
    separate_encoder: bool = False
    add_adaptor: bool = False
    upscaler_head: bool = False
    upscaler_classes: int = 128
    upscaler_dim: int = 256
    encoder_hid_dim: Optional[int] = None
    num_object_queries: Optional[int] = None
    input_dropout: float = 0.0
    input_dropout_mode: str = "standard"
    gradient_checkpointing: bool = False
    dtype: str = "bfloat16"

    def __post_init__(self):
        assert not (self.separate_conv and self.separate_encoder), (
            "separate_conv and separate_encoder cannot both be True"
        )

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype in ("bfloat16", "bf16") else jnp.float32

    @property
    def temb_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @property
    def conv_in_channels(self) -> int:
        return self.in_channels + self.cond_channels

    def attn_heads(self, ch: int) -> Tuple[int, int]:
        """(heads, dim_head) for a level of width ``ch``."""
        if self.attention_head_dim is None:
            return self.num_attention_heads, ch // self.num_attention_heads
        heads = max(1, ch // self.attention_head_dim)
        assert ch % heads == 0, (ch, heads)
        return heads, ch // heads


def _maybe_remat(cfg: "UNetConfig"):
    """Activation checkpointing on resnet/transformer blocks
    (reference: unet.enable_gradient_checkpointing, tools/main_ldm.py:149-151;
    TPU plan per SURVEY §2.10: jax.checkpoint policies on UNet blocks)."""
    if cfg.gradient_checkpointing:
        return nn.remat(ResnetBlock2D), nn.remat(Transformer2D)
    return ResnetBlock2D, Transformer2D


class DownBlocks(nn.Module):
    """The 4 SD down blocks; returns (hidden, residuals tuple)."""

    cfg: UNetConfig
    name_prefix: str = "down_blocks"

    @nn.compact
    def __call__(self, x, temb, context=None):
        cfg = self.cfg
        dt = cfg.compute_dtype
        Resnet, Transformer = _maybe_remat(cfg)
        res_samples = ()
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            has_attn = i < n - 1
            for j in range(cfg.layers_per_block):
                x = Resnet(
                    ch, temb_channels=cfg.temb_dim, eps=1e-5, dtype=dt,
                    name=f"{self.name_prefix}_{i}_resnets_{j}",
                )(x, temb)
                if has_attn:
                    heads, dim_head = cfg.attn_heads(ch)
                    x = Transformer(
                        heads=heads,
                        dim_head=dim_head,
                        use_cross_attention=cfg.use_cross_attention,
                        dtype=dt,
                        name=f"{self.name_prefix}_{i}_attentions_{j}",
                    )(x, context)
                res_samples += (x,)
            if i < n - 1:
                x = Downsample2D(
                    ch, dtype=dt, name=f"{self.name_prefix}_{i}_downsamplers_0"
                )(x)
                res_samples += (x,)
        return x, res_samples


class UpscalerHead(nn.Module):
    """Replacement conv_out producing 2x-upscaled class logits (unet.py:65-81)."""

    cfg: UNetConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.compute_dtype
        dim = cfg.upscaler_dim
        x = Conv2d(dim, 3, dtype=dt, name="conv0")(x)
        x = ConvTranspose2x2(dim, dtype=dt, name="convt")(x)
        x = LayerNorm2d(1e-6, dtype=dt, name="ln")(x)
        x = jax.nn.silu(x)
        x = Conv2d(dim, 3, dtype=dt, name="conv1")(x)
        x = GroupNorm(cfg.norm_num_groups, 1e-5, dtype=dt, act=True, name="gn")(x)
        x = Conv2d(cfg.upscaler_classes, 3, dtype=dt, name="conv2")(x)
        return x


class CondUNet(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,                      # [B, H, W, C_in(+cond)]
        timestep: jnp.ndarray,                    # scalar or [B]
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        timestep_img: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        # mark the trace so LDMSEG_INT8=unet quantizes only this model
        with quant_scope("unet"):
            return self._forward(
                sample, timestep, encoder_hidden_states, timestep_img,
                deterministic, dropout_rng,
            )

    def _forward(
        self,
        sample: jnp.ndarray,
        timestep: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        timestep_img: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        dropout_rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        dt = cfg.compute_dtype
        b = sample.shape[0]
        sample = sample.astype(dt)

        # 1. time embedding (fp32 sinusoid, bf16 MLP)
        timesteps = jnp.broadcast_to(jnp.asarray(timestep), (b,))
        temb_mlp = TimestepEmbedding(cfg.temb_dim, dtype=dt, name="time_embedding")
        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
        ).astype(dt)
        # pin the [B, temb_dim] embedding to batch sharding (see
        # core/mesh.constrain_batch): it feeds every resnet's time_emb_proj
        # whose fsdp-sharded kernel otherwise flips its sharding
        emb = constrain_batch_fwd(temb_mlp(t_emb))

        emb_img = None
        if cfg.separate_encoder:
            # the image tower shares the time-embedding MLP (unet.py:309-316)
            t_img = (
                jnp.zeros_like(timesteps)
                if timestep_img is None
                else jnp.broadcast_to(jnp.asarray(timestep_img), (b,))
            )
            t_emb_img = timestep_embedding(
                t_img, cfg.block_out_channels[0],
                flip_sin_to_cos=cfg.flip_sin_to_cos,
                downscale_freq_shift=cfg.freq_shift,
            ).astype(dt)
            emb_img = constrain_batch_fwd(temb_mlp(t_emb_img))

        # 2. conditioning pre-processing
        context = encoder_hidden_states
        if cfg.encoder_hid_dim is not None and context is not None:
            context = nn.Dense(
                cfg.cross_attention_dim, dtype=dt, name="encoder_hid_proj"
            )(context)
        if cfg.num_object_queries:
            queries = self.param(
                "object_queries",
                nn.initializers.normal(1.0),
                (cfg.num_object_queries, cfg.cross_attention_dim),
            )
            context = jnp.broadcast_to(
                queries[None].astype(dt), (b,) + queries.shape
            )
        if context is not None:
            context = context.astype(dt)

        # input dropout (unet.py:26-36; gaussian variant :478-491)
        if cfg.input_dropout > 0 and not deterministic:
            assert dropout_rng is not None
            if cfg.input_dropout_mode == "standard":
                keep = jax.random.bernoulli(
                    dropout_rng, 1.0 - cfg.input_dropout, sample.shape
                )
                sample = jnp.where(keep, sample / (1.0 - cfg.input_dropout), 0.0)
            else:  # gaussian (matches the reference's double transform)
                p = cfg.input_dropout / (1.0 - cfg.input_dropout)
                std = (p / (1.0 - p)) ** 0.5
                eps = 1.0 + std * jax.random.normal(dropout_rng, sample.shape, dtype=dt)
                sample = sample * eps

        # 3. input fusion + down blocks
        down_extra = None
        if cfg.separate_encoder:
            half = sample.shape[-1] // 2
            sample_seg, sample_img = sample[..., :half], sample[..., half:]
            h_img = Conv2d(
                cfg.block_out_channels[0], 3, dtype=dt, name="conv_in_img"
            )(sample_img)
            _, img_res = DownBlocks(
                cfg, name_prefix="down_blocks_additional", name="down_tower_img"
            )(h_img, emb_img, context)
            if cfg.add_adaptor:
                # one shared adaptor conv per down block (unet.py:49-63)
                adaptors = [
                    Conv2d(ch, 3, dtype=dt, name=f"adaptor_layers_{i}")
                    for i, ch in enumerate(cfg.block_out_channels)
                ]
                n_blocks = len(cfg.block_out_channels)
                per_block = [
                    cfg.layers_per_block + (1 if i < n_blocks - 1 else 0)
                    for i in range(n_blocks)
                ]
                block_of = [i for i, n_ in enumerate(per_block) for _ in range(n_)]
                img_res = tuple(
                    adaptors[block_of[idx]](r) for idx, r in enumerate(img_res)
                )
            down_extra = (h_img,) + img_res
            x = Conv2d(cfg.block_out_channels[0], 3, dtype=dt, name="conv_in")(
                sample_seg
            )
        elif cfg.separate_conv:
            assert sample.shape[-1] == 8, "separate_conv expects 8 channels"
            sample_seg, sample_img = jnp.split(sample, 2, axis=-1)
            x = Conv2d(cfg.block_out_channels[0], 3, dtype=dt, name="conv_in_seg")(
                sample_seg
            ) + Conv2d(cfg.block_out_channels[0], 3, dtype=dt, name="conv_in")(
                sample_img
            )
        else:
            x = Conv2d(cfg.block_out_channels[0], 3, dtype=dt, name="conv_in")(sample)

        res_samples = (x,)
        x, down_res = DownBlocks(cfg, name="down_tower")(x, emb, context)
        res_samples += down_res

        # 4. additive image residuals (ControlNet-style; unet.py:376-385)
        if down_extra is not None:
            res_samples = tuple(r + e for r, e in zip(res_samples, down_extra))

        # 5. mid
        mid_ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(
            mid_ch, temb_channels=cfg.temb_dim, eps=1e-5, dtype=dt,
            name="mid_block_resnets_0",
        )(x, emb)
        mid_heads, mid_dim_head = cfg.attn_heads(mid_ch)
        x = Transformer2D(
            heads=mid_heads,
            dim_head=mid_dim_head,
            use_cross_attention=cfg.use_cross_attention,
            dtype=dt, name="mid_block_attentions_0",
        )(x, context)
        x = ResnetBlock2D(
            mid_ch, temb_channels=cfg.temb_dim, eps=1e-5, dtype=dt,
            name="mid_block_resnets_1",
        )(x, emb)

        # 6. up blocks
        rev = tuple(reversed(cfg.block_out_channels))  # (1280,1280,640,320)
        n = len(rev)
        Resnet, Transformer = _maybe_remat(cfg)
        res_list = list(res_samples)
        for i, ch in enumerate(rev):
            has_attn = i > 0
            for j in range(cfg.layers_per_block + 1):
                res = res_list.pop()
                x = jnp.concatenate([x, res.astype(dt)], axis=-1)
                x = Resnet(
                    ch, temb_channels=cfg.temb_dim, eps=1e-5, dtype=dt,
                    name=f"up_blocks_{i}_resnets_{j}",
                )(x, emb)
                if has_attn:
                    heads, dim_head = cfg.attn_heads(ch)
                    x = Transformer(
                        heads=heads,
                        dim_head=dim_head,
                        use_cross_attention=cfg.use_cross_attention,
                        dtype=dt, name=f"up_blocks_{i}_attentions_{j}",
                    )(x, context)
            if i < n - 1:
                x = Upsample2D(ch, dtype=dt, name=f"up_blocks_{i}_upsamplers_0")(x)

        # 7. out
        x = GroupNorm(cfg.norm_num_groups, 1e-5, dtype=dt, act=True,
                      name="conv_norm_out")(x)
        if cfg.upscaler_head:
            x = UpscalerHead(cfg, name="conv_out_upscaler")(x)
        else:
            x = Conv2d(cfg.out_channels, 3, dtype=dt, name="conv_out")(x)
        return x.astype(jnp.float32)


def tiny_unet_config(**kw) -> UNetConfig:
    """A miniature config for CPU tests and multi-chip dry runs."""
    defaults = dict(
        in_channels=8,
        out_channels=4,
        block_out_channels=(32, 64, 96),
        layers_per_block=1,
        num_attention_heads=4,
        cross_attention_dim=32,
        use_cross_attention=False,
        dtype="float32",
    )
    defaults.update(kw)
    return UNetConfig(**defaults)
