"""Shared NHWC building blocks for the SD UNet / VAEs / seg-AE.

TPU-first choices:
  * NHWC everywhere — channels ride the 128-lane dimension, convs map
    straight onto the MXU without layout transposes.
  * ConvTranspose k2s2 is implemented as a dense einsum + pixel-shuffle
    (exactly equivalent, and it is a single MXU matmul instead of a
    scatter-style transposed conv).
  * Attention routes through kernels.attention (Pallas flash attention on
    TPU, jnp fallback elsewhere).

Topology mirrors Stable-Diffusion v1-4 blocks (so torch checkpoints convert
1:1); reference behavior per ldmseg/models/{unet,vae}.py.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ldmseg_tpu.core.mesh import constrain_batch_fwd
from ldmseg_tpu.kernels.attention import multi_head_attention
from ldmseg_tpu.kernels.norms import group_norm_silu
from ldmseg_tpu.kernels.quant import int8_conv, int8_enabled, int8_matmul

Dtype = jnp.dtype


class _Int8Conv(nn.Module):
    """nn.Conv-compatible params (conv/{kernel,bias}, HWIO) with the compute
    routed through the int8 MXU path (kernels/quant.py). Instantiated in
    place of nn.Conv when the serving-time LDMSEG_INT8 knob is on; the
    param tree, shapes, and initializers match nn.Conv exactly, so any
    checkpoint applies to either."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: object = "SAME"
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        y = int8_conv(
            x, kernel, stride=self.strides, padding=self.padding,
            out_dtype=self.dtype,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class _Int8Dense(nn.Module):
    """nn.Dense-compatible params with int8 matmul compute (see _Int8Conv)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        y = int8_matmul(x, kernel, self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


def _conv(features, kernel_size, strides, padding, dtype, name, use_bias=True):
    """nn.Conv, or its int8 twin when the serving knob is on (trace-time)."""
    if int8_enabled():
        return _Int8Conv(features, kernel_size, strides, padding,
                         use_bias=use_bias, dtype=dtype, name=name)
    return nn.Conv(features, kernel_size=kernel_size, strides=strides,
                   padding=padding, use_bias=use_bias, dtype=dtype, name=name)


def _dense(features, dtype, name, use_bias=True):
    if int8_enabled():
        return _Int8Dense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (SD: flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin], axis=-1) if flip_sin_to_cos else jnp.concatenate(
        [sin, cos], axis=-1
    )
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """Two-layer MLP over the sinusoidal embedding (diffusers TimestepEmbedding)."""

    emb_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.emb_dim, dtype=self.dtype, name="linear_1")(t_emb)
        h = jax.nn.silu(h)
        h = nn.Dense(self.emb_dim, dtype=self.dtype, name="linear_2")(h)
        return h


class Conv2d(nn.Module):
    """3x3/1x1 conv wrapper, NHWC, torch-compatible 'same' padding."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None  # None => kernel_size // 2
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.kernel_size // 2 if self.padding is None else self.padding
        return _conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            (self.stride, self.stride),
            [(pad, pad), (pad, pad)],
            self.dtype,
            "conv",
            use_bias=self.use_bias,
        )(x)


class ConvTranspose2x2(nn.Module):
    """ConvTranspose2d(kernel=2, stride=2) as einsum + pixel shuffle.

    With no kernel overlap, y[2i+di, 2j+dj, o] = sum_c x[i,j,c] W[di,dj,c,o]
    — a single (C -> 4*O) matmul followed by a reshape. Bit-exact equivalent
    of the torch op used by the seg-AE decoder (ldmseg/models/vae.py:155).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (2, 2, c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # [2,2,C,F] -> [C, (di,dj,F)] so the matmul output unpacks in order
        k = kernel.astype(self.dtype).transpose(2, 0, 1, 3).reshape(c, 4 * self.features)
        y = jnp.einsum(
            "bhwc,cf->bhwf", x.astype(self.dtype), k,
            preferred_element_type=self.dtype,
        )
        y = y.reshape(b, h, w, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, self.features)
        return y + bias.astype(self.dtype)


class LayerNorm2d(nn.Module):
    """Per-pixel channel LayerNorm (detectron2 LayerNorm2d; vae.py:309-322).

    In NHWC this is a plain LayerNorm over the trailing channel axis.
    """

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(
            epsilon=self.epsilon, dtype=self.dtype, name="norm"
        )(x)


class GroupNorm(nn.Module):
    """GroupNorm with optional fused SiLU (Pallas-fused on TPU)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    act: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm_silu(
            x, scale, bias, num_groups=self.num_groups, eps=self.epsilon,
            apply_silu=self.act, dtype=self.dtype,
        )


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D (GN-SiLU-conv ×2 + temb add + skip)."""

    out_channels: int
    temb_channels: Optional[int] = 1280
    groups: int = 32
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = GroupNorm(self.groups, self.eps, dtype=self.dtype, act=True, name="norm1")(x)
        h = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv1")(h)
        if temb is not None and self.temb_channels is not None:
            # constrain the silu output too: the fsdp-sharded time_emb_proj
            # kernel otherwise propagates a contraction-dim sharding back
            # through the silu mul (the last SPMD remat warning)
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                constrain_batch_fwd(jax.nn.silu(temb))
            )
            h = h + t[:, None, None, :].astype(h.dtype)
        h = GroupNorm(self.groups, self.eps, dtype=self.dtype, act=True, name="norm2")(h)
        h = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = Conv2d(self.out_channels, 1, padding=0, dtype=self.dtype,
                       name="conv_shortcut")(x)
        # keep the block output batch-sharded under a dp_scope mesh
        # (measured: removing this one triples the SPMD remat warnings at
        # the transformer boundaries). FORWARD-only: pinning the cotangent
        # too conflicts with the fsdp conv_shortcut weight-grad layout
        # (the last two remat warnings were its transpose)
        return constrain_batch_fwd(x + h)


class _ProjKernel(nn.Module):
    """Bare [in, out] kernel with nn.Dense's param path ({name}/kernel) and
    init, so fused-projection attention keeps a checkpoint-identical tree."""

    features: int

    @nn.compact
    def __call__(self, in_features: int) -> jnp.ndarray:
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features), jnp.float32,
        )


def _fuse_qkv() -> bool:
    return os.environ.get("LDMSEG_FUSED_QKV", "1") != "0"


class Attention(nn.Module):
    """Multi-head attention (diffusers CrossAttention): q from x, kv from ctx.

    The q/k/v projections run as ONE [ch, 3*inner] matmul for self-attention
    (k/v fused to [ctx, 2*inner] for cross): the kernel concat is
    loop-invariant (hoisted out of the sampling scan by XLA) and the wider
    matmul amortizes MXU tile padding at 320ch (3 tiles of 128 per output
    slab vs 2.5 used). LDMSEG_FUSED_QKV=0 restores separate projections.
    Param tree and initialization are identical either way.
    """

    heads: int
    dim_head: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        ctx = x if context is None else context
        inner = self.heads * self.dim_head
        wq = _ProjKernel(inner, name="to_q")(x.shape[-1])
        wk = _ProjKernel(inner, name="to_k")(ctx.shape[-1])
        wv = _ProjKernel(inner, name="to_v")(ctx.shape[-1])
        xd = x.astype(self.dtype)
        cd = ctx.astype(self.dtype)
        if int8_enabled():
            # per-output-channel weight scales make the concat equivalent
            # to three separate int8 projections
            mm = lambda a, w_: int8_matmul(a, w_, self.dtype)  # noqa: E731
        else:
            mm = lambda a, w_: a @ w_.astype(self.dtype)  # noqa: E731
        if context is None and _fuse_qkv():
            w = jnp.concatenate([wq, wk, wv], axis=1)
            q, k, v = jnp.split(mm(xd, w), 3, axis=-1)
        elif _fuse_qkv():
            q = mm(xd, wq)
            k, v = jnp.split(
                mm(cd, jnp.concatenate([wk, wv], axis=1)), 2, axis=-1
            )
        else:
            q = mm(xd, wq)
            k = mm(cd, wk)
            v = mm(cd, wv)
        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, sk, self.heads, self.dim_head)
        v = v.reshape(b, sk, self.heads, self.dim_head)
        o = multi_head_attention(q, k, v)  # [B, Sq, H, D]
        o = o.reshape(b, sq, inner)
        return _dense(self.out_features, self.dtype, "to_out")(o)


class FeedForwardGEGLU(nn.Module):
    """GEGLU feed-forward (diffusers FeedForward with geglu, mult=4)."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        h = _dense(inner * 2, self.dtype, "proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate)
        return _dense(self.dim, self.dtype, "out")(h)


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn (removable), LN->GEGLU FF.

    ``use_cross_attention=False`` reproduces the reference's surgical
    cross-attention removal (ldmseg/models/unet.py:83-105): attn2/norm2 are
    simply absent from the param tree.
    """

    dim: int
    heads: int
    dim_head: int
    use_cross_attention: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = constrain_batch_fwd(
            x + Attention(self.heads, self.dim_head, self.dim, dtype=self.dtype,
                          name="attn1")(h)
        )
        if self.use_cross_attention:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
            x = constrain_batch_fwd(
                x + Attention(self.heads, self.dim_head, self.dim,
                              dtype=self.dtype, name="attn2")(h, context)
            )
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = constrain_batch_fwd(
            x + FeedForwardGEGLU(self.dim, dtype=self.dtype, name="ff")(h)
        )
        return x


class Transformer2D(nn.Module):
    """diffusers Transformer2DModel: GN -> 1x1 in -> blocks -> 1x1 out + res."""

    heads: int
    dim_head: int
    depth: int = 1
    use_cross_attention: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        x = GroupNorm(32, 1e-6, dtype=self.dtype, name="norm")(x)
        x = Conv2d(inner, 1, padding=0, dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, inner)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                inner, self.heads, self.dim_head,
                use_cross_attention=self.use_cross_attention,
                dtype=self.dtype, name=f"transformer_blocks_{i}",
            )(x, context)
        x = x.reshape(b, h, w, inner)
        x = Conv2d(c, 1, padding=0, dtype=self.dtype, name="proj_out")(x)
        return x + residual


class Downsample2D(nn.Module):
    """Stride-2 conv downsample. ``asymmetric_pad`` mirrors the SD VAE's
    pad=(0,1,0,1) (diffusers Downsample2D with padding=0)."""

    features: int
    asymmetric_pad: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.asymmetric_pad:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = [(0, 0), (0, 0)]
        else:
            pad = [(1, 1), (1, 1)]
        return _conv(
            self.features, (3, 3), (2, 2), pad, self.dtype, "conv"
        )(x)


class Upsample2D(nn.Module):
    """Nearest 2x + 3x3 conv (diffusers Upsample2D)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        # nn.Conv directly (like Downsample2D) so the param path is
        # upsamplers_0/conv/kernel, matching the converter layout
        return _conv(
            self.features, (3, 3), (1, 1), [(1, 1), (1, 1)], self.dtype,
            "conv",
        )(x)


class VAEAttention(nn.Module):
    """Single-head full attention used in the SD VAE mid block."""

    dtype: Dtype = jnp.float32
    groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(self.groups, 1e-6, dtype=self.dtype, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = _dense(c, self.dtype, "to_q")(x)
        k = _dense(c, self.dtype, "to_k")(x)
        v = _dense(c, self.dtype, "to_v")(x)
        o = multi_head_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        o = _dense(c, self.dtype, "to_out")(o)
        return o.reshape(b, h, w, c) + residual


class UNetMidBlock2D(nn.Module):
    """Resnet (+attention) mid block; attention optional.

    Used both by the SD VAE (with attention) and the seg-AE's optional mid
    blocks (without attention; ldmseg/models/vae.py:136-145).
    """

    channels: int
    add_attention: bool = True
    temb_channels: Optional[int] = None
    groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = ResnetBlock2D(
            self.channels, temb_channels=self.temb_channels, groups=self.groups,
            eps=self.eps, dtype=self.dtype, name="resnets_0",
        )(x, temb)
        if self.add_attention:
            x = VAEAttention(dtype=self.dtype, groups=self.groups,
                             name="attentions_0")(x)
        x = ResnetBlock2D(
            self.channels, temb_channels=self.temb_channels, groups=self.groups,
            eps=self.eps, dtype=self.dtype, name="resnets_1",
        )(x, temb)
        return x


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear NHWC resize, half-pixel centers (== torch align_corners=False)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear")


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="nearest")
