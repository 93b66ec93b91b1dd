"""Fused GroupNorm(+SiLU).

GroupNorm-SiLU precedes nearly every conv in the UNet/VAEs. XLA fuses the
normalize/scale/activation elementwise chain into the producing/consuming
ops; the statistics pass is the only extra HBM read. This module provides a
single entry point so a Pallas one-pass kernel can be swapped in without
touching the models (kernel slot for the perf pass; jnp path is already
fusion-friendly: fp32 stats, bf16-safe).

Reference semantics: torch.nn.GroupNorm (channels-first there, NHWC here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    num_groups: int = 32,
    eps: float = 1e-6,
    apply_silu: bool = True,
    dtype=None,
) -> jnp.ndarray:
    """GroupNorm over NHWC input, optional fused SiLU.

    Statistics are computed in fp32 regardless of input dtype.
    """
    orig_dtype = dtype or x.dtype
    b, h, w, c = x.shape
    assert c % num_groups == 0, (c, num_groups)
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    # E[x] and E[x^2] in ONE pass (multi-output reduce fusion) instead of a
    # dependent two-pass mean/centered-var — the converts+reduces were ~12%
    # of UNet step time in the TPU profile (BENCHMARKS.md)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c)
    out = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if apply_silu:
        out = jax.nn.silu(out)
    return out.astype(orig_dtype)
