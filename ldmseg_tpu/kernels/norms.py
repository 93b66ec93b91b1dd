"""Fused GroupNorm(+SiLU).

GroupNorm-SiLU precedes nearly every conv in the UNet/VAEs (reference:
torch.nn.GroupNorm inside diffusers blocks; channels-first there, NHWC
here). The TPU profile showed the GN stats convert+reduce chain at ~12% of
a UNet step (BENCHMARKS.md), so the TPU path is a one-pass Pallas kernel:

  * one grid program per batch element holds the full [HW, C] block in
    VMEM, so x is read from HBM exactly ONCE (XLA's fused fallback reads it
    twice: once for the stats reduce, once for the normalize chain);
  * per-group statistics stay lane-aligned: channel sums [1, C] are folded
    to groups with a tiny [C, G] membership matmul (MXU), then broadcast
    back with its transpose — no lane-dimension reshapes;
  * fp32 temporaries are bounded by an in-kernel fori_loop over HW chunks;
  * backward recomputes through the jnp implementation (custom_vjp), the
    standard memory/FLOP trade.

Inputs too large for VMEM (the 512^2-resolution AE norms) fall back to the
jnp path, which is already fusion-friendly (one-pass E[x^2]-E[x]^2 stats,
fp32 accumulation, bf16-safe).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only imports cleanly on TPU-capable builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _gn_silu_jnp(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    num_groups: int,
    eps: float,
    apply_silu: bool,
    out_dtype,
) -> jnp.ndarray:
    """Reference jnp GroupNorm(+SiLU); also the VJP source for the kernel."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    # E[x] and E[x^2] in ONE pass (multi-output reduce fusion) instead of a
    # dependent two-pass mean/centered-var
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c)
    out = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if apply_silu:
        out = jax.nn.silu(out)
    return out.astype(out_dtype)


def _gn_kernel(
    x_ref, scale_ref, bias_ref, m_ref, o_ref, *, n_chunks, chunk, inv_n, eps,
    apply_silu,
):
    """One batch element: single-HBM-read GroupNorm(+SiLU) over [HW, C]."""
    c = x_ref.shape[-1]

    def stats_body(i, carry):
        s1, s2 = carry
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return (
            s1 + jnp.sum(xc, axis=0, keepdims=True),
            s2 + jnp.sum(xc * xc, axis=0, keepdims=True),
        )

    s1, s2 = jax.lax.fori_loop(
        0, n_chunks, stats_body,
        (jnp.zeros((1, c), jnp.float32), jnp.zeros((1, c), jnp.float32)),
    )

    m = m_ref[...]  # [C, G] group membership (one-hot)
    gs1 = jnp.dot(s1, m, preferred_element_type=jnp.float32)  # [1, G]
    gs2 = jnp.dot(s2, m, preferred_element_type=jnp.float32)
    gmean = gs1 * inv_n
    gvar = jnp.maximum(gs2 * inv_n - gmean * gmean, 0.0)
    ginv = jax.lax.rsqrt(gvar + eps)
    # broadcast group stats back to channels via M^T
    bcast = lambda g: jax.lax.dot_general(  # noqa: E731
        g, m, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    w = bcast(ginv) * scale_ref[...]            # [1, C]
    b = bias_ref[...] - bcast(gmean * ginv) * scale_ref[...]

    def norm_body(i, _):
        xc = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        out = xc * w + b
        if apply_silu:
            out = out * jax.nn.sigmoid(out)
        o_ref[0, pl.ds(i * chunk, chunk), :] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm_body, 0)


def _pick_chunk(hw: int, c: int) -> int:
    """Largest power-of-two row chunk dividing hw with <=2MB fp32 temps."""
    chunk = hw
    while chunk > 8 and (chunk * c * 4 > 2 * 2 ** 20 or hw % chunk != 0):
        chunk //= 2
    return chunk if hw % chunk == 0 else 0


def _gn_silu_pallas_call(x3, scale, bias, num_groups, eps, apply_silu,
                         out_dtype, interpret):
    bsz, hw, c = x3.shape
    cg = c // num_groups
    chunk = _pick_chunk(hw, c)
    membership = (
        jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
        == jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    ).astype(jnp.float32)
    kernel = functools.partial(
        _gn_kernel,
        n_chunks=hw // chunk,
        chunk=chunk,
        inv_n=1.0 / (hw * cg),
        eps=eps,
        apply_silu=apply_silu,
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, hw, c), out_dtype),
        interpret=interpret,
    )(
        x3,
        scale.astype(jnp.float32).reshape(1, c),
        bias.astype(jnp.float32).reshape(1, c),
        membership,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _gn_silu_fused(x, scale, bias, num_groups, eps, apply_silu, out_dtype,
                   interpret):
    b, h, w, c = x.shape
    out = _gn_silu_pallas_call(
        x.reshape(b, h * w, c), scale, bias, num_groups, eps, apply_silu,
        out_dtype, interpret,
    )
    return out.reshape(b, h, w, c)


def _gn_silu_fused_fwd(x, scale, bias, num_groups, eps, apply_silu, out_dtype,
                       interpret):
    out = _gn_silu_fused(
        x, scale, bias, num_groups, eps, apply_silu, out_dtype, interpret
    )
    return out, (x, scale, bias)


def _gn_silu_fused_bwd(num_groups, eps, apply_silu, out_dtype, interpret,
                       res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _gn_silu_jnp(
            x_, s_, b_, num_groups=num_groups, eps=eps, apply_silu=apply_silu,
            out_dtype=out_dtype,
        ),
        x, scale, bias,
    )
    return vjp(g)


_gn_silu_fused.defvjp(_gn_silu_fused_fwd, _gn_silu_fused_bwd)

# x + out VMEM blocks are BOTH double-buffered by the Mosaic pipeline, plus
# ~2MB of bounded fp32 temps, and everything must fit in ~16MB/core VMEM:
# 2*(x + out) + temps <= 16MB  =>  block cap 3MB (a 4MB cap compiled
# standalone but VMEM-OOMed inside the full SD-VAE encode program)
_PALLAS_GN_MAX_BYTES = 3 * 2 ** 20


def _use_pallas_gn(hw: int = 0, c: int = 0) -> bool:
    """Whole-scan A/B on the v5e (BENCHMARKS.md): the jnp path is ~3% faster
    end-to-end at the UNet's dominant 64^2x320 / 32^2x640 shapes (XLA's
    reduce+normalize fusion wins there); the kernel beat XLA 1.6x in
    isolation at 16^2x1280. LDMSEG_GROUPNORM: 'jnp' (default), 'pallas'
    (kernel whenever the block fits), or 'auto' (kernel only at the
    small-grid/wide-channel shapes where it measured faster)."""
    mode = os.environ.get("LDMSEG_GROUPNORM", "jnp")
    if mode == "auto":
        return hw <= 16 * 16 and c >= 1280
    return mode == "pallas"


def group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    num_groups: int = 32,
    eps: float = 1e-6,
    apply_silu: bool = True,
    dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """GroupNorm over NHWC input, optional fused SiLU.

    Statistics are computed in fp32 regardless of input dtype. Default path
    is jnp (XLA's reduce+normalize fusion won the whole-scan A/B at the
    UNet's dominant shapes — BENCHMARKS.md); LDMSEG_GROUPNORM=pallas opts
    into the one-pass Pallas kernel wherever the [HW, C] block fits VMEM,
    and =auto uses it only at the small-grid/wide-channel shapes where it
    measured faster (16^2 x >=1280ch).
    """
    orig_dtype = dtype or x.dtype
    b, h, w, c = x.shape
    assert c % num_groups == 0, (c, num_groups)
    hw = h * w
    fits = hw * c * x.dtype.itemsize <= _PALLAS_GN_MAX_BYTES
    if (interpret or _use_pallas_gn(hw, c)) and fits and _pick_chunk(hw, c):
        return _gn_silu_fused(
            x, scale, bias, num_groups, eps, apply_silu, orig_dtype, interpret
        )
    return _gn_silu_jnp(
        x, scale, bias, num_groups=num_groups, eps=eps, apply_silu=apply_silu,
        out_dtype=orig_dtype,
    )
