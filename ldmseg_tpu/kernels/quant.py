"""Int8 quantized matmul/conv paths for TPU serving.

The v5e MXU executes int8 x int8 -> int32 at ~2x the bf16 rate (394 vs 197
TOPS); with the bf16 sampling pipeline structurally saturated (BENCHMARKS.md
round 2: convs at XLA's ~60% MFU ceiling, flash kernels at ~70% of the
padded-matmul roofline) this is the remaining hardware lever on this chip.

Scheme (standard dynamic post-training quantization, serving-only):
  * weights: symmetric per-output-channel int8, quantized in-graph from the
    checkpoint params — loop-invariant, so XLA hoists the quantization out
    of the DDIM sampling scan exactly like the fp32->bf16 weight converts;
  * activations: symmetric dynamic int8 — per-tensor abs-max by default, or
    per-token (matmul) / per-sample (conv) scales with LDMSEG_INT8_ACT=row
    (the finest exact granularities; a fallback if the per-tensor quality
    gate fails);
  * accumulation in int32, dequantized by (scale_x * scale_w[co]) in fp32,
    bias added afterwards in the compute dtype.

This replaces nothing in the reference (it has no quantized path; its AMP
fp16 autocast is the closest analogue, trainers_ldm_cond.py:106) — it is a
TPU-native serving mode, OFF by default. Enable with LDMSEG_INT8=1 (convs +
dense projections; the flash-attention kernel stays bf16 — softmax logits
are precision-sensitive and the attention matmuls are padding-bound, not
MXU-peak-bound, see BENCHMARKS.md head-packing analysis).

Numerical sanity is tested on CPU (tests/test_quant.py); end-to-end error
and throughput are measured on-chip and recorded in BENCHMARKS.md.
"""

from __future__ import annotations

import contextlib
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# trace-time scope stack: modules push their name while tracing so the knob
# can target e.g. only the UNet (LDMSEG_INT8=unet). Python-level state is
# correct here because the branch is decided at trace time, like the env
# reads elsewhere in kernels/.
_SCOPES: list = []


@contextlib.contextmanager
def quant_scope(name: str):
    """Mark the dynamic extent of a model's trace (e.g. 'unet')."""
    _SCOPES.append(name)
    try:
        yield
    finally:
        _SCOPES.pop()


def int8_enabled() -> bool:
    """Serving-time int8 knob (read per trace; a retrace picks up changes).

    LDMSEG_INT8=1|all  quantize every conv/dense routed through the wrappers
    LDMSEG_INT8=unet   quantize only layers traced inside quant_scope('unet')
                       (the DDIM scan is >95% of sampling time; the frozen
                       VAEs stay bf16)
    LDMSEG_INT8=0/unset  off (default)
    """
    mode = os.environ.get("LDMSEG_INT8", "0")
    if mode in ("0", ""):
        return False
    if mode in ("1", "all"):
        return True
    return mode in _SCOPES


@jax.custom_vjp
def _no_grad_guard(x: jnp.ndarray) -> jnp.ndarray:
    """Identity whose backward raises: the int8 path is serving-only, and
    differentiating through round() would otherwise yield silent zero
    gradients — turn that into a loud trace-time error instead."""
    return x


def _no_grad_guard_fwd(x):
    return x, None


def _no_grad_guard_bwd(_, g):
    raise NotImplementedError(
        "the LDMSEG_INT8 serving path is not differentiable; unset "
        "LDMSEG_INT8 for training"
    )


_no_grad_guard.defvjp(_no_grad_guard_fwd, _no_grad_guard_bwd)


def act_granularity() -> str:
    """Activation-scale granularity knob (read per trace).

    LDMSEG_INT8_ACT=tensor  one scale per activation tensor (default)
    LDMSEG_INT8_ACT=row     per-token scales for matmuls ([..., 1] over the
                            contraction dim) and per-sample scales for convs
                            ([N,1,1,1]) — the finest granularities that stay
                            exact (the scale is constant across every
                            contraction axis), recovering most of the
                            per-tensor quantization error for outlier tokens
                            at the cost of a slightly larger dequant multiply.
    """
    gran = os.environ.get("LDMSEG_INT8_ACT", "tensor")
    if gran not in ("tensor", "row"):
        raise ValueError(f"LDMSEG_INT8_ACT must be 'tensor' or 'row', got {gran!r}")
    return gran


def quantize_per_tensor(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-tensor int8: returns (q, scale) with x ~= q * scale."""
    x = _no_grad_guard(x)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_activations(
    x: jnp.ndarray, contract_axes: Sequence[int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 activations at the configured granularity.

    Returns (q, scale) with scale shaped to broadcast against x (size 1 on
    every axis in ``contract_axes``, which must cover all contraction axes
    of the consuming matmul/conv for the dequant to be exact).
    """
    if act_granularity() == "tensor":
        q, s = quantize_per_tensor(x)
        return q, jnp.reshape(s, (1,) * x.ndim)
    x = _no_grad_guard(x)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=tuple(contract_axes),
                   keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_per_channel(
    w: jnp.ndarray, channel_axis: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-channel int8 over every axis except ``channel_axis``.

    Returns (q, scale) with w ~= q * scale broadcast along channel_axis;
    scale has w.ndim dims (size 1 everywhere except channel_axis) so it
    broadcasts against conv/dense outputs whose channels are minor.
    """
    axes = tuple(i for i in range(w.ndim) if i != channel_axis)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    stride: Sequence[int],
    padding,
    out_dtype: jnp.dtype,
) -> jnp.ndarray:
    """NHWC x HWIO conv in int8 with int32 accumulation, dequantized output.

    Weight quantization is a pure function of ``w`` — inside a sampling
    scan XLA hoists it next to the (also hoisted) bf16 weight converts, so
    the per-step cost is the int8 conv plus one quantize pass over x.
    """
    xq, sx = quantize_activations(x, contract_axes=(1, 2, 3))  # [N,1,1,1]
    wq, sw = quantize_per_channel(w, channel_axis=3)  # [1,1,1,Co]
    acc = jax.lax.conv_general_dilated(
        xq, wq, tuple(stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    deq = acc.astype(jnp.float32) * (sx * sw.reshape(1, 1, 1, -1))
    return deq.astype(out_dtype)


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray, out_dtype: jnp.dtype) -> jnp.ndarray:
    """[..., K] x [K, N] int8 matmul with int32 accumulation."""
    xq, sx = quantize_activations(x, contract_axes=(x.ndim - 1,))  # [..., 1]
    wq, sw = quantize_per_channel(w, channel_axis=1)  # [1, N]
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    deq = acc.astype(jnp.float32) * (sx * sw.reshape(
        (1,) * (acc.ndim - 1) + (-1,)
    ))
    return deq.astype(out_dtype)
