"""Attention kernels for latent-grid self-attention.

The UNet attends over 64x64=4096 ... 8x8=64 latent tokens (SURVEY §3.5).
The reference leaves this to cuDNN (its xformers flag is dead code,
SURVEY §2.9); here the hot path is a Pallas flash-attention forward kernel
(online-softmax, never materializing the S x S matrix in HBM), with

  * a jnp reference implementation (used on CPU, and as the mathematical
    oracle in tests), and
  * a recompute-based backward: flash forward + reference VJP. The bwd
    recompute is the standard memory/FLOP trade and keeps training exact.

All shapes are [batch, seq, heads, head_dim]; softmax statistics in fp32.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only imports cleanly on TPU-capable builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def mha_reference(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: Optional[float] = None
) -> jnp.ndarray:
    """Plain attention: [B, Sq, H, D] x [B, Sk, H, D] -> [B, Sq, H, D]."""
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale, nk):
    """One (q-block, k-block) step of online-softmax attention.

    Grid: (batch*heads, num_q_blocks, num_k_blocks); the k axis is innermost
    and sequential on TPU, so VMEM scratch carries the running statistics.
    """
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    # keep inputs in their native dtype (bf16 matmuls run the MXU at full
    # rate); accumulate in fp32 via preferred_element_type
    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    v = v_ref[0]  # [bk, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk] fp32

    m_prev = m_ref[:, :1]                      # [bq, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                     # [bq, bk] fp32
    alpha = jnp.exp(m_prev - m_new)            # [bq, 1]
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block_q: int,
    block_k: int,
    interpret: bool,
) -> jnp.ndarray:
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bq = min(block_q, sq)
    bk = min(block_k, sk)
    assert sq % bq == 0 and sk % bk == 0, (sq, bq, sk, bk)

    # fold heads into batch; kernel sees [BH, S, D]
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)

    nq, nk = sq // bq, sk // bk
    grid = (b * h, nq, nk)

    if pltpu is None:  # pragma: no cover
        raise RuntimeError("Pallas TPU backend unavailable; use mha_reference")
    kernel = functools.partial(_flash_kernel, scale=scale, nk=nk)
    scratch_shapes = [
        pltpu.VMEM((bq, d), jnp.float32),
        pltpu.VMEM((bq, 128), jnp.float32),
        pltpu.VMEM((bq, 128), jnp.float32),
    ]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda bh, iq, ik: (bh, iq, 0)),
            pl.BlockSpec((1, bk, d), lambda bh, iq, ik: (bh, ik, 0)),
            pl.BlockSpec((1, bk, d), lambda bh, iq, ik: (bh, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda bh, iq, ik: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 2048,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    scale = (q.shape[-1] ** -0.5) if scale is None else scale
    return _flash_forward(
        q, k, v, scale=scale, block_q=block_q, block_k=block_k, interpret=interpret
    )


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    out = flash_attention(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v, out)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    """Chunked-recompute attention backward.

    The naive VJP materializes the full [BH, S, S] score matrix (4+ GB at
    4096 tokens) — instead scan over q chunks, recomputing scores per chunk
    (flash-attention backward math in XLA): memory O(S * block_q).
    """
    q, k, v, out = res
    scale_ = (q.shape[-1] ** -0.5) if scale is None else scale
    b, sq, h, d = q.shape
    bq = min(block_q, sq)
    n_chunks = sq // bq
    if sq % bq != 0:  # fall back for ragged shapes
        _, vjp = jax.vjp(
            lambda q_, k_, v_: mha_reference(q_, k_, v_, scale_), q, k, v
        )
        return vjp(g)

    qc = q.reshape(b, n_chunks, bq, h, d)
    gc = g.reshape(b, n_chunks, bq, h, d)
    oc = out.reshape(b, n_chunks, bq, h, d)

    def chunk_grads(carry, xs):
        dk_acc, dv_acc = carry
        q_c, g_c, o_c = xs  # [B, bq, H, D]
        s = jnp.einsum("bqhd,bkhd->bhqk", q_c, k,
                       preferred_element_type=jnp.float32) * scale_
        p = jax.nn.softmax(s, axis=-1)                       # [B,H,bq,Sk]
        dp = jnp.einsum("bqhd,bkhd->bhqk", g_c, v,
                        preferred_element_type=jnp.float32)
        delta = jnp.sum(g_c.astype(jnp.float32) * o_c.astype(jnp.float32),
                        axis=-1)                              # [B,bq,H]
        ds = p * (dp - delta.transpose(0, 2, 1)[..., None])   # [B,H,bq,Sk]
        dq_c = jnp.einsum("bhqk,bkhd->bqhd", ds, k,
                          preferred_element_type=jnp.float32) * scale_
        dk_c = jnp.einsum("bhqk,bqhd->bkhd", ds, q_c,
                          preferred_element_type=jnp.float32) * scale_
        dv_c = jnp.einsum("bhqk,bqhd->bkhd",
                          p.astype(g_c.dtype), g_c,
                          preferred_element_type=jnp.float32)
        return (dk_acc + dk_c, dv_acc + dv_c), dq_c

    init = (
        jnp.zeros(k.shape, jnp.float32),
        jnp.zeros(v.shape, jnp.float32),
    )
    (dk, dv), dqs = jax.lax.scan(
        chunk_grads, init,
        (qc.transpose(1, 0, 2, 3, 4), gc.transpose(1, 0, 2, 3, 4),
         oc.transpose(1, 0, 2, 3, 4)),
    )
    dq = dqs.transpose(1, 0, 2, 3, 4).reshape(b, sq, h, d)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def _use_flash() -> bool:
    mode = os.environ.get("LDMSEG_ATTENTION", "auto")
    if mode == "flash":
        return True
    if mode == "reference":
        return False
    return jax.default_backend() == "tpu"


def multi_head_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: Optional[float] = None
) -> jnp.ndarray:
    """Dispatch: Pallas flash attention on TPU, jnp reference elsewhere.

    Env overrides: LDMSEG_ATTENTION={auto,flash,reference},
    LDMSEG_FLASH_BLOCK_Q / LDMSEG_FLASH_BLOCK_K (default 512).
    """
    # defaults from the TPU v5e block sweep (BENCHMARKS.md): q=2048, k=1024
    # is ~30% faster than 512x512 on the 4096-token latent grids
    bq = int(os.environ.get("LDMSEG_FLASH_BLOCK_Q", "2048"))
    bk = int(os.environ.get("LDMSEG_FLASH_BLOCK_K", "1024"))
    # VMEM guard: the fp32 S block + bf16 P must fit comfortably (~16MB/core);
    # shrink block_k first (block_q gave the smaller win in the sweep)
    while bq * bk * 6 > 12 * 2 ** 20 and bk > 512:
        bk //= 2
    while bq * bk * 6 > 12 * 2 ** 20 and bq > 512:
        bq //= 2
    sq, sk = q.shape[1], k.shape[1]
    flash_ok = (
        _use_flash()
        and sq % min(bq, sq) == 0
        and sk % min(bk, sk) == 0
        and sq >= 128  # tiny grids aren't worth a kernel launch
    )
    if flash_ok:
        return flash_attention(q, k, v, scale, bq, bk)
    return mha_reference(q, k, v, scale)
