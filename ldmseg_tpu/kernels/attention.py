"""Attention kernels for latent-grid self-attention.

The UNet attends over 64x64=4096 ... 8x8=64 latent tokens (SURVEY §3.5).
The reference leaves this to cuDNN (its xformers flag is dead code,
SURVEY §2.9); here the hot path is a Pallas flash-attention forward kernel
(online-softmax, never materializing the S x S matrix in HBM), with

  * a jnp reference implementation (used on CPU, and as the mathematical
    oracle in tests),
  * Pallas backward kernels (dK/dV and dQ sweeps over score blocks, the
    standard flash-attention backward with per-row logsumexp saved by the
    forward and delta = rowsum(dO * O) recomputed in-kernel), and
  * a chunked-recompute XLA backward as the fallback for ragged shapes
    (memory O(S * block_q), flash math in XLA).

All shapes are [batch, seq, heads, head_dim]; softmax statistics in fp32.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
try:
    from jax import shard_map  # public since jax 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ldmseg_tpu.core.mesh import current_sp_mesh

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


def _flash_kernel_res(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *, scale, nk
):
    """Forward that additionally saves per-row logsumexp (for the backward).

    lse block is [bq, 128] with the value broadcast across lanes — keeps the
    aux array tile-aligned with no sublane<->lane relayout.
    """
    _flash_kernel(
        q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, scale=scale, nk=nk
    )

    @pl.when(pl.program_id(2) == nk - 1)
    def _save_lse():
        lse_ref[0] = m_ref[...] + jnp.log(l_ref[...])


def _sliced_layout(h: int, d: int) -> bool:
    """Head-sliced input layout: the kernel's BlockSpec picks each head's
    d-lane window straight out of the [B, S, H*D] projection output, so no
    [B,S,H,D]->[B,H,S,D] transpose copies (and no lane-padded [BH, S, D]
    intermediates — XLA pads a 40-lane minor dim to 128 in HBM) ever
    materialize.

    MEASURED DEAD END for the UNet's d=40 heads: Mosaic requires the lane
    (minor) block dim to be a multiple of 128 or the full array dim, so a
    40-wide head window over [B, S, 320] cannot lower (BENCHMARKS.md round
    2). Only engaged when the window is lowerable (d % 128 == 0, or a
    single head where the window IS the array); otherwise the folded
    layout is used regardless of LDMSEG_FLASH_LAYOUT."""
    if os.environ.get("LDMSEG_FLASH_LAYOUT", "fold") != "sliced":
        return False
    return h == 1 or d % 128 == 0


def _flash_forward_sliced(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    bq: int,
    bk: int,
    interpret: bool,
):
    """Forward with head-sliced BlockSpecs over [B, S, H*D] arrays.

    Grid stays (B*H, nq, nk); axis-2 block index (bh % h) selects the
    head's d-wide lane window. Only the inference path (no lse residual)
    uses this — the training forward keeps the folded layout."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    nq, nk = sq // bq, sk // bk

    qf = q.reshape(b, sq, h * d)
    kf = k.reshape(b, sk, h * d)
    vf = v.reshape(b, sk, h * d)

    def q_idx(bh, iq, ik, h=h):
        return (bh // h, iq, bh % h)

    def kv_idx(bh, iq, ik, h=h):
        return (bh // h, ik, bh % h)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, nk=nk),
        grid=(b * h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), q_idx),
            pl.BlockSpec((1, bk, d), kv_idx),
            pl.BlockSpec((1, bk, d), kv_idx),
        ],
        out_specs=pl.BlockSpec((1, bq, d), q_idx),
        out_shape=jax.ShapeDtypeStruct((b, sq, h * d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(qf, kf, vf)
    return out.reshape(b, sq, h, d)


def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block_q: int,
    block_k: int,
    interpret: bool,
    save_lse: bool = False,
):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bq = min(block_q, sq)
    bk = min(block_k, sk)
    assert sq % bq == 0 and sk % bk == 0, (sq, bq, sk, bk)

    if pltpu is None:  # pragma: no cover
        raise RuntimeError("Pallas TPU backend unavailable; use mha_reference")

    if not save_lse and _sliced_layout(h, d):
        return _flash_forward_sliced(
            q, k, v, scale=scale, bq=bq, bk=bk, interpret=interpret
        )

    # fold heads into batch; kernel sees [BH, S, D]
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)

    nq, nk = sq // bq, sk // bk
    grid = (b * h, nq, nk)
    scratch_shapes = [
        pltpu.VMEM((bq, d), jnp.float32),
        pltpu.VMEM((bq, 128), jnp.float32),
        pltpu.VMEM((bq, 128), jnp.float32),
    ]
    in_specs = [
        pl.BlockSpec((1, bq, d), lambda bh, iq, ik: (bh, iq, 0)),
        pl.BlockSpec((1, bk, d), lambda bh, iq, ik: (bh, ik, 0)),
        pl.BlockSpec((1, bk, d), lambda bh, iq, ik: (bh, ik, 0)),
    ]
    o_spec = pl.BlockSpec((1, bq, d), lambda bh, iq, ik: (bh, iq, 0))
    o_shape = jax.ShapeDtypeStruct((b * h, sq, d), q.dtype)

    if save_lse:
        out, lse = pl.pallas_call(
            functools.partial(_flash_kernel_res, scale=scale, nk=nk),
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                o_spec,
                pl.BlockSpec((1, bq, 128), lambda bh, iq, ik: (bh, iq, 0)),
            ),
            out_shape=(
                o_shape,
                jax.ShapeDtypeStruct((b * h, sq, 128), jnp.float32),
            ),
            scratch_shapes=scratch_shapes,
            interpret=interpret,
            compiler_params=_compiler_params(),
        )(qf, kf, vf)
        return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3), lse

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, nk=nk),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=o_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(qf, kf, vf)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def _flash_bwd_dkdv_kernel(
    q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale, nq,
):
    """dK/dV for one k-block, accumulated over the (innermost) q-block axis.

    p = exp(s - lse); dv += p^T dO; ds = p*(dO V^T - delta); dk += ds^T q.
    delta = rowsum(dO * O) is recomputed per q-block (cheap elementwise).
    """
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    lse = lse_ref[0][:, :1]  # [bq, 1] fp32

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]
    p = jnp.exp(s - lse)  # fp32
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # [bq, 1]
    ds = p * (dp - delta) * scale
    dk_acc[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref, dq_ref, dq_acc, *, scale, nk
):
    """dQ for one q-block, accumulated over the (innermost) k-block axis."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    lse = lse_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )
    ds = p * (dp - delta) * scale
    dq_acc[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _flash_backward_pallas(
    q, k, v, out, lse, g, *, scale, block_q, block_k, interpret
):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bq = min(block_q, sq)
    bk = min(block_k, sk)
    assert sq % bq == 0 and sk % bk == 0, (sq, bq, sk, bk)
    # residuals carry one lse lane ([BH, S, 1]); re-broadcast to the
    # tile-aligned 128-lane layout the kernels read (cheap copy vs
    # holding the 128x array across the whole forward->backward gap)
    lse = jnp.broadcast_to(lse, (*lse.shape[:-1], 128))

    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(  # noqa: E731
        b * h, x.shape[1], d
    )
    qf, kf, vf, of, gf = fold(q), fold(k), fold(v), fold(out), fold(g)
    nq, nk = sq // bq, sk // bk

    q_spec_kv = pl.BlockSpec((1, bq, d), lambda bh, ik, iq: (bh, iq, 0))
    lse_spec_kv = pl.BlockSpec((1, bq, 128), lambda bh, ik, iq: (bh, iq, 0))
    kv_spec_kv = pl.BlockSpec((1, bk, d), lambda bh, ik, iq: (bh, ik, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkdv_kernel, scale=scale, nq=nq),
        grid=(b * h, nk, nq),
        in_specs=[q_spec_kv, q_spec_kv, q_spec_kv, lse_spec_kv,
                  kv_spec_kv, kv_spec_kv],
        out_specs=(kv_spec_kv, kv_spec_kv),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, sk, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(qf, gf, of, lse, kf, vf)

    q_spec_q = pl.BlockSpec((1, bq, d), lambda bh, iq, ik: (bh, iq, 0))
    lse_spec_q = pl.BlockSpec((1, bq, 128), lambda bh, iq, ik: (bh, iq, 0))
    kv_spec_q = pl.BlockSpec((1, bk, d), lambda bh, iq, ik: (bh, ik, 0))
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, nk=nk),
        grid=(b * h, nq, nk),
        in_specs=[q_spec_q, q_spec_q, q_spec_q, lse_spec_q,
                  kv_spec_q, kv_spec_q],
        out_specs=q_spec_q,
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=interpret,
        compiler_params=_compiler_params(),
    )(qf, gf, of, lse, kf, vf)

    unfold = lambda x, s: x.reshape(b, h, s, d).transpose(0, 2, 1, 3)  # noqa: E731
    return unfold(dq, sq), unfold(dk, sk), unfold(dv, sk)


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


def _pad128(d: int) -> int:
    return -(-d // 128) * 128


def _fwd_vmem_est(bq: int, bk: int, dp: int, save_lse: bool = False) -> int:
    """Rough Mosaic scoped-VMEM bytes for the forward kernel: double-buffered
    bf16 IO blocks (q, o / k, v), fp32 acc + m/l scratch, one fp32 [bq, bk]
    score temp (calibrated against observed compiles: d=40 q2048/k1024 fits
    at ~14.7M; d=512 OOMs at 23.87M)."""
    io = 8 * dp * (bq + bk)
    scratch = 4 * bq * dp + 1024 * bq
    if save_lse:
        io += 1024 * bq
    return 4 * bq * bk + io + scratch


def _bwd_vmem_est(bq: int, bk: int, dp: int) -> int:
    """dK/dV kernel bound (more temps than dQ): ~2.5 fp32 [bq, bk] score
    temps (s, p, dp, ds streamed), bf16 IO q/do/o + k/v + dk/dv outputs,
    fp32 accumulators, lse block."""
    temps = 10 * bq * bk
    io = 12 * bq * dp + 16 * bk * dp + 1024 * bq
    scratch = 8 * bk * dp
    return temps + io + scratch


# Mosaic scoped-VMEM budget for block sizing. The Mosaic default limit is
# 16MB; LDMSEG_FLASH_VMEM_MB raises it (passed per-kernel via
# CompilerParams.vmem_limit_bytes — global XLA_FLAGS don't survive the
# axon remote-compile client) to unlock larger blocks.
_VMEM_BUDGET = int(
    float(os.environ.get("LDMSEG_FLASH_VMEM_MB", "15.5")) * 2 ** 20
)


def _compiler_params():
    if pltpu is None:  # pragma: no cover
        return None
    # headroom over our own conservative block estimate
    limit = min(int(_VMEM_BUDGET * 1.25) + 2 * 2 ** 20, 110 * 2 ** 20)
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def _shrink_blocks(est, bq: int, bk: int, *, floor: int = 256):
    """Halve the larger block until the VMEM estimate fits the budget."""
    while est(bq, bk) > _VMEM_BUDGET and max(bq, bk) > floor:
        if bq >= bk and bq > floor:
            bq //= 2
        else:
            bk //= 2
    return bq, bk


def _bwd_blocks(sq: int, sk: int, d: int):
    """Backward block sizes (env-tunable; d-aware VMEM shrink)."""
    bq = min(int(os.environ.get("LDMSEG_FLASH_BWD_BLOCK_Q", "512")), sq)
    bk = min(int(os.environ.get("LDMSEG_FLASH_BWD_BLOCK_K", "1024")), sk)
    dp = _pad128(d)
    return _shrink_blocks(lambda q_, k_: _bwd_vmem_est(q_, k_, dp), bq, bk)


def _use_pallas_bwd() -> bool:
    mode = os.environ.get("LDMSEG_FLASH_BWD", "auto")
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    return jax.default_backend() == "tpu"


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    scale_ = (q.shape[-1] ** -0.5) if scale is None else scale
    # the residual-saving forward carries the extra lse output block plus
    # stats scratch: the inference-tuned q=2048 block VMEM-OOMs, so cap it
    # (training-path block size, tuned independently) and apply the d-aware
    # VMEM shrink
    res_bq = min(block_q,
                 int(os.environ.get("LDMSEG_FLASH_FWD_RES_BLOCK_Q", "1024")),
                 q.shape[1])
    res_bk = min(block_k, k.shape[1])
    dp = _pad128(q.shape[-1])
    res_bq, res_bk = _shrink_blocks(
        lambda q_, k_: _fwd_vmem_est(q_, k_, dp, save_lse=True),
        res_bq, res_bk,
    )
    while q.shape[1] % res_bq and res_bq > 8:
        res_bq //= 2
    while k.shape[1] % res_bk and res_bk > 8:
        res_bk //= 2
    if q.shape[1] % res_bq or k.shape[1] % res_bk:
        # Ragged sequence (e.g. sq=1100): no Pallas residual forward —
        # compute the primal in XLA and let the backward take the
        # lse-free recompute path instead of tripping the block assert.
        out = mha_reference(q, k, v, scale_)
        return out, (q, k, v, out, None)
    out, lse = _flash_forward(
        q, k, v, scale=scale_, block_q=res_bq, block_k=res_bk,
        interpret=interpret, save_lse=True,
    )
    # The kernel writes lse broadcast across all 128 lanes (tile-aligned
    # store); keep only one lane in the saved residuals — the full array
    # would be 128x larger than needed from forward to backward (~134MB
    # per 4096-token attention at B*H=64). Re-broadcast in the backward.
    return out, (q, k, v, out, lse[..., :1])


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    """Flash-attention backward: Pallas kernels when blocks divide the
    sequence; otherwise chunked recompute in XLA (memory O(S * block_q) —
    the naive VJP would materialize the full [BH, S, S] score matrix,
    4+ GB at 4096 tokens).
    """
    q, k, v, out, lse = res
    sq, sk = q.shape[1], k.shape[1]
    bwd_bq, bwd_bk = _bwd_blocks(sq, sk, q.shape[-1])
    if (
        lse is not None
        and (interpret or _use_pallas_bwd())
        and sq % bwd_bq == 0
        and sk % bwd_bk == 0
    ):
        scale_ = (q.shape[-1] ** -0.5) if scale is None else scale
        return _flash_backward_pallas(
            q, k, v, out, lse, g, scale=scale_, block_q=bwd_bq,
            block_k=bwd_bk, interpret=interpret,
        )
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

    Inside an active ``core.mesh.sp_scope`` (spatially partitioned serving,
    mesh sp axis > 1) the computation runs sequence-parallel via shard_map.
    Two collective strategies (LDMSEG_SP_ATTN, default ``auto``):

      * ``allgather`` — each sp shard keeps its local Q rows and all-gathers
        K/V over the sp axis (one ICI all-gather per attention; the latent
        K/V are small — 4096 x d per head at 512^2). O(S) K/V per chip.
      * ``ring`` — ring attention: K/V blocks circulate via ppermute while
        each shard merges partial attention with online-softmax statistics.
        O(S/sp) memory per chip — the lever for resolutions whose FULL
        K/V no longer fit one chip (``auto`` switches when gathered K/V
        would exceed LDMSEG_SP_RING_MB, default 128).

    The reference has no sequence/spatial parallelism at all (SURVEY §5:
    absent); this is the TPU-native lever for resolutions whose activations
    exceed one chip.

    Env overrides: LDMSEG_ATTENTION={auto,flash,reference},
    LDMSEG_FLASH_BLOCK_Q / LDMSEG_FLASH_BLOCK_K (default 512).
    """
    mesh = current_sp_mesh()
    if mesh is not None and q.shape[1] % mesh.shape["sp"] == 0 and q.shape[1] > 1:
        from jax.sharding import PartitionSpec as P

        n_sp = mesh.shape["sp"]
        # batch stays sharded over data x fsdp when divisible (serving
        # meshes are usually (1, 1, sp); combined DP x SP also works)
        dp = mesh.shape.get("data", 1) * mesh.shape.get("fsdp", 1)
        bspec = ("data", "fsdp") if q.shape[0] % dp == 0 and dp > 1 else None
        spec = P(bspec, "sp", None, None)

        mode = os.environ.get("LDMSEG_SP_ATTN", "auto")
        if mode == "auto":
            kv_mb = (2 * q.shape[0] * q.shape[1] * q.shape[2] * q.shape[3]
                     * k.dtype.itemsize) / 2**20
            mode = ("ring" if kv_mb >
                    float(os.environ.get("LDMSEG_SP_RING_MB", "128"))
                    else "allgather")

        if mode == "ring":
            def local(ql, kl, vl):
                return _ring_attention_local(ql, kl, vl, scale, "sp", n_sp)
        else:
            def local(ql, kl, vl):
                kf = jax.lax.all_gather(kl, "sp", axis=1, tiled=True)
                vf = jax.lax.all_gather(vl, "sp", axis=1, tiled=True)
                return _mha_dispatch(ql, kf, vf, scale)

        return shard_map(
            local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
        )(q, k, v)
    return _mha_dispatch(q, k, v, scale)


def _ring_attention_local(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: Optional[float], axis: str, n: int,
) -> jnp.ndarray:
    """Ring attention over the ``axis`` mesh dimension (runs inside
    shard_map; q/k/v are the LOCAL [B, S/n, H, D] shards).

    Each of the ``n`` steps attends the local Q rows to the currently held
    K/V block, folds the result into running online-softmax statistics
    (max m, normalizer l, accumulator acc — the same math as the flash
    kernel, at block granularity), then passes the K/V block to the next
    device on the ICI ring via ppermute. Total memory is O(S/n) per chip
    and the ppermute traffic overlaps with the block compute.
    """
    scale = (q.shape[-1] ** -0.5) if scale is None else scale
    qf = q.astype(jnp.float32)
    b, sq, h, d = q.shape
    perm = [(j, (j + 1) % n) for j in range(n)]

    def body(_, carry):
        k_blk, v_blk, m, l, acc = carry
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, k_blk.astype(jnp.float32),
                       preferred_element_type=jnp.float32) * scale
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        return (k_blk, v_blk, m_new, l, acc)

    # fresh zeros are device-UNvarying inside shard_map while the loop body
    # makes them sp-varying — mark them varying up front so the fori_loop
    # carry types match (jax vma rules). pcast(to='varying') is the
    # current spelling; older jax only has pvary.
    if hasattr(jax.lax, "pcast"):
        _vary = functools.partial(jax.lax.pcast, axis_name=(axis,),
                                  to="varying")
    else:  # pragma: no cover - jax < 0.9
        _vary = functools.partial(jax.lax.pvary, axis_name=(axis,))
    m0 = _vary(jnp.full((b, h, sq), -jnp.inf, jnp.float32))
    l0 = _vary(jnp.zeros((b, h, sq), jnp.float32))
    acc0 = _vary(jnp.zeros((b, h, sq, d), jnp.float32))
    _, _, _, l, acc = jax.lax.fori_loop(0, n, body, (k, v, m0, l0, acc0))
    out = acc / l[..., None]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def _mha_dispatch(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: Optional[float] = None
) -> jnp.ndarray:
    """Single-shard dispatch: flash kernel when the shape gates allow."""
    # defaults from the TPU v5e block sweep (BENCHMARKS.md): q=2048, k=1024
    # is ~30% faster than 512x512 on the 4096-token latent grids
    bq = int(os.environ.get("LDMSEG_FLASH_BLOCK_Q", "2048"))
    bk = int(os.environ.get("LDMSEG_FLASH_BLOCK_K", "1024"))
    sq, sk = q.shape[1], k.shape[1]
    bq, bk = min(bq, sq), min(bk, sk)
    # d-aware VMEM guard: blocks scale with the PADDED head dim. The tuned
    # 2048x1024 fits for the UNet's d=40..160 but the SD-VAE mid-block
    # single-head d=512 attention needs 23.9MB scoped VMEM and fails to
    # compile — this silently broke every encode-containing program until
    # diagnosed (BENCHMARKS.md).
    dp = _pad128(q.shape[-1])
    bq, bk = _shrink_blocks(
        lambda q_, k_: _fwd_vmem_est(q_, k_, dp), bq, bk
    )
    flash_ok = (
        _use_flash()
        and sq % min(bq, sq) == 0
        and sk % min(bk, sk) == 0
        and sq >= 128  # tiny grids aren't worth a kernel launch
    )
    if flash_ok:
        return flash_attention(q, k, v, scale, bq, bk)
    return mha_reference(q, k, v, scale)
