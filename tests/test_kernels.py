"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldmseg_tpu.kernels.attention import flash_attention, mha_reference


@pytest.mark.parametrize("seq,dim,heads", [(128, 32, 2), (256, 64, 4)])
def test_flash_attention_interpret_matches_reference(seq, dim, heads):
    rng = np.random.default_rng(0)
    b = 2
    q = rng.normal(size=(b, seq, heads, dim)).astype(np.float32)
    k = rng.normal(size=(b, seq, heads, dim)).astype(np.float32)
    v = rng.normal(size=(b, seq, heads, dim)).astype(np.float32)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        None, 64, 64, True,  # block_q, block_k, interpret
    )
    ref = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_gradients_match_reference():
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 128, 2, 32
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, 64, 64, True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_flash_attention_bf16_inputs():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 128, 2, 32)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 128, 2, 32)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 128, 2, 32)), jnp.bfloat16)
    out = flash_attention(q, k, v, None, 64, 64, True)
    ref = mha_reference(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


# ---------------- fused GroupNorm+SiLU ----------------

from ldmseg_tpu.kernels.norms import _gn_silu_jnp, group_norm_silu  # noqa: E402


@pytest.mark.parametrize("hw,c,g", [(16, 64, 8), (64, 320, 32), (8, 128, 32)])
@pytest.mark.parametrize("silu", [True, False])
def test_group_norm_pallas_interpret_matches_jnp(hw, c, g, silu):
    rng = np.random.default_rng(3)
    h = w = int(hw ** 0.5)
    if h * w != hw:
        h, w = hw, 1
    x = jnp.asarray(rng.normal(size=(2, h, w, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    out = group_norm_silu(
        x, scale, bias, num_groups=g, eps=1e-5, apply_silu=silu,
        interpret=True,
    )
    ref = _gn_silu_jnp(
        x, scale, bias, num_groups=g, eps=1e-5, apply_silu=silu,
        out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_group_norm_pallas_bf16_and_chunking():
    # hw*c*4 > 2MB forces the in-kernel fori chunking path
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 160)), jnp.bfloat16)
    scale = jnp.asarray(rng.normal(size=(160,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(160,)).astype(np.float32))
    out = group_norm_silu(
        x, scale, bias, num_groups=32, eps=1e-5, apply_silu=True,
        interpret=True,
    )
    ref = _gn_silu_jnp(
        x, scale, bias, num_groups=32, eps=1e-5, apply_silu=True,
        out_dtype=jnp.bfloat16,
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_group_norm_auto_dispatch(monkeypatch):
    """'auto' selects the Pallas kernel only at the small-grid/wide-channel
    shapes where it measured faster (BENCHMARKS.md: 1.6x at 16^2 x 1280)."""
    from ldmseg_tpu.kernels.norms import _use_pallas_gn

    monkeypatch.setenv("LDMSEG_GROUPNORM", "auto")
    assert _use_pallas_gn(16 * 16, 1280)
    assert not _use_pallas_gn(64 * 64, 320)
    assert not _use_pallas_gn(32 * 32, 640)
    monkeypatch.setenv("LDMSEG_GROUPNORM", "jnp")
    assert not _use_pallas_gn(16 * 16, 1280)
    monkeypatch.setenv("LDMSEG_GROUPNORM", "pallas")
    assert _use_pallas_gn(64 * 64, 320)


def test_group_norm_pallas_gradients_match_jnp():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 64)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))

    def f_pallas(x, s, b):
        return jnp.sum(group_norm_silu(
            x, s, b, num_groups=8, eps=1e-5, apply_silu=True, interpret=True
        ) ** 2)

    def f_jnp(x, s, b):
        return jnp.sum(_gn_silu_jnp(
            x, s, b, num_groups=8, eps=1e-5, apply_silu=True,
            out_dtype=jnp.float32,
        ) ** 2)

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(f_jnp, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


# ---------------- flash-attention backward paths ----------------


def _grad_ref(q, k, v):
    f = lambda q, k, v: jnp.sum(mha_reference(q, k, v) ** 2)  # noqa: E731
    return jax.grad(f, argnums=(0, 1, 2))(q, k, v)


def test_flash_bwd_pallas_multi_block(monkeypatch):
    # several q/k blocks so the accumulation loops actually iterate
    monkeypatch.setenv("LDMSEG_FLASH_BWD_BLOCK_Q", "64")
    monkeypatch.setenv("LDMSEG_FLASH_BWD_BLOCK_K", "64")
    rng = np.random.default_rng(6)
    b, s, h, d = 2, 256, 2, 32
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    f = lambda q, k, v: jnp.sum(  # noqa: E731
        flash_attention(q, k, v, None, 128, 128, True) ** 2
    )
    gp = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gr = _grad_ref(q, k, v)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_flash_bwd_xla_fallback_matches(monkeypatch):
    monkeypatch.setenv("LDMSEG_FLASH_BWD", "xla")
    rng = np.random.default_rng(7)
    b, s, h, d = 1, 128, 2, 32
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    f = lambda q, k, v: jnp.sum(  # noqa: E731
        flash_attention(q, k, v, None, 64, 64, True) ** 2
    )
    # interpret=True would force the pallas bwd; route through the env knob
    # by checking the xla path directly against the reference
    from ldmseg_tpu.kernels import attention as attn

    out, res = attn._flash_fwd(q, k, v, None, 64, 64, True)
    g = 2.0 * out
    assert attn._use_pallas_bwd() is False
    dq, dk, dv = attn._flash_bwd(None, 64, 64, False, res, g)
    gr = _grad_ref(q, k, v)
    for a, b_ in zip((dq, dk, dv), gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_flash_bwd_pallas_bf16():
    rng = np.random.default_rng(8)
    b, s, h, d = 1, 128, 2, 32
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.bfloat16)
    f = lambda q, k, v: jnp.sum(  # noqa: E731
        flash_attention(q, k, v, None, 64, 64, True).astype(jnp.float32) ** 2
    )
    gp = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    gr = _grad_ref(qf, kf, vf)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_), atol=0.15
        )


def test_flash_block_sizing_is_head_dim_aware():
    """VMEM-calibrated shrink: the tuned 2048x1024 stays for the UNet's
    d=40 attentions but shrinks for the SD-VAE mid-block's single-head
    d=512 (which needed 23.9MB scoped VMEM and failed to compile)."""
    from ldmseg_tpu.kernels import attention as A

    est40 = lambda q, k: A._fwd_vmem_est(q, k, A._pad128(40))  # noqa: E731
    est512 = lambda q, k: A._fwd_vmem_est(q, k, A._pad128(512))  # noqa: E731
    assert A._shrink_blocks(est40, 2048, 1024) == (2048, 1024)
    bq, bk = A._shrink_blocks(est512, 2048, 1024)
    assert (bq, bk) != (2048, 1024) and bq * bk < 2048 * 1024
    assert est512(bq, bk) <= A._VMEM_BUDGET

    # backward blocks shrink too, and always divide power-of-two seqs
    for d in (40, 80, 160, 512):
        bq, bk = A._bwd_blocks(4096, 4096, d)
        assert 4096 % bq == 0 and 4096 % bk == 0
        assert A._bwd_vmem_est(bq, bk, A._pad128(d)) <= A._VMEM_BUDGET


@pytest.mark.parametrize("seq,dim,heads", [(128, 128, 2), (128, 256, 1)])
def test_flash_attention_sliced_layout_matches_reference(
    monkeypatch, seq, dim, heads
):
    """Head-sliced BlockSpecs over [B, S, H*D] (no fold/unfold transposes)
    produce identical attention for LOWERABLE windows (d % 128 == 0, or a
    single head). Mosaic cannot lower non-128 lane windows — see the gate
    test below."""
    monkeypatch.setenv("LDMSEG_FLASH_LAYOUT", "sliced")
    rng = np.random.default_rng(7)
    b = 2
    q = rng.normal(size=(b, seq, heads, dim)).astype(np.float32)
    k = rng.normal(size=(b, seq, heads, dim)).astype(np.float32)
    v = rng.normal(size=(b, seq, heads, dim)).astype(np.float32)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        None, 64, 64, True,
    )
    ref = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sliced_layout_gate_rejects_unlowerable_windows(monkeypatch):
    """Mosaic requires the lane block dim to be a multiple of 128 (or the
    full array dim); a d=40 head window over [B, S, 320] cannot lower on
    TPU. The dispatcher must silently fall back to the folded layout for
    such shapes even when LDMSEG_FLASH_LAYOUT=sliced, and the fallback
    path must still match the reference."""
    import ldmseg_tpu.kernels.attention as A

    monkeypatch.setenv("LDMSEG_FLASH_LAYOUT", "sliced")
    assert not A._sliced_layout(8, 40)   # the UNet's 64^2-level heads
    assert not A._sliced_layout(3, 40)
    assert A._sliced_layout(1, 512)      # SD-VAE mid-block
    assert A._sliced_layout(2, 128)
    monkeypatch.setenv("LDMSEG_FLASH_LAYOUT", "fold")
    assert not A._sliced_layout(2, 128)

    monkeypatch.setenv("LDMSEG_FLASH_LAYOUT", "sliced")
    rng = np.random.default_rng(11)
    q = rng.normal(size=(2, 128, 3, 40)).astype(np.float32)
    k = rng.normal(size=(2, 128, 3, 40)).astype(np.float32)
    v = rng.normal(size=(2, 128, 3, 40)).astype(np.float32)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None, 64, 64, True
    )
    ref = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
