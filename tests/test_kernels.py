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
