"""Building-block parity tests vs torch oracles (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from ldmseg_tpu.kernels.attention import mha_reference
from ldmseg_tpu.kernels.norms import group_norm_silu
from ldmseg_tpu.models.layers import (
    Conv2d,
    ConvTranspose2x2,
    LayerNorm2d,
    resize_bilinear,
    timestep_embedding,
)


def test_conv2d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    mod = Conv2d(5, kernel_size=3)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kernel = np.asarray(params["params"]["conv"]["kernel"])  # HWIO
    bias = np.asarray(params["params"]["conv"]["bias"])
    out = np.asarray(mod.apply(params, jnp.asarray(x)))

    tconv = torch.nn.Conv2d(3, 5, 3, padding=1)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(kernel.transpose(3, 2, 0, 1)))  # OIHW
        tconv.bias.copy_(torch.from_numpy(bias))
        t_out = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        out, t_out.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )


def test_conv_transpose_2x2_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
    mod = ConvTranspose2x2(3)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kernel = np.asarray(params["params"]["kernel"])  # [2,2,C,F]
    bias = np.asarray(params["params"]["bias"])
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert out.shape == (2, 8, 8, 3)

    tconv = torch.nn.ConvTranspose2d(6, 3, kernel_size=2, stride=2)
    with torch.no_grad():
        # torch ConvTranspose weight: [in, out, kh, kw]
        tconv.weight.copy_(torch.from_numpy(kernel.transpose(2, 3, 0, 1)))
        tconv.bias.copy_(torch.from_numpy(bias))
        t_out = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        out, t_out.numpy().transpose(0, 2, 3, 1), atol=1e-5
    )


def test_layernorm2d_matches_torch_semantics():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    mod = LayerNorm2d()
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(mod.apply(params, jnp.asarray(x)))

    # detectron2 LayerNorm2d oracle (ldmseg/models/vae.py:309-322)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    u = t.mean(1, keepdim=True)
    s = (t - u).pow(2).mean(1, keepdim=True)
    t = (t - u) / torch.sqrt(s + 1e-6)
    np.testing.assert_allclose(out, t.numpy().transpose(0, 2, 3, 1), atol=1e-5)


@pytest.mark.parametrize("groups,channels", [(32, 64), (4, 8)])
def test_group_norm_silu_matches_torch(groups, channels):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 6, 6, channels)).astype(np.float32)
    scale = rng.normal(size=(channels,)).astype(np.float32)
    bias = rng.normal(size=(channels,)).astype(np.float32)
    out = np.asarray(
        group_norm_silu(
            jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
            num_groups=groups, eps=1e-6, apply_silu=True,
        )
    )
    gn = torch.nn.GroupNorm(groups, channels, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        ref = TF.silu(gn(torch.from_numpy(x.transpose(0, 3, 1, 2))))
    np.testing.assert_allclose(out, ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_mha_reference_matches_torch_sdpa():
    rng = np.random.default_rng(4)
    b, s, h, d = 2, 16, 4, 8
    q = rng.normal(size=(b, s, h, d)).astype(np.float32)
    k = rng.normal(size=(b, s, h, d)).astype(np.float32)
    v = rng.normal(size=(b, s, h, d)).astype(np.float32)
    out = np.asarray(mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    tq, tk, tv = (torch.from_numpy(a.transpose(0, 2, 1, 3)) for a in (q, k, v))
    ref = TF.scaled_dot_product_attention(tq, tk, tv)
    np.testing.assert_allclose(
        out, ref.numpy().transpose(0, 2, 1, 3), atol=1e-5
    )


def test_timestep_embedding_matches_diffusers_formula():
    # diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)
    t = np.array([0, 1, 10, 999], dtype=np.float32)
    dim = 320
    emb = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    half = dim // 2
    exponent = -np.log(10000.0) * np.arange(half, dtype=np.float32) / half
    freqs = np.exp(exponent)
    arg = t[:, None] * freqs[None]
    ref = np.concatenate([np.cos(arg), np.sin(arg)], axis=-1)
    np.testing.assert_allclose(emb, ref, atol=1e-4)
    # t=0 -> cos=1, sin=0 exactly
    np.testing.assert_allclose(emb[0, :half], np.ones(half), atol=1e-6)
    np.testing.assert_allclose(emb[0, half:], np.zeros(half), atol=1e-6)


def test_resize_bilinear_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    up = np.asarray(resize_bilinear(jnp.asarray(x), (16, 16)))
    ref = TF.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(16, 16),
        mode="bilinear", align_corners=False,
    )
    np.testing.assert_allclose(up, ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_attention_fused_qkv_parity(monkeypatch):
    """Fused [ch, 3*inner] projection == three separate Dense matmuls, for
    self- and cross-attention, with an identical param tree (to_q/kernel
    etc. — the SD converter layout, reference unet.py:178-233)."""
    from ldmseg_tpu.models.layers import Attention

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 32)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(2, 5, 24)).astype(np.float32))
    attn = Attention(heads=2, dim_head=16, out_features=32)

    monkeypatch.setenv("LDMSEG_FUSED_QKV", "0")
    params_sep = attn.init(jax.random.PRNGKey(0), x)
    leaf_paths = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_leaves_with_path(params_sep["params"])}
    assert leaf_paths == {"['to_q']['kernel']", "['to_k']['kernel']",
                          "['to_v']['kernel']", "['to_out']['kernel']",
                          "['to_out']['bias']"}
    out_sep = attn.apply(params_sep, x)
    ctx_sep = attn.apply(attn.init(jax.random.PRNGKey(0), x, ctx), x, ctx)

    monkeypatch.setenv("LDMSEG_FUSED_QKV", "1")
    params_fused = attn.init(jax.random.PRNGKey(0), x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params_sep, params_fused,
    )
    out_fused = attn.apply(params_fused, x)
    ctx_fused = attn.apply(attn.init(jax.random.PRNGKey(0), x, ctx), x, ctx)
    np.testing.assert_allclose(np.asarray(out_sep), np.asarray(out_fused),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ctx_sep), np.asarray(ctx_fused),
                               atol=1e-5)
