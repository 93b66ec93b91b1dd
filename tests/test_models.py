"""Model tests: seg-AE parity vs a torch oracle, UNet variants, converters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from ldmseg_tpu.models import SegVAE, SegVAEConfig
from ldmseg_tpu.models.convert import convert_seg_vae, modify_conv_in
from ldmseg_tpu.models.unet import CondUNet, UNetConfig, tiny_unet_config


class TorchLayerNorm2d(nn.Module):
    """Oracle replica of detectron2 LayerNorm2d (vae.py:309-322)."""

    def __init__(self, num_channels, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(num_channels))
        self.bias = nn.Parameter(torch.zeros(num_channels))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


def build_torch_seg_ae(cfg: SegVAEConfig):
    """Torch oracle with the reference Sequential layout (vae.py:123-244)."""
    blocks = cfg.block_out_channels
    enc = [nn.Conv2d(cfg.encoder_in_channels, blocks[0], 3, padding=1), nn.SiLU()]
    for i in range(len(blocks) - 1):
        enc += [
            nn.Conv2d(blocks[i], blocks[i], 3, padding=1),
            nn.Conv2d(blocks[i], blocks[i + 1], 3, padding=1, stride=2),
            nn.SiLU(),
        ]
    enc += [
        nn.Conv2d(blocks[-1], cfg.int_channels, 3, padding=1),
        nn.Identity(),
        nn.GroupNorm(cfg.norm_num_groups, cfg.int_channels, eps=1e-6),
        nn.SiLU(),
        nn.Conv2d(cfg.int_channels, cfg.latent_channels * cfg.effective_num_latents,
                  3, padding=1),
    ]
    dim = cfg.upscale_channels
    dec = [nn.Conv2d(cfg.latent_channels, cfg.int_channels, 3, padding=1), nn.Identity()]
    for i in range(cfg.num_upscalers):
        in_ch = cfg.int_channels if i == 0 else dim
        dec += [nn.ConvTranspose2d(in_ch, dim, 2, stride=2),
                TorchLayerNorm2d(dim), nn.SiLU()]
    dec += [nn.GroupNorm(cfg.norm_num_groups, dim), nn.SiLU(),
            nn.Conv2d(dim, cfg.out_channels, 3, padding=1)]

    class AE(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = nn.Sequential(*enc)
            self.decoder = nn.Sequential(*dec)

    return AE()


SMALL_CFG = SegVAEConfig(
    in_channels=7, int_channels=32, out_channels=16,
    block_out_channels=(8, 8, 16, 16), latent_channels=4, norm_num_groups=8,
    num_upscalers=2, upscale_channels=16, num_latents=2,
)


def test_seg_vae_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = build_torch_seg_ae(SMALL_CFG)
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = convert_seg_vae(state, SMALL_CFG)

    model = SegVAE(SMALL_CFG)
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 7)).astype(np.float32)

    moments = model.apply(
        {"params": params}, jnp.asarray(x), method=lambda m, a: m.encode(a)
    )
    with torch.no_grad():
        t_moments = oracle.encoder(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(moments), t_moments.numpy().transpose(0, 2, 3, 1), atol=2e-4
    )

    z = np.asarray(moments)[..., :4]
    dec = model.apply(
        {"params": params}, jnp.asarray(z),
        method=lambda m, a: m.decode(a, interpolate=False),
    )
    with torch.no_grad():
        t_dec = oracle.decoder(torch.from_numpy(z.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(dec), t_dec.numpy().transpose(0, 2, 3, 1), atol=2e-3
    )


def test_seg_vae_converter_structure_matches_init():
    """Converted tree must be structurally identical to a fresh init."""
    torch.manual_seed(0)
    oracle = build_torch_seg_ae(SMALL_CFG)
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    converted = convert_seg_vae(state, SMALL_CFG)

    model = SegVAE(SMALL_CFG)
    x = jnp.zeros((1, 32, 32, 7))
    init = model.init(
        {"params": jax.random.PRNGKey(0)}, x, rng=jax.random.PRNGKey(1)
    )["params"]
    init_paths = {jax.tree_util.keystr(p): v.shape
                  for p, v in jax.tree_util.tree_leaves_with_path(init)}
    conv_paths = {jax.tree_util.keystr(p): v.shape
                  for p, v in jax.tree_util.tree_leaves_with_path(converted)}
    assert init_paths == conv_paths


@pytest.mark.parametrize(
    "param", ["gaussian", "discrete_gumbel_softmax", "discrete_codebook", "auto"]
)
def test_seg_vae_parametrizations(param):
    cfg = SegVAEConfig(
        in_channels=7, int_channels=16, out_channels=8,
        block_out_channels=(8, 8, 8, 8), latent_channels=4, norm_num_groups=8,
        num_upscalers=1, upscale_channels=8, parametrization=param,
        num_embeddings=16,
    )
    model = SegVAE(cfg)
    x = jnp.zeros((1, 32, 32, 7))
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, x, rng=jax.random.PRNGKey(1))
    logits, z, kl = model.apply(variables, x, rng=jax.random.PRNGKey(2))
    assert logits.shape == (1, 8, 8, 8)  # 32/8 * 2 (1 upscaler)
    assert z.shape == (1, 4, 4, 4)
    assert kl.shape == (1,)
    assert np.isfinite(np.asarray(logits)).all()


def test_seg_vae_valid_mask_zeroes_latents():
    cfg = SMALL_CFG
    model = SegVAE(cfg)
    x = jnp.ones((1, 32, 32, 7))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, rng=jax.random.PRNGKey(1))

    def run(m, a, mask):
        moments = m.encode(a)
        z, mode, kl = m.bottleneck(moments, None, sample_posterior=False)
        if mask is not None:
            z = z * mask[..., None]
        return z

    mask = jnp.zeros((1, 4, 4))
    z = model.apply(variables, x, mask, method=run)
    assert float(jnp.abs(z).max()) == 0.0


def test_tiny_unet_forward():
    cfg = tiny_unet_config()
    model = CondUNet(cfg)
    x = jnp.zeros((2, 16, 16, 8))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.array([1, 2]))
    out = model.apply(variables, x, jnp.array([10, 500]))
    assert out.shape == (2, 16, 16, 4)
    # no cross-attention params when removed (reference 'remove' descriptor)
    flat = [jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_leaves_with_path(variables["params"])]
    assert not any("attn2" in p for p in flat)
    assert any("attn1" in p for p in flat)


def test_tiny_unet_cross_attention():
    cfg = tiny_unet_config(use_cross_attention=True)
    model = CondUNet(cfg)
    x = jnp.zeros((1, 16, 16, 8))
    ctx = jnp.zeros((1, 7, 32))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.array([1]), ctx)
    out = model.apply(variables, x, jnp.array([1]), ctx)
    assert out.shape == (1, 16, 16, 4)
    flat = [jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_leaves_with_path(variables["params"])]
    assert any("attn2" in p for p in flat)


def test_tiny_unet_separate_conv():
    cfg = tiny_unet_config(separate_conv=True)
    model = CondUNet(cfg)
    x = jnp.zeros((1, 16, 16, 8))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.array([1]))
    out = model.apply(variables, x, jnp.array([1]))
    assert out.shape == (1, 16, 16, 4)
    assert "conv_in_seg" in variables["params"]


def test_tiny_unet_separate_encoder_dual_timestep():
    cfg = tiny_unet_config(separate_encoder=True, add_adaptor=True)
    model = CondUNet(cfg)
    x = jnp.zeros((1, 16, 16, 8))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.array([1]))
    out = model.apply(
        variables, x, jnp.array([1]), timestep_img=jnp.array([5])
    )
    assert out.shape == (1, 16, 16, 4)
    assert "conv_in_img" in variables["params"]
    assert "down_tower_img" in variables["params"]
    assert any("adaptor" in k for k in variables["params"])


def test_tiny_unet_upscaler_head():
    cfg = tiny_unet_config(upscaler_head=True, upscaler_classes=12, upscaler_dim=32)
    model = CondUNet(cfg)
    x = jnp.zeros((1, 8, 8, 8))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.array([1]))
    out = model.apply(variables, x, jnp.array([1]))
    assert out.shape == (1, 16, 16, 12)  # 2x upscaled logits


def test_tiny_unet_input_dropout():
    cfg = tiny_unet_config(input_dropout=0.5)
    model = CondUNet(cfg)
    x = jnp.ones((1, 16, 16, 8))
    variables = model.init(jax.random.PRNGKey(0), x, jnp.array([1]))
    out_det = model.apply(variables, x, jnp.array([1]), deterministic=True)
    out_a = model.apply(
        variables, x, jnp.array([1]), deterministic=False,
        dropout_rng=jax.random.PRNGKey(1),
    )
    out_b = model.apply(
        variables, x, jnp.array([1]), deterministic=False,
        dropout_rng=jax.random.PRNGKey(2),
    )
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    assert np.isfinite(np.asarray(out_det)).all()


def test_attention_head_partitioning():
    """attention_head_dim repartitions heads per level without touching the
    parameter tree: QKV/out projections stay [ch, ch] (TPU-native knob;
    SD v1 topology is 8 heads of d=40/80/160, reference unet.py:83-105)."""
    cfg = UNetConfig()
    assert cfg.attn_heads(320) == (8, 40)
    tpu = UNetConfig(attention_head_dim=128)
    assert tpu.attn_heads(320) == (2, 160)
    assert tpu.attn_heads(640) == (5, 128)
    assert tpu.attn_heads(1280) == (10, 128)
    assert UNetConfig(attention_head_dim=256).attn_heads(96) == (1, 96)

    base = tiny_unet_config()
    part = tiny_unet_config(attention_head_dim=48)  # 32->1x32, 64->1x64, 96->2x48
    assert part.attn_heads(96) == (2, 48)
    x = jnp.ones((1, 16, 16, 8))
    v_base = CondUNet(base).init(jax.random.PRNGKey(0), x, jnp.array([1]))
    v_part = CondUNet(part).init(jax.random.PRNGKey(0), x, jnp.array([1]))
    shapes = lambda v: jax.tree_util.tree_map(jnp.shape, v)  # noqa: E731
    assert shapes(v_base) == shapes(v_part)
    out = CondUNet(part).apply(v_part, x, jnp.array([1]))
    assert out.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
    # same params, different head split => different function
    out_base = CondUNet(base).apply(v_part, x, jnp.array([1]))
    assert not np.allclose(np.asarray(out), np.asarray(out_base))


def test_convert_sd_rejects_repartitioned_heads():
    """Converted SD weights bake in the 8-head split; the converter refuses
    attention_head_dim (reference unet.py:178-233 loads diffusers weights)."""
    from ldmseg_tpu.models.convert import convert_sd_unet

    with pytest.raises(AssertionError, match="8-head"):
        convert_sd_unet({}, UNetConfig(attention_head_dim=128))


def test_modify_conv_in_init_modes():
    rng = np.random.default_rng(0)
    kernel = rng.normal(size=(3, 3, 4, 8)).astype(np.float32)
    bias = rng.normal(size=(8,)).astype(np.float32)
    params = {"conv_in": {"conv": {"kernel": kernel, "bias": bias}}}
    out = modify_conv_in(
        params, in_channels=8, init_mode_seg="copy", init_mode_image="zero",
        cond_channels=4, init_mode_cond="zero",
    )
    new_k = out["conv_in"]["conv"]["kernel"]
    assert new_k.shape == (3, 3, 12, 8)
    np.testing.assert_array_equal(new_k[:, :, :4], kernel)   # copy
    np.testing.assert_array_equal(new_k[:, :, 4:8], 0.0)      # zero
    np.testing.assert_array_equal(new_k[:, :, 8:], 0.0)       # cond zero
    np.testing.assert_array_equal(out["conv_in"]["conv"]["bias"], bias)

    out2 = modify_conv_in(
        params, in_channels=8, init_mode_seg="mean", init_mode_image="random",
    )
    k2 = out2["conv_in"]["conv"]["kernel"]
    assert k2.shape == (3, 3, 8, 8)
    np.testing.assert_allclose(
        k2[:, :, 0], kernel.mean(axis=2), atol=1e-6
    )
    assert np.abs(k2[:, :, 4:8]).max() > 0  # random, not zeroed
