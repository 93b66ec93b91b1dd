"""Variant-capability tests: shared encoder, grad checkpointing, upscaler."""

import jax
import jax.numpy as jnp
import numpy as np

from ldmseg_tpu.losses import SegLossConfig
from ldmseg_tpu.models import (
    SegVAE,
    SegVAEConfig,
    SDVAE,
    SDVAEConfig,
    Upscaler,
    UpscalerConfig,
)
from ldmseg_tpu.models.unet import CondUNet, tiny_unet_config
from ldmseg_tpu.train import OptimConfig, TrainState, make_lr_schedule, make_optimizer
from ldmseg_tpu.train.steps_ae import AEStepConfig, make_ae_train_step


def test_shared_encoder_ae_step():
    """Frozen SD encoder feeds the seg bottleneck/decoder (main_ae.py:140-143)."""
    seg_cfg = SegVAEConfig(
        in_channels=3, int_channels=16, out_channels=16,
        block_out_channels=(8, 8, 8, 16), latent_channels=4, norm_num_groups=8,
        num_upscalers=1, upscale_channels=16,
    )
    sd_cfg = SDVAEConfig(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                         norm_num_groups=4, dtype="float32")
    seg_vae, sd_vae = SegVAE(seg_cfg), SDVAE(sd_cfg)

    rng = np.random.default_rng(0)
    b, hw = 2, 32
    semseg = rng.integers(0, 8, size=(b, hw, hw)).astype(np.int32)
    batch = {
        # shared encoder requires a 3-channel (color) encoding
        "image_semseg": jnp.asarray(rng.random((b, hw, hw, 3)).astype(np.float32)),
        "semseg": jnp.asarray(semseg),
        "image": jnp.asarray(rng.random((b, hw, hw, 3)).astype(np.float32)),
    }
    k = jax.random.PRNGKey(0)
    seg_params = seg_vae.init(
        {"params": k}, jnp.zeros((b, hw, hw, 3)), rng=k
    )["params"]
    sd_params = sd_vae.init({"params": k}, batch["image"], rng=k)["params"]

    cfg = AEStepConfig(
        loss_cfg=SegLossConfig(num_points=32, num_classes=16, max_masks=4),
    )
    tx = make_optimizer(seg_params, OptimConfig(lr=1e-3),
                        make_lr_schedule("constant", 1e-3, 10))
    state = TrainState.create(seg_params, tx)
    step = jax.jit(
        make_ae_train_step(seg_vae, tx, cfg, external_encoder=(sd_vae, "sd_vae"))
    )
    state, metrics = step(state, batch, jax.random.PRNGKey(1),
                          {"sd_vae": sd_params})
    assert np.isfinite(float(metrics["loss"]))
    # the decoder received gradients
    assert float(metrics["grad_norm"]) > 0


def test_gradient_checkpointing_same_output():
    base = tiny_unet_config()
    remat = tiny_unet_config(gradient_checkpointing=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 8)),
                    jnp.float32)
    m1, m2 = CondUNet(base), CondUNet(remat)
    p1 = m1.init(jax.random.PRNGKey(0), x, jnp.array([1]))
    out1 = m1.apply(p1, x, jnp.array([5]))
    out2 = m2.apply(p1, x, jnp.array([5]))  # same params, remat variant
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    # gradients also match
    def loss(m, p):
        return jnp.sum(m.apply(p, x, jnp.array([5])) ** 2)

    g1 = jax.grad(lambda p: loss(m1, p))(p1)
    g2 = jax.grad(lambda p: loss(m2, p))(p1)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), g1, g2
    )
    assert max(jax.tree_util.tree_leaves(d)) < 1e-4


def test_upscaler_module():
    cfg = UpscalerConfig(
        latent_channels=4, int_channels=16, upscaler_channels=16,
        out_channels=12, num_upscalers=2, norm_num_groups=8, fuse_rgb=True,
    )
    model = Upscaler(cfg)
    z = jnp.zeros((1, 8, 8, 4))
    z_rgb = jnp.zeros((1, 8, 8, 4))
    params = model.init(jax.random.PRNGKey(0), z, False, z_rgb)
    out = model.apply(params, z, False, z_rgb)
    assert out.shape == (1, 32, 32, 12)
    out_i = model.apply(params, z, True, z_rgb)
    assert out_i.shape == (1, 64, 64, 12)  # x interpolation_factor (8/4=2)
