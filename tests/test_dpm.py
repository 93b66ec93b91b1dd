"""DPM-Solver++(2M) sampler tests (diffusion/dpm.py).

Beyond the reference (50-step DDIM only, trainers_ldm_cond.py:1045-1170).
Anchors:
  * order=1 on the same timestep grid IS the eta=0 DDIM update — the two
    samplers must agree to float tolerance on a real (tiny) UNet;
  * order=2 converges faster: at a small step count its result is closer
    to the fine-grid DDIM solution of the same probability-flow ODE than
    same-step-count DDIM is.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldmseg_tpu.diffusion.ddim import make_schedule
from ldmseg_tpu.diffusion.dpm import dpm_sample
from ldmseg_tpu.diffusion.sampling import ddim_sample


@pytest.fixture(scope="module")
def tiny_model():
    from ldmseg_tpu.models.unet import CondUNet, tiny_unet_config

    cfg = tiny_unet_config()
    model = CondUNet(cfg)
    rgb = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4)) * 0.3
    x = jnp.concatenate([rgb, rgb], axis=-1)
    params = model.init(jax.random.PRNGKey(1), x, jnp.array([0]))["params"]

    def denoise(inputs, t, context):
        return model.apply({"params": params}, inputs,
                           jnp.full((inputs.shape[0],), t))[..., :4]

    return denoise, rgb


@pytest.mark.parametrize("set_alpha_to_one", [False, True])
def test_order1_equals_ddim(tiny_model, set_alpha_to_one):
    denoise, rgb = tiny_model
    sched = make_schedule(num_train_timesteps=1000, clip_sample=False,
                          set_alpha_to_one=set_alpha_to_one)
    kw = dict(num_inference_steps=8, latent_shape=rgb.shape)
    ref = jax.jit(lambda r: ddim_sample(denoise, sched, r, rgb, **kw))(
        jax.random.PRNGKey(2))
    out = jax.jit(lambda r: dpm_sample(denoise, sched, r, rgb, order=1, **kw))(
        jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_order2_converges_faster_than_ddim(tiny_model):
    """10-step DPM++(2M) lands closer to the 100-step DDIM solution of the
    same ODE than 10-step DDIM does (second-order vs first-order accuracy)."""
    denoise, rgb = tiny_model
    sched = make_schedule(num_train_timesteps=1000, clip_sample=False,
                          set_alpha_to_one=False)
    rng = jax.random.PRNGKey(3)
    shape = rgb.shape
    truth = np.asarray(jax.jit(lambda r: ddim_sample(
        denoise, sched, r, rgb, num_inference_steps=100, latent_shape=shape
    ))(rng))
    ddim10 = np.asarray(jax.jit(lambda r: ddim_sample(
        denoise, sched, r, rgb, num_inference_steps=10, latent_shape=shape
    ))(rng))
    dpm10 = np.asarray(jax.jit(lambda r: dpm_sample(
        denoise, sched, r, rgb, num_inference_steps=10, latent_shape=shape
    ))(rng))
    err_ddim = np.linalg.norm(ddim10 - truth)
    err_dpm = np.linalg.norm(dpm10 - truth)
    assert err_dpm < err_ddim, (err_dpm, err_ddim)


def test_dpm_self_condition_and_repeat_noise(tiny_model):
    from ldmseg_tpu.models.unet import CondUNet, tiny_unet_config

    cfg = tiny_unet_config(in_channels=8, cond_channels=4)
    model = CondUNet(cfg)
    rgb = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4)) * 0.3
    x = jnp.concatenate([rgb, rgb, rgb], axis=-1)
    params = model.init(jax.random.PRNGKey(1), x, jnp.array([0]))["params"]

    def denoise(inputs, t, context):
        return model.apply({"params": params}, inputs,
                           jnp.full((inputs.shape[0],), t))[..., :4]

    sched = make_schedule(num_train_timesteps=100, clip_sample=False)
    out, noise = jax.jit(lambda r: dpm_sample(
        denoise, sched, r, rgb, num_inference_steps=4,
        self_condition=True, repeat_noise=True, latent_shape=rgb.shape,
    ))(jax.random.PRNGKey(4))
    assert out.shape == rgb.shape
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_array_equal(np.asarray(noise[0]), np.asarray(noise[1]))


def test_dpm_cfg_doubles_batch_and_recombines(tiny_model):
    """Classifier-free guidance: the model sees a doubled batch and the
    outputs recombine with guidance_scale (same semantics as ddim_sample)."""
    denoise, rgb = tiny_model
    sched = make_schedule(num_train_timesteps=100, clip_sample=False)
    seen = []

    def spy(inputs, t, context):
        seen.append((inputs.shape[0], None if context is None
                     else context.shape[0]))
        return denoise(inputs[: inputs.shape[0] // 2], t, None).repeat(2, 0)

    ctx = jnp.ones((1, 4, 8))
    out = jax.jit(lambda r: dpm_sample(
        spy, sched, r, rgb, num_inference_steps=3,
        encoder_hidden_states=ctx, uncond_hidden_states=jnp.zeros_like(ctx),
        guidance_scale=2.0, latent_shape=rgb.shape,
    ))(jax.random.PRNGKey(6))
    assert out.shape == rgb.shape
    assert bool(jnp.isfinite(out).all())
    assert seen and all(b == 2 * rgb.shape[0] and c == 2 * rgb.shape[0]
                        for b, c in seen), seen


def test_dpm_inpaint_paste_respects_mask(tiny_model):
    denoise, rgb = tiny_model
    sched = make_schedule(num_train_timesteps=100, clip_sample=False)
    known = jnp.full(rgb.shape, 0.5)
    mask = jnp.zeros(rgb.shape[:3]).at[:, :4].set(1)
    out = jax.jit(lambda r: dpm_sample(
        denoise, sched, r, rgb, num_inference_steps=4,
        inpaint_mask=mask, known_latents=known, latent_shape=rgb.shape,
    ))(jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(out[:, :4]), 0.5, atol=1e-5)
    assert np.abs(np.asarray(out[:, 4:]) - 0.5).max() > 1e-3
