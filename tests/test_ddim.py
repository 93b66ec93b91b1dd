"""DDIM schedule unit tests (semantics from ldmseg/schedulers/ddim_scheduler.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldmseg_tpu.diffusion import (
    add_noise,
    compute_loss_weights,
    ddim_step,
    inference_timesteps,
    make_schedule,
    remove_noise,
)
from ldmseg_tpu.diffusion.ddim import make_betas


SD_KW = dict(
    num_train_timesteps=1000,
    beta_start=0.00085,
    beta_end=0.012,
    beta_schedule="scaled_linear",
    clip_sample=False,
    set_alpha_to_one=False,
    prediction_type="epsilon",
)


def torch_reference_betas(schedule, T=1000, b0=0.00085, b1=0.012):
    """Independent numpy re-derivation used as the oracle."""
    if schedule == "linear":
        return np.linspace(b0, b1, T, dtype=np.float32)
    if schedule == "scaled_linear":
        return np.linspace(b0**0.5, b1**0.5, T, dtype=np.float32) ** 2
    if schedule == "sigmoid":
        x = np.linspace(-6, 6, T)
        return (1 / (1 + np.exp(-x)) * (b1 - b0) + b0).astype(np.float32)
    raise ValueError(schedule)


@pytest.mark.parametrize("schedule", ["linear", "scaled_linear", "sigmoid"])
def test_beta_schedules(schedule):
    betas = make_betas(1000, 0.00085, 0.012, schedule)
    np.testing.assert_allclose(betas, torch_reference_betas(schedule), rtol=1e-6)


def test_cosine_schedule_monotone_alphas():
    betas = make_betas(1000, beta_schedule="squaredcos_cap_v2")
    assert betas.min() > 0 and betas.max() <= 0.999
    ac = np.cumprod(1 - betas)
    assert np.all(np.diff(ac) < 0)


def test_inference_timesteps_hits_final_step():
    # steps_offset = step_ratio - 1 => t=999 always included
    # (ddim_scheduler.py:119-131)
    t = inference_timesteps(1000, 50)
    assert t[0] == 999
    assert len(t) == 50
    assert np.all(np.diff(t) == -20)
    t2 = inference_timesteps(1000, 50, tmin=500)
    assert np.all(t2 >= 500)


def test_add_remove_noise_roundtrip():
    sched = make_schedule(**SD_KW)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x0 = jax.random.normal(k1, (4, 8, 8, 4))
    eps = jax.random.normal(k2, (4, 8, 8, 4))
    t = jax.random.randint(k3, (4,), 0, 1000)
    xt = add_noise(sched, x0, eps, t)
    x0_rec = remove_noise(sched, xt, eps, t)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_add_noise_extremes():
    sched = make_schedule(**SD_KW)
    x0 = jnp.ones((1, 4, 4, 2))
    eps = jnp.full((1, 4, 4, 2), 2.0)
    t0 = jnp.array([0])
    almost_clean = add_noise(sched, x0, eps, t0)
    # at t=0, alphas_cumprod ~ 1-beta0 ~ 0.99915
    assert float(jnp.abs(almost_clean - x0).max()) < 0.07
    t_last = jnp.array([999])
    noisy = add_noise(sched, x0, eps, t_last)
    # at t=999 the sample is mostly noise
    assert float(jnp.abs(noisy - eps).max()) < 0.35


@pytest.mark.parametrize(
    "mode", ["inverse_log_snr", "max_clamp_snr", "linear", "fixed", "none"]
)
def test_loss_weight_modes(mode):
    betas = make_betas(1000, 0.00085, 0.012, "scaled_linear")
    ac = np.cumprod(1 - betas.astype(np.float64)).astype(np.float32)
    w = compute_loss_weights(ac, mode=mode, max_snr=2.0)
    assert w.shape == (1000,)
    assert np.all(np.isfinite(w))
    snr = ac / (1 - ac)
    if mode == "max_clamp_snr":
        # weight*snr = min(snr, max_snr)
        np.testing.assert_allclose(w * snr, np.minimum(snr, 2.0), rtol=1e-4)
        assert w[-1] == 1.0  # low-snr steps keep weight 1
    if mode == "none":
        np.testing.assert_array_equal(w, np.ones(1000, np.float32))
    if mode == "linear":
        np.testing.assert_allclose(w[-1], 1.0, rtol=1e-6)
    if mode == "inverse_log_snr":
        # clamp(log(1/snr), min=1) / last: non-decreasing, ends at 1
        assert np.all(np.diff(w) >= 0)
        np.testing.assert_allclose(w[-1], 1.0, rtol=1e-6)


def _reference_ddim_step(alphas_cumprod, final_alpha, out, t, sample, steps, T=1000,
                         prediction_type="epsilon", clip=False, clip_range=1.0):
    """Direct numpy transcription of the DDIM update equations."""
    prev_t = t - T // steps
    a_t = alphas_cumprod[t]
    a_prev = alphas_cumprod[prev_t] if prev_t >= 0 else final_alpha
    b_t = 1 - a_t
    if prediction_type == "epsilon":
        x0 = (sample - b_t**0.5 * out) / a_t**0.5
        eps = out
    elif prediction_type == "sample":
        x0 = out
        eps = (sample - a_t**0.5 * x0) / b_t**0.5
    else:  # v_prediction
        x0 = a_t**0.5 * sample - b_t**0.5 * out
        eps = a_t**0.5 * out + b_t**0.5 * sample
    if clip:
        x0 = np.clip(x0, -clip_range, clip_range)
    direction = (1 - a_prev) ** 0.5 * eps
    return a_prev**0.5 * x0 + direction, x0


@pytest.mark.parametrize("pred_type", ["epsilon", "sample", "v_prediction"])
def test_ddim_step_matches_reference(pred_type):
    kw = dict(SD_KW, prediction_type=pred_type)
    sched = make_schedule(**kw)
    ac = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    final = float(sched.final_alpha_cumprod)
    rng = np.random.default_rng(0)
    sample = rng.normal(size=(2, 4, 4, 4)).astype(np.float32)
    out = rng.normal(size=(2, 4, 4, 4)).astype(np.float32)
    for t in [999, 519, 19]:
        prev, x0 = ddim_step(sched, jnp.asarray(out), t, jnp.asarray(sample), 50)
        ref_prev, ref_x0 = _reference_ddim_step(
            ac, final, out.astype(np.float64), t, sample.astype(np.float64), 50,
            prediction_type=pred_type,
        )
        np.testing.assert_allclose(np.asarray(prev), ref_prev, atol=2e-4)
        np.testing.assert_allclose(np.asarray(x0), ref_x0, atol=2e-4)


def test_ddim_step_clip_sample():
    sched = make_schedule(**dict(SD_KW, clip_sample=True, clip_sample_range=1.0))
    sample = jnp.full((1, 2, 2, 1), 10.0)
    out = jnp.zeros((1, 2, 2, 1))
    prev, x0 = ddim_step(sched, out, 999, sample, 50)
    assert float(jnp.abs(x0).max()) <= 1.0


def test_full_ddim_loop_denoises():
    """A 50-step loop with a perfect-epsilon oracle recovers x0."""
    sched = make_schedule(**SD_KW)
    rng = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(rng)
    x0 = jax.random.normal(k1, (1, 8, 8, 4)) * 0.5
    eps = jax.random.normal(k2, (1, 8, 8, 4))
    ts = inference_timesteps(1000, 50)
    x = add_noise(sched, x0, eps, jnp.array([ts[0]]))
    for i, t in enumerate(ts):
        # oracle predicts the exact noise component of the current sample
        a_t = sched.alphas_cumprod[t]
        eps_t = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        prev, pred_x0 = ddim_step(sched, eps_t, int(t), x, 50)
        x = pred_x0 if i == len(ts) - 1 else prev
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_schedule_is_jittable_pytree():
    sched = make_schedule(**SD_KW)

    @jax.jit
    def f(s, x, eps, t):
        return add_noise(s, x, eps, t)

    out = f(sched, jnp.ones((1, 2, 2, 1)), jnp.ones((1, 2, 2, 1)), jnp.array([10]))
    assert out.shape == (1, 2, 2, 1)
