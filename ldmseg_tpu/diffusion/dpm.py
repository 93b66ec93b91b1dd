"""DPM-Solver++(2M) sampler as a single jittable ``lax.scan``.

Beyond the reference (which only ships 50-step DDIM,
ldmseg/trainers/trainers_ldm_cond.py:1045-1170): a second-order
multistep solver for the same probability-flow ODE, reaching DDIM-50
quality in substantially fewer UNet evaluations — the serving-cost lever
that needs no model change and no retraining. Selected via
``sampling_kwargs.sampler: dpm++`` (trainer) or ``--sampler`` in
tools/eval_run.py; PQ parity vs DDIM is gated on-chip per run.

Math (data-prediction formulation, "DPM-Solver++", arXiv 2211.01095):
with alpha_t = sqrt(alphas_cumprod), sigma_t = sqrt(1 - alphas_cumprod),
lambda_t = ln(alpha_t / sigma_t), a step from s -> t (h = lambda_t -
lambda_s) updates

    x_t = (sigma_t / sigma_s) x_s - alpha_t (e^{-h} - 1) D,

where D is the model's x0 prediction at s (first order — identical to the
eta=0 DDIM update, covered by an exactness test) or its second-order
multistep extrapolation D = (1 + 1/(2r)) x0_s - 1/(2r) x0_{s_prev} with
r = (lambda_s - lambda_{s_prev}) / h. The timestep grid, self-conditioning,
classifier-free guidance, and inpainting-paste semantics mirror
``diffusion/sampling.ddim_sample`` exactly.

All solver coefficients are precomputed fp32 tables outside the scan; only
the previous x0 rides in the carry.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ddim import DDIMSchedule, inference_timesteps, pred_x0_and_eps
from .sampling import _carry_dtype


def _solver_tables(
    sched: DDIMSchedule, num_inference_steps: int
) -> dict:
    """Per-step scan inputs: timestep, alpha_prod at s/t, lambdas, 1/(2r)."""
    timesteps = np.asarray(
        inference_timesteps(sched.num_train_timesteps, num_inference_steps)
    )
    table = np.asarray(sched.alphas_cumprod, np.float64)
    ap_s = table[timesteps]
    prev_t = timesteps - sched.num_train_timesteps // num_inference_steps
    ap_t = np.where(
        prev_t >= 0,
        table[np.maximum(prev_t, 0)],
        float(np.asarray(sched.final_alpha_cumprod)),
    )

    def lam(ap):
        # clamp sigma^2 away from 0 so set_alpha_to_one=True stays finite
        return 0.5 * (np.log(ap) - np.log(np.maximum(1.0 - ap, 1e-20)))

    lam_s, lam_t = lam(ap_s), lam(ap_t)
    h = lam_t - lam_s
    # r_i = (lambda_{s_i} - lambda_{s_{i-1}}) / h_i; the first step has no
    # history -> first-order (inv_2r = 0 makes D collapse to x0_s)
    lam_s_prev = np.concatenate([[lam_s[0]], lam_s[:-1]])
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_2r = np.where(
            np.arange(len(h)) == 0, 0.0, h / (2.0 * (lam_s - lam_s_prev))
        )
    return {
        "t": jnp.asarray(timesteps),
        "ap_s": jnp.asarray(ap_s, jnp.float32),
        "ap_t": jnp.asarray(ap_t, jnp.float32),
        "exp_neg_h": jnp.asarray(np.exp(-h), jnp.float32),
        "inv_2r": jnp.asarray(inv_2r, jnp.float32),
    }


def dpm_sample(
    denoise_fn: Callable,
    sched: DDIMSchedule,
    rng: jax.Array,
    rgb_latents: Optional[jnp.ndarray],
    *,
    num_inference_steps: int = 25,
    latent_shape: Optional[Tuple[int, ...]] = None,
    self_condition: bool = False,
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    uncond_hidden_states: Optional[jnp.ndarray] = None,
    guidance_scale: float = 7.5,
    order: int = 2,
    repeat_noise: bool = False,
    inpaint_mask: Optional[jnp.ndarray] = None,
    known_latents: Optional[jnp.ndarray] = None,
    init_latents: Optional[jnp.ndarray] = None,
):
    """Run the DPM-Solver++ loop; returns final x0 latents [B, h, w, C].

    Interface-compatible with ``ddim_sample`` (same conditioning semantics;
    the final step returns the model's pred_original_sample, matching the
    reference's DDIM loop). ``order=1`` is exactly the eta=0 DDIM update on
    the same grid; ``order=2`` is the 2M multistep solver.
    """
    assert order in (1, 2), order
    if latent_shape is None:
        assert rgb_latents is not None
        latent_shape = rgb_latents.shape

    if init_latents is None:
        latents = jax.random.normal(rng, latent_shape, dtype=jnp.float32)
        if repeat_noise:
            latents = jnp.broadcast_to(latents[:1], latent_shape)
    else:
        latents = init_latents.astype(jnp.float32)
    original_noise = latents

    use_cfg = uncond_hidden_states is not None
    context = encoder_hidden_states
    if use_cfg:
        context = jnp.concatenate(
            [uncond_hidden_states, encoder_hidden_states], axis=0)

    tables = _solver_tables(sched, num_inference_steps)

    def model_eval(latents, condition, t):
        parts = [latents]
        if rgb_latents is not None:
            parts.append(rgb_latents)
        if self_condition:
            parts.append(condition)
        inputs = jnp.concatenate(parts, axis=-1)
        if use_cfg:
            inputs = jnp.concatenate([inputs, inputs], axis=0)
        out = denoise_fn(inputs, t, context)
        if use_cfg:
            uncond, cond = jnp.split(out, 2, axis=0)
            out = uncond + guidance_scale * (cond - uncond)
        return out.astype(jnp.float32)

    cdt = _carry_dtype()

    def body(carry, step):
        x, x0_prev, condition, _ = carry
        x = x.astype(jnp.float32)
        x0_prev = x0_prev.astype(jnp.float32)
        out = model_eval(x, condition, step["t"])
        x0, _eps = pred_x0_and_eps(sched, out, x, step["ap_s"])
        if sched.clip_sample:
            x0 = jnp.clip(x0, -sched.clip_sample_range, sched.clip_sample_range)
        if inpaint_mask is not None:
            # paste known latents through the mask (ldm_cond.py:613-615),
            # same per-step semantics as ddim_sample
            x0 = jnp.where(inpaint_mask[..., None] > 0, known_latents, x0)
        if order == 2:
            d = (1.0 + step["inv_2r"]) * x0 - step["inv_2r"] * x0_prev
        else:
            d = x0
        sigma_s = jnp.sqrt(1.0 - step["ap_s"])
        sigma_t = jnp.sqrt(1.0 - step["ap_t"])
        alpha_t = jnp.sqrt(step["ap_t"])
        x_next = (sigma_t / sigma_s) * x - alpha_t * (step["exp_neg_h"] - 1.0) * d
        new_cond = (x0 if self_condition else condition).astype(cdt)
        return (x_next.astype(cdt), x0.astype(cdt), new_cond, x0), None

    # carry dtype knob (LDMSEG_SAMPLE_CARRY) shared with ddim_sample; the
    # solver update itself always runs fp32
    condition0 = jnp.zeros(latent_shape, dtype=cdt)
    (x_final, _, _, final_x0), _ = jax.lax.scan(
        body, (latents.astype(cdt), jnp.zeros(latent_shape, cdt),
               condition0, latents),
        tables,
    )
    if repeat_noise:
        return final_x0, original_noise
    return final_x0
