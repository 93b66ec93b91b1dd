"""DDIM sampling loop as a single jittable ``lax.scan``.

The reference's Python for-loop over 50 scheduler steps with per-step host
sync (trainers_ldm_cond.py:1045-1170) becomes one compiled scan: per step the
UNet input is the channel-concat [latents, rgb_latents(, self-condition)],
the model runs in bf16, the DDIM update in fp32. The last step returns
``pred_original_sample`` (trainers_ldm_cond.py:1154-1156).

Supports: self-conditioning (condition = running pred x0), classifier-free
guidance (uncond/cond context stacked on a doubled batch), repeated noise
('noise queries' study), returning all intermediate latents, and mask
inpainting by pasting known latents through the inpainting mask each step
(training-side semantics at trainers_ldm_cond.py:613-615).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ddim import DDIMSchedule, ddim_step, inference_timesteps


def _carry_dtype():
    """Scan-carry dtype for latents/self-cond (LDMSEG_SAMPLE_CARRY).

    Default fp32: the DDIM update is numerically sensitive and the carry
    is tiny (B x 64 x 64 x 4). ``bf16`` halves the carry's HBM round-trip
    per step and skips the model-input downcast — measured A/B in
    BENCHMARKS.md round 4 (VERDICT r3 next-round #3b). The DDIM update
    itself always runs fp32; only the carried value is cast.

    The env var is read at TRACE time: flipping it after a jitted sampler
    has compiled in the same process serves the stale carry dtype from the
    jit cache (same per-process trap as LDMSEG_INT8, ADVICE r4 #4) — set
    it before the first sample() call, or use a fresh process per
    setting."""
    return (jnp.bfloat16
            if os.environ.get("LDMSEG_SAMPLE_CARRY", "fp32") == "bf16"
            else jnp.float32)


def ddim_sample(
    denoise_fn: Callable,
    sched: DDIMSchedule,
    rng: jax.Array,
    rgb_latents: Optional[jnp.ndarray],
    *,
    num_inference_steps: int = 50,
    latent_shape: Optional[Tuple[int, ...]] = None,
    self_condition: bool = False,
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    uncond_hidden_states: Optional[jnp.ndarray] = None,
    guidance_scale: float = 7.5,
    repeat_noise: bool = False,
    return_all_latents: bool = False,
    inpaint_mask: Optional[jnp.ndarray] = None,
    known_latents: Optional[jnp.ndarray] = None,
    init_latents: Optional[jnp.ndarray] = None,
):
    """Run the full DDIM loop; returns final x0 latents [B, h, w, C].

    denoise_fn(inputs, t, context) -> model output; inputs are the
    channel-concatenated UNet input. Classifier-free guidance is active when
    ``uncond_hidden_states`` is given: the model is evaluated on a doubled
    batch and outputs recombined with ``guidance_scale``.
    """
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
        context = jnp.concatenate([uncond_hidden_states, encoder_hidden_states], axis=0)

    timesteps = jnp.asarray(
        inference_timesteps(sched.num_train_timesteps, num_inference_steps)
    )

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

    def body(carry, t):
        latents, condition, _ = carry
        latents = latents.astype(jnp.float32)
        noise_pred = model_eval(latents, condition, t)
        prev, x0 = ddim_step(sched, noise_pred, t, latents, num_inference_steps)
        if inpaint_mask is not None:
            # paste known latents into the predicted x0 (ldm_cond.py:613-615)
            x0 = jnp.where(inpaint_mask[..., None] > 0, known_latents, x0)
            a_prev_t = t - sched.num_train_timesteps // num_inference_steps
            a_prev = jnp.where(
                a_prev_t >= 0,
                sched.alphas_cumprod[jnp.maximum(a_prev_t, 0)],
                sched.final_alpha_cumprod,
            )
            eps = (latents - jnp.sqrt(sched.alphas_cumprod[t]) * x0) / jnp.sqrt(
                1.0 - sched.alphas_cumprod[t]
            )
            prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        new_cond = (x0 if self_condition else condition).astype(cdt)
        # stack per-step latents only when asked for — the default path
        # carries the final x0 instead of writing 50 x [B,h,w,C] to HBM
        ys = (prev, x0) if return_all_latents else None
        return (prev.astype(cdt), new_cond, x0), ys

    condition0 = jnp.zeros(latent_shape, dtype=cdt)
    (final_prev, _, final), ys = jax.lax.scan(
        body, (latents.astype(cdt), condition0, latents), timesteps
    )
    # the reference returns pred_original_sample at the final step
    if return_all_latents:
        all_prev, _ = ys
        return final, all_prev
    if repeat_noise:
        return final, original_noise
    return final
