"""DDIM noise schedule as pure functions over precomputed fp32 tables.

Re-designs the reference's stateful scheduler object
(reference: ldmseg/schedulers/ddim_scheduler.py:26-291) as a frozen pytree
of tables + stateless functions, so the whole inference loop compiles into a
single ``jax.lax.scan`` and training-noise injection fuses into the jitted
train step.

Semantics preserved exactly (validated by unit tests):
  * beta schedules linear / scaled_linear / squaredcos_cap_v2 / sigmoid
    (ddim_scheduler.py:51-66),
  * SNR loss-weight modes inverse_log_snr / max_clamp_snr / linear / fixed /
    none (ddim_scheduler.py:97-117),
  * inference timestep grid with ``steps_offset = step_ratio - 1`` so t=999
    is always hit (ddim_scheduler.py:119-131),
  * ``add_noise`` / ``remove_noise`` (ddim_scheduler.py:155-216) incl. the
    optional partial-noise mask,
  * DDIM ``step`` for epsilon/sample/v-prediction with optional x0 clipping
    (ddim_scheduler.py:218-269).

Tables are always fp32; samples may be bf16 (cast up for the linear
combination, cast back by the caller if desired).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class DDIMSchedule:
    betas: jnp.ndarray                 # [T] fp32
    alphas_cumprod: jnp.ndarray        # [T] fp32
    weights: jnp.ndarray               # [T] fp32 per-timestep loss weights
    final_alpha_cumprod: jnp.ndarray   # scalar fp32
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")
    clip_sample: bool = struct.field(pytree_node=False, default=False)
    clip_sample_range: float = struct.field(pytree_node=False, default=1.0)
    weight_mode: str = struct.field(pytree_node=False, default="none")


def _betas_for_alpha_bar(num_steps: int, max_beta: float = 0.999) -> np.ndarray:
    """Glide/squaredcos_cap_v2 schedule (ddim_scheduler.py:138-153)."""

    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_steps):
        t1 = i / num_steps
        t2 = (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.asarray(betas, dtype=np.float32)


def make_betas(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
    beta_schedule: str = "linear",
) -> np.ndarray:
    if beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float32)
    elif beta_schedule == "scaled_linear":
        # SD-specific: linear in sqrt(beta) space (ddim_scheduler.py:53-57)
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float32)
            ** 2
        )
    elif beta_schedule == "squaredcos_cap_v2":
        betas = _betas_for_alpha_bar(num_train_timesteps)
    elif beta_schedule == "sigmoid":
        x = np.linspace(-6, 6, num_train_timesteps, dtype=np.float32)
        betas = 1.0 / (1.0 + np.exp(-x)) * (beta_end - beta_start) + beta_start
    else:
        raise NotImplementedError(f"beta schedule '{beta_schedule}' not implemented")
    return betas.astype(np.float32)


def compute_loss_weights(
    alphas_cumprod: np.ndarray, mode: str = "none", max_snr: float = 5.0
) -> np.ndarray:
    """Per-timestep loss weights (ddim_scheduler.py:97-117)."""
    assert mode in ("inverse_log_snr", "max_clamp_snr", "linear", "fixed", "none")
    snr = alphas_cumprod / (1.0 - alphas_cumprod)
    if mode == "inverse_log_snr":
        w = np.clip(np.log(1.0 / snr), 1.0, None)
        w = w / w[-1]
    elif mode == "max_clamp_snr":
        w = np.clip(snr, None, max_snr) / snr
    elif mode == "fixed":
        w = snr.copy()
        w[: len(w) // 4] = 0.1
    elif mode == "linear":
        w = np.arange(1, len(snr) + 1, dtype=np.float64) / len(snr)
    else:
        w = np.ones_like(snr)
    return w.astype(np.float32)


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
    beta_schedule: str = "linear",
    clip_sample: bool = True,
    set_alpha_to_one: bool = True,
    prediction_type: str = "epsilon",
    clip_sample_range: float = 1.0,
    weight: str = "none",
    max_snr: float = 5.0,
    # accepted for config parity; unused (reference also never uses them)
    steps_offset: int = 0,
    thresholding: bool = False,
    dynamic_thresholding_ratio: float = 0.995,
    sample_max_value: float = 1.0,
    **_unused,
) -> DDIMSchedule:
    assert prediction_type in ("epsilon", "sample", "v_prediction")
    betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    alphas_cumprod = np.cumprod(1.0 - betas.astype(np.float64)).astype(np.float32)
    final = np.float32(1.0) if set_alpha_to_one else alphas_cumprod[0]
    weights = compute_loss_weights(alphas_cumprod, mode=weight, max_snr=max_snr)
    return DDIMSchedule(
        betas=jnp.asarray(betas),
        alphas_cumprod=jnp.asarray(alphas_cumprod),
        weights=jnp.asarray(weights),
        final_alpha_cumprod=jnp.asarray(final),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
        clip_sample=clip_sample,
        clip_sample_range=clip_sample_range,
        weight_mode=weight,
    )


def inference_timesteps(
    num_train_timesteps: int, num_inference_steps: int, tmin: int = 0
) -> np.ndarray:
    """Descending inference grid, shifted so the last train step is hit.

    ``steps_offset = step_ratio - 1`` guarantees t = T-1 (e.g. 999) is always
    included (ddim_scheduler.py:119-131).
    """
    step_ratio = num_train_timesteps // num_inference_steps
    steps_offset = step_ratio - 1
    t = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
    t = t + steps_offset
    return t[t >= tmin]


def _broadcast_gather(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-sample table entries and reshape for NHWC broadcast."""
    vals = table[t].reshape((-1,) + (1,) * (ndim - 1))
    return vals


def add_noise(
    sched: DDIMSchedule,
    original_samples: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
    scale: float = 1.0,
    mask_noise_perc: Optional[float] = None,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """q(x_t | x_0) forward noising (ddim_scheduler.py:155-187)."""
    x = original_samples.astype(jnp.float32)
    eps = noise.astype(jnp.float32)
    sqrt_a = jnp.sqrt(_broadcast_gather(sched.alphas_cumprod, timesteps, x.ndim))
    sqrt_1ma = jnp.sqrt(1.0 - _broadcast_gather(sched.alphas_cumprod, timesteps, x.ndim))
    if mask_noise_perc is not None:
        assert rng is not None, "mask_noise_perc requires an rng key"
        mask = jax.random.uniform(rng, x.shape) < mask_noise_perc
        eps = eps * mask
    return sqrt_a * scale * x + sqrt_1ma * eps


def remove_noise(
    sched: DDIMSchedule,
    noisy_samples: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Invert add_noise given the (predicted) noise (ddim_scheduler.py:189-216)."""
    xt = noisy_samples.astype(jnp.float32)
    eps = noise.astype(jnp.float32)
    sqrt_a = jnp.sqrt(_broadcast_gather(sched.alphas_cumprod, timesteps, xt.ndim))
    sqrt_1ma = jnp.sqrt(1.0 - _broadcast_gather(sched.alphas_cumprod, timesteps, xt.ndim))
    return (xt - sqrt_1ma * eps) / (sqrt_a * scale)


def pred_x0_and_eps(
    sched: DDIMSchedule,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    alpha_prod_t: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Recover (x0, eps) from the model output under the prediction type."""
    out = model_output.astype(jnp.float32)
    x = sample.astype(jnp.float32)
    beta_prod_t = 1.0 - alpha_prod_t
    sqrt_a, sqrt_b = jnp.sqrt(alpha_prod_t), jnp.sqrt(beta_prod_t)
    if sched.prediction_type == "epsilon":
        x0 = (x - sqrt_b * out) / sqrt_a
        eps = out
    elif sched.prediction_type == "sample":
        x0 = out
        eps = (x - sqrt_a * x0) / sqrt_b
    elif sched.prediction_type == "v_prediction":
        x0 = sqrt_a * x - sqrt_b * out
        eps = sqrt_a * out + sqrt_b * x
    else:
        raise NotImplementedError(sched.prediction_type)
    return x0, eps


def ddim_step(
    sched: DDIMSchedule,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    sample: jnp.ndarray,
    num_inference_steps: int,
    use_clipped_model_output: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One deterministic (eta=0) DDIM update (ddim_scheduler.py:218-269).

    ``timestep`` may be a traced scalar — suitable for use inside
    ``lax.scan`` over the inference grid. Returns (prev_sample, pred_x0).
    """
    t = jnp.asarray(timestep)
    prev_t = t - sched.num_train_timesteps // num_inference_steps
    alpha_prod_t = sched.alphas_cumprod[t]
    alpha_prod_t_prev = jnp.where(
        prev_t >= 0,
        sched.alphas_cumprod[jnp.maximum(prev_t, 0)],
        sched.final_alpha_cumprod,
    )

    x0, eps = pred_x0_and_eps(sched, model_output, sample, alpha_prod_t)
    if sched.clip_sample:
        x0 = jnp.clip(x0, -sched.clip_sample_range, sched.clip_sample_range)
    if use_clipped_model_output:
        eps = (sample.astype(jnp.float32) - jnp.sqrt(alpha_prod_t) * x0) / jnp.sqrt(
            1.0 - alpha_prod_t
        )

    direction = jnp.sqrt(1.0 - alpha_prod_t_prev) * eps
    prev_sample = jnp.sqrt(alpha_prod_t_prev) * x0 + direction
    return prev_sample, x0
