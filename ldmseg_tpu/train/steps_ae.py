"""Stage-1 (seg auto-encoder) jitted train step.

One fused XLA program per step replaces the reference's eager loop
(trainers_ae.py:244-346): corruption masking, VAE forward with posterior
sampling, point losses + KL, grad clip, optimizer update — with gradient
all-reduce implicit in the batch sharding (no dist.barrier / gpu_gather,
which the reference issues every step at trainers_ae.py:312,326-330).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ldmseg_tpu.losses import (
    SegLossConfig,
    matched_segmentation_loss,
    segmentation_point_loss,
)
from ldmseg_tpu.models.vae_seg import SegVAE
from ldmseg_tpu.utils.image import nearest_resize_torch
from .train_state import TrainState


@struct.dataclass
class AEStepConfig:
    loss_cfg: SegLossConfig = struct.field(default_factory=SegLossConfig)
    w_ce: float = 1.0
    w_mask: float = 1.0
    w_kl: float = 0.0
    prob_inpainting: float = 0.0
    latent_mask: bool = False
    fuse_rgb: bool = False
    sample_posterior: bool = True
    ignore_label: int = 0
    downsample_factor: int = 8
    do_matching: bool = False  # Hungarian matcher variant (losses.py:364-394)
    # compact host->device wire format (see steps_ldm.decompress_batch)
    compact_inputs: bool = False
    num_bits: int = 7
    bits_fill_value: float = 0.5


def make_ae_train_step(
    model: SegVAE,
    tx: optax.GradientTransformation,
    cfg: AEStepConfig,
    external_encoder=None,
) -> Callable:
    """``external_encoder``: optional (module, frozen_params_key) pair for the
    shared-SD-VAE-encoder option (tools/main_ae.py:140-143): the frozen SD
    encoder produces the bottleneck moments; only the seg decoder trains."""

    def loss_fn(params, batch, rng, frozen=None):
        if cfg.compact_inputs:
            from .steps_ldm import decompress_batch

            batch = decompress_batch(batch, cfg)
        r_corrupt1, r_corrupt2, r_post, r_loss = jax.random.split(rng, 4)
        images = 2.0 * batch["image_semseg"] - 1.0        # [B,H,W,Cbits]
        targets = batch["semseg"].astype(jnp.int32)        # [B,H,W]
        b, h, w = targets.shape

        rgbs = None
        if cfg.fuse_rgb:
            rgbs = 2.0 * batch["image"] - 1.0

        # (optional) random sparse-visibility corruption for inpainting
        # robustness (trainers_ae.py:264-272): keep only `strength` of pixels
        valid_region = None
        if cfg.prob_inpainting > 0.0:
            strengths = (
                jax.random.uniform(r_corrupt1, (b, 1, 1)) * cfg.prob_inpainting
            )
            masks32 = (
                jax.random.uniform(r_corrupt2, (b, 32, 32)) < strengths
            ).astype(jnp.float32)
            masks = nearest_resize_torch(masks32, (h, w))
            masks = jnp.where(targets == cfg.ignore_label, 0.0, masks)
            images = jnp.where(masks[..., None] > 0, images, 0.0)
            valid_region = masks

        latent_mask = None
        if cfg.latent_mask:
            lat = (h // cfg.downsample_factor, w // cfg.downsample_factor)
            t_small = nearest_resize_torch(targets.astype(jnp.float32), lat)
            latent_mask = (t_small != cfg.ignore_label).astype(jnp.float32)

        if external_encoder is not None:
            assert frozen is not None
            sd_vae, key = external_encoder
            moments = sd_vae.apply(
                {"params": frozen[key]}, images,
                method=lambda m, a: m.encode_moments(a),
            )
            moments = jax.lax.stop_gradient(moments)
            z, mode, kl = model.apply(
                {"params": params}, moments, r_post, cfg.sample_posterior,
                method=lambda m, mo, r, sp: m.bottleneck(mo, r, sample_posterior=sp),
            )
            if latent_mask is not None:
                z = z * latent_mask[..., None]
            logits = model.apply(
                {"params": params}, z, False,
                method=lambda m, a, interp: m.decode(a, interpolate=interp),
            )
        else:
            logits, z, kl = model.apply(
                {"params": params},
                images,
                rng=r_post,
                sample_posterior=cfg.sample_posterior,
                rgb_sample=rgbs,
                valid_mask=latent_mask,
            )
        if cfg.do_matching:
            losses = matched_segmentation_loss(logits, targets, r_loss, cfg.loss_cfg)
        else:
            losses = segmentation_point_loss(
                logits, targets, r_loss, cfg.loss_cfg, valid_region=valid_region
            )
        losses["kl"] = jnp.mean(kl)
        total = (
            cfg.w_ce * losses["ce"]
            + cfg.w_mask * losses["mask"]
            + cfg.w_kl * losses["kl"]
        )
        return total, losses

    def train_step(
        state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array,
        frozen=None,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(rng, state.step)
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, frozen
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": total, **losses,
                   "grad_norm": optax.global_norm(grads)}
        return (
            state.replace(step=state.step + 1, params=new_params, opt_state=new_opt),
            metrics,
        )

    return train_step


def make_ae_eval_step(model: SegVAE, cfg: AEStepConfig) -> Callable:
    """Eval forward: mode latents, full-res logits (bilinear upsample)."""

    def eval_step(params, batch):
        images = 2.0 * batch["image_semseg"] - 1.0
        rgbs = 2.0 * batch["image"] - 1.0 if cfg.fuse_rgb else None
        logits, z, kl = model.apply(
            {"params": params}, images, rng=None, sample_posterior=False,
            rgb_sample=rgbs,
        )
        return logits

    return eval_step
