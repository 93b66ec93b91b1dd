"""Stage-2 (conditional latent diffusion) jitted train step.

The reference hot loop (trainers_ldm_cond.py:808-873) — frozen VAE encodes,
noise injection, optional self-conditioning double forward, masked/weighted
loss, clip, step, plus a barrier and a loss all-gather every iteration —
compiles here into ONE XLA program:

  * frozen encoders run inside the same jit in bf16, params never
    differentiated (their grads simply don't exist in the graph),
  * the self-conditioning forward is fused in with stop_gradient
    (SURVEY §7 hard parts: no separate no-grad pass),
  * SNR loss weights are a fp32 table gather,
  * collective work (grad all-reduce, loss mean) is inserted by XLA from
    the batch sharding.

Feature parity: min/rgb/cond noise levels, epsilon/sample prediction,
l1/l2/smooth_l1 + OHEM, ignore/counts/padding loss masks, inpainting latent
pasting, train-on-pred, input dropout, EMA.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ldmseg_tpu.diffusion import DDIMSchedule, add_noise, remove_noise
from ldmseg_tpu.models.unet import CondUNet
from ldmseg_tpu.models.vae_sd import SDVAE
from ldmseg_tpu.models.vae_seg import SegVAE
from ldmseg_tpu.utils.image import nearest_resize_torch
from .train_state import TrainState


@struct.dataclass
class LDMStepConfig:
    scaling_factor_image: float = 0.18215
    scaling_factor_seg: float = 0.18215
    sample_posterior: bool = False
    sample_posterior_rgb: bool = False
    min_noise_level: int = 0
    rgb_noise_level: int = 0
    cond_noise_level: int = 0
    self_condition: bool = False
    prob_train_on_pred: float = 0.0
    prob_inpainting: float = 0.0
    type_mask: str = "ignore"          # ignore | counts | padding | none
    ohem_ratio: float = 1.0
    loss_type: str = "l2"              # l1 | l2 | smooth_l1
    ignore_label: int = 0
    latent_size: int = 64
    num_classes: int = 128
    ema_decay: float = 0.9999
    use_ema: bool = False
    dropout: float = 0.0
    # compact host->device transfer: the trainer ships `image` as uint8 and
    # drops `image_semseg` entirely (re-derived on device from the uint8
    # `semseg` ids via encode_bitmap_jnp) — ~6x fewer bytes per step over
    # the interconnect; numerically exact for the bits encoding and
    # unnormalized images (see decompress_batch)
    compact_inputs: bool = False
    num_bits: int = 7
    bits_fill_value: float = 0.5


def elementwise_loss(pred, target, loss_type: str):
    d = pred - target
    if loss_type == "l1":
        return jnp.abs(d)
    if loss_type == "l2":
        return jnp.square(d)
    if loss_type == "smooth_l1":
        ad = jnp.abs(d)
        return jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
    raise ValueError(f"loss '{loss_type}'")


def build_loss_mask(
    cfg: LDMStepConfig,
    semseg: jnp.ndarray,
    padding_mask: Optional[jnp.ndarray],
) -> Optional[jnp.ndarray]:
    """Loss weight mask at latent resolution (trainers_ldm_cond.py:619-661)."""
    size = (cfg.latent_size, cfg.latent_size)
    if cfg.type_mask == "ignore":
        t = nearest_resize_torch(semseg.astype(jnp.float32), size)
        return (t != cfg.ignore_label).astype(jnp.float32)
    if cfg.type_mask == "counts":
        t = nearest_resize_torch(semseg.astype(jnp.float32), size).astype(jnp.int32)
        counts = jax.vmap(
            lambda x: jnp.bincount(x.reshape(-1), length=cfg.num_classes)
        )(t)
        inv = jnp.where(counts > 0, 1.0 / jnp.maximum(counts, 1), 0.0)
        inv = inv.at[:, cfg.ignore_label].set(0.0)
        b = t.shape[0]
        return jnp.take_along_axis(
            inv, t.reshape(b, -1), axis=-1
        ).reshape(t.shape)
    if cfg.type_mask == "padding":
        assert padding_mask is not None
        return nearest_resize_torch(padding_mask.astype(jnp.float32), size)
    return None


def compact_transfer_enabled(p) -> bool:
    """Whether the compact wire format is exact for this run config: bits
    encoding (the only one re-derivable from ids) and no host-side
    normalization (uint8 rgb must be the loader's /255 inverse)."""
    tk = p["train_kwargs"]
    return (
        tk.get("compact_transfer", True)
        and tk.get("encoding_mode", "bits") == "bits"
        and not p["transformation_kwargs"].get("normalize", False)
    )


def pack_compact_host_batch(host):
    """Host-side dual of ``decompress_batch``: uint8 rgb (exact — loader
    fp32 values are k/255 by construction), uint8 id/mask maps, and no
    image_semseg on the wire at all. Mutates and returns ``host``."""
    host.pop("image_semseg", None)
    if "image" in host:
        host["image"] = np.round(host["image"] * 255.0).astype(np.uint8)
    for k in ("semseg", "mask", "inpainting_mask"):
        if k in host:
            host[k] = host[k].astype(np.uint8)
    return host


def decompress_batch(batch, cfg):
    """Reconstruct the full training batch from its compact wire format.

    ``cfg`` is an LDMStepConfig or AEStepConfig (only ``num_bits``,
    ``bits_fill_value`` and ``ignore_label`` are read).

    The trainer's compact transfer (trainer_ldm._device_batch with
    ``compact_transfer``) ships `image` as uint8 and omits `image_semseg`;
    this re-derives both on device, value-identically in exact arithmetic
    (observed diffs are <=1 ulp from XLA lowering choices, e.g. /255 as a
    reciprocal multiply — tests/test_train_steps.py bounds the one-step
    effect at ~1e-7 on params):

      * image: uint8 -> float32/255 is the exact inverse of the loader's
        ToNumpy /255 (values are k/255 for integer k; unnormalized images
        only — the trainer keeps the fp32 path when `normalize` is on),
      * image_semseg: bit-encode the uint8 `semseg` ids on device
        (encode_bitmap_jnp == the host encode_bitmap LUT: {0,1} bits,
        ignore pixels = fill_value).

    Cuts per-step host->device bytes ~6x (B=8 @ 512^2 rgb / 256^2 seg:
    ~44 MB -> ~7 MB) — this is the hot host->device path the reference
    pays per iteration via its CUDA dataloader (coco.py:377-390 encodes
    on host and ships float tensors).
    """
    batch = dict(batch)
    img = batch.get("image")
    if img is not None and img.dtype == jnp.uint8:
        batch["image"] = img.astype(jnp.float32) / 255.0
    if "image_semseg" not in batch:
        from ldmseg_tpu.data.encodings import encode_bitmap_jnp

        bits, _ = encode_bitmap_jnp(
            batch["semseg"].astype(jnp.int32), n=cfg.num_bits,
            fill_value=cfg.bits_fill_value, ignore_label=cfg.ignore_label,
        )
        batch["image_semseg"] = bits
    return batch


def make_encode_fns(
    seg_vae: SegVAE,
    sd_vae: SDVAE,
    cfg: LDMStepConfig,
):
    """Frozen encoders: images in [0,1] -> scaled latents (+ mean latents).

    encode_inputs semantics (trainers_ldm_cond.py:334-394): scale to [-1,1],
    encode, posterior sample or mode, x scaling factor. Seg encoding always
    runs fp32 (trainers_ldm_cond.py:695).
    """

    def encode_seg(params, images01, rng):
        x = 2.0 * images01 - 1.0
        moments = seg_vae.apply(
            {"params": params}, x, method=lambda m, a: m.encode(a)
        )
        z, mean, _ = seg_vae.apply(
            {"params": params}, moments, rng, cfg.sample_posterior,
            method=lambda m, mo, r, sp: m.bottleneck(mo, r, sample_posterior=sp),
        )
        z = z if cfg.sample_posterior else mean
        return (
            jax.lax.stop_gradient(z * cfg.scaling_factor_seg),
            jax.lax.stop_gradient(mean * cfg.scaling_factor_seg),
        )

    def encode_rgb(params, images01, rng):
        x = 2.0 * images01 - 1.0
        z, mean, _ = sd_vae.apply(
            {"params": params}, x, rng, cfg.sample_posterior_rgb,
            method=lambda m, a, r, sp: m.encode(a, r, sample_posterior=sp),
        )
        z = z if cfg.sample_posterior_rgb else mean
        return jax.lax.stop_gradient(z * cfg.scaling_factor_image)

    return encode_seg, encode_rgb


def make_ldm_train_step(
    unet: CondUNet,
    seg_vae: SegVAE,
    sd_vae: SDVAE,
    sched: DDIMSchedule,
    tx: optax.GradientTransformation,
    cfg: LDMStepConfig,
    mesh=None,
    fsdp_min_size: int = 2**16,
) -> Callable:
    # the reference trains with epsilon or sample prediction only
    # (trainers_ldm_cond.py:585-590); v_prediction is inference-only
    assert sched.prediction_type in ("epsilon", "sample"), sched.prediction_type
    encode_seg, encode_rgb = make_encode_fns(seg_vae, sd_vae, cfg)

    def unet_apply(params, inputs, t, context, dropout_rng=None):
        return unet.apply(
            {"params": params}, inputs, t, context,
            deterministic=dropout_rng is None, dropout_rng=dropout_rng,
        )

    def loss_fn(params, frozen, batch, rng):
        # explicit ZeRO-1: all-gather fsdp-sharded params once per step
        # (fwd) / reduce-scatter grads back to the sharded layout (bwd);
        # everything in between is pure batch-DP (core/mesh.zero1_gather).
        # fsdp_min_size must match the shard_params_fsdp call that placed
        # the state (trainer: default; dryrun: 2**8).
        if mesh is not None and mesh.shape.get("fsdp", 1) > 1:
            from ldmseg_tpu.core.mesh import zero1_gather

            params = zero1_gather(params, mesh, fsdp_min_size)
        if cfg.compact_inputs:
            batch = decompress_batch(batch, cfg)
        keys = jax.random.split(rng, 10)
        (r_seg, r_rgb, r_noise, r_t, r_top, r_rgbn, r_condn, r_inp, r_drop,
         r_tp) = keys

        latents, latents_mean = encode_seg(
            frozen["seg_vae"], batch["image_semseg"], r_seg
        )
        rgb_latents = encode_rgb(frozen["sd_vae"], batch["image"], r_rgb)
        context = batch.get("encoder_hidden_states")

        b = latents.shape[0]

        # (optional) inpainting masks at latent res, active for a random
        # subset of the batch (trainers_ldm_cond.py:710-717)
        inpainting_masks = None
        if cfg.prob_inpainting > 0.0:
            active = jax.random.uniform(r_inp, (b, 1, 1)) < cfg.prob_inpainting
            m = nearest_resize_torch(
                batch["inpainting_mask"].astype(jnp.float32),
                (cfg.latent_size, cfg.latent_size),
            )
            inpainting_masks = jnp.where(active, m, 0.0)

        # (optional) noisy-student: replace latents with a model prediction
        # for a random subset (trainers_ldm_cond.py:736-742, 444-493)
        if cfg.prob_train_on_pred > 0.0:
            k1, k2, k3 = jax.random.split(r_tp, 3)
            tmax = sched.num_train_timesteps // 2
            t_p = jax.random.randint(k1, (b,), 0, tmax)
            n_p = jax.random.normal(k2, latents.shape)
            noisy_p = add_noise(sched, latents, n_p, t_p)
            pred_p = unet_apply(
                params, jnp.concatenate(
                    [noisy_p, rgb_latents] +
                    ([jnp.zeros_like(noisy_p)] if cfg.self_condition else []),
                    axis=-1),
                t_p, context,
            )
            if sched.prediction_type == "epsilon":
                pred_lat = remove_noise(sched, noisy_p, pred_p, t_p)
            else:
                pred_lat = pred_p
            pred_lat = jnp.clip(pred_lat, latents.min(), latents.max())
            take = jax.random.uniform(k3, (b, 1, 1, 1)) < cfg.prob_train_on_pred
            latents = jnp.where(take, jax.lax.stop_gradient(pred_lat), latents)

        loss_mask = build_loss_mask(
            cfg, batch["semseg"], batch.get("mask")
        )

        # noise + timesteps (trainers_ldm_cond.py:814-820)
        noise = jax.random.normal(r_noise, latents.shape)
        timesteps = jax.random.randint(
            r_t, (b,), cfg.min_noise_level, sched.num_train_timesteps
        )
        noisy_latents = add_noise(sched, latents, noise, timesteps)

        # self-conditioning: fused no-grad forward (ldm_cond.py:822-831)
        condition = None
        if cfg.self_condition:
            cond0 = jnp.zeros_like(noisy_latents)
            inputs0 = jnp.concatenate([noisy_latents, rgb_latents, cond0], axis=-1)
            pred0 = unet_apply(params, inputs0, timesteps, context)
            condition = jax.lax.stop_gradient(
                remove_noise(sched, noisy_latents, pred0, timesteps)
            )

        # (optional) noise the rgb conditioning (ldm_cond.py:566-572)
        rgb_in = rgb_latents
        timesteps_img = None
        if cfg.rgb_noise_level > 0:
            k1, k2 = jax.random.split(r_rgbn)
            timesteps_img = jax.random.randint(k1, (b,), 0, cfg.rgb_noise_level)
            rgb_in = add_noise(
                sched, rgb_latents, jax.random.normal(k2, rgb_latents.shape),
                timesteps_img,
            )
        parts = [noisy_latents, rgb_in]
        if condition is not None:
            cond_in = condition
            if cfg.cond_noise_level > 0:
                k1, k2 = jax.random.split(r_condn)
                t_c = jax.random.randint(k1, (b,), 0, cfg.cond_noise_level)
                cond_in = add_noise(
                    sched, condition, jax.random.normal(k2, condition.shape), t_c
                )
            parts.append(cond_in)
        inputs = jnp.concatenate(parts, axis=-1)

        target = noise if sched.prediction_type == "epsilon" else latents_mean
        prediction = unet_apply(
            params, inputs, timesteps, context,
            dropout_rng=r_drop if cfg.dropout > 0 else None,
        )

        loss = elementwise_loss(
            prediction.astype(jnp.float32), target.astype(jnp.float32),
            cfg.loss_type,
        )
        if loss_mask is not None:
            loss = loss * loss_mask[..., None]
        if sched.weight_mode != "none":
            loss = loss * sched.weights[timesteps][:, None, None, None]
        loss = loss.reshape(-1)
        if cfg.ohem_ratio < 1.0:
            k = int(cfg.ohem_ratio * loss.shape[0])
            loss = jax.lax.top_k(loss, k)[0]
        loss = jnp.mean(loss)

        # predicted x0 for the train grid; paste the original latents
        # through the inpainting mask (trainers_ldm_cond.py:605-615)
        if sched.prediction_type == "epsilon":
            pred_latents = remove_noise(sched, noisy_latents, prediction,
                                        timesteps)
        else:
            pred_latents = prediction
        if inpainting_masks is not None:
            pred_latents = jnp.where(
                inpainting_masks[..., None] > 0.5, latents_mean, pred_latents
            )
        aux = {
            "timesteps_mean": jnp.mean(timesteps.astype(jnp.float32)),
            "noisy_latents": jax.lax.stop_gradient(noisy_latents),
            "pred_latents": jax.lax.stop_gradient(pred_latents),
        }
        return loss, aux

    def train_step(
        state: TrainState,
        frozen: Dict[str, Any],
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # dp_scope is a trace-time switch: entering it here (inside the
        # traced function) turns on the UNet's batch-sharding constraints
        # exactly for this program (see core/mesh.constrain_batch)
        from contextlib import nullcontext

        from ldmseg_tpu.core.mesh import dp_scope

        with dp_scope(mesh) if mesh is not None else nullcontext():
            return _train_step_body(state, frozen, batch, rng)

    def _train_step_body(state, frozen, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch, rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema_params
        if cfg.use_ema and state.ema_params is not None:
            # EMA advances once per OPTIMIZER step (ldm_cond.py:873-877):
            # under optax.MultiSteps the warmup count is the gradient_step
            # and mid-accumulation microbatches leave the EMA untouched.
            if hasattr(new_opt, "gradient_step"):
                opt_step_f = new_opt.gradient_step.astype(jnp.float32)
                did_update = new_opt.mini_step == 0
            else:
                opt_step_f = state.step.astype(jnp.float32) + 1.0
                did_update = jnp.array(True)
            decay = jnp.minimum(cfg.ema_decay,
                                (1.0 + opt_step_f) / (10.0 + opt_step_f))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: jnp.where(
                    did_update, e * decay + p * (1.0 - decay), e),
                state.ema_params, new_params,
            )

        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **aux}
        return (
            state.replace(
                step=state.step + 1, params=new_params, opt_state=new_opt,
                ema_params=new_ema,
            ),
            metrics,
        )

    return train_step
