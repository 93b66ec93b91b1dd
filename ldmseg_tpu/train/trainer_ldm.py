"""Stage-2 trainer: conditional latent diffusion over segmentation latents.

Orchestration equivalent of the reference TrainerDiffusion
(ldmseg/trainers/trainers_ldm_cond.py). Owns: frozen SD-VAE + seg-AE,
trainable CondUNet, DDIM schedule, datasets/loaders, the jitted train step
and jitted 50-step sampler, generative PQ eval with best-model tracking,
checkpoint/resume/load (incl. reference .pt conversion), visualizations
(train grid / val overview / panoptic overlay / noise-schedule strip /
noise-queries study).
"""

from __future__ import annotations

import functools
import math
import os
import time
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ldmseg_tpu.core.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    sp_scope,
    spatial_sharding,
)
from ldmseg_tpu.data.coco import get_dataset
from ldmseg_tpu.data.loader import DataLoader
from ldmseg_tpu.data.transforms import get_train_transforms, get_val_transforms
from ldmseg_tpu.diffusion import add_noise, inference_timesteps, make_schedule
from ldmseg_tpu.diffusion.dpm import dpm_sample
from ldmseg_tpu.diffusion.sampling import ddim_sample
from ldmseg_tpu.eval import PanopticEvaluator
from ldmseg_tpu.eval.postprocess import (
    assign_area_bucket_categories,
    postprocess_image,
)
from ldmseg_tpu.models import SegVAE
from ldmseg_tpu.models.convert import (
    convert_sd_unet,
    convert_sd_vae,
    convert_seg_vae,
    modify_conv_in,
)
from ldmseg_tpu.models.layers import resize_bilinear
from ldmseg_tpu.models.unet import CondUNet, UNetConfig
from ldmseg_tpu.models.vae_sd import SDVAE, SDVAEConfig
from ldmseg_tpu.train import (
    OptimConfig,
    TrainState,
    make_lr_schedule,
    make_optimizer,
)
from ldmseg_tpu.train.checkpoint import (
    finalize_pending_saves,
    load_torch_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from ldmseg_tpu.train.steps_ldm import (
    LDMStepConfig, compact_transfer_enabled, make_encode_fns,
    make_ldm_train_step, pack_compact_host_batch,
)
from ldmseg_tpu.train.trainer_ae import build_seg_vae_config
from ldmseg_tpu.utils.meters import AverageMeter, ProgressMeter
from ldmseg_tpu.utils.metrics_logger import (
    MetricsLogger, ProfilerHook, host_rss_gb, trim_host_heap,
)
from ldmseg_tpu.utils.visualize import (
    colorize_ids,
    make_row,
    overlay_panoptic,
    stack_rows,
    write_image,
)


def _resolve_head_dim(value, pretrained_path):
    """'auto' → 128 (TPU-native) for scratch runs, None (SD-v1 8-head
    split) when converted SD weights are loaded; int/None pass through."""
    if value != "auto":
        return value
    return None if pretrained_path else 128


def build_unet_config(p: Dict[str, Any]) -> UNetConfig:
    mk = p["model_kwargs"]
    descriptors = p["train_kwargs"].get("image_descriptors", "remove")
    cond_channels = mk.get("cond_channels", 0)
    # optional structural dims (default = SD v1-4 topology) so non-SD-sized
    # denoisers round-trip through config snapshots (tools/eval_run.py)
    structural = {
        k: (tuple(mk[k]) if k == "block_out_channels" else mk[k])
        for k in ("block_out_channels", "layers_per_block",
                  "num_attention_heads", "cross_attention_dim",
                  "norm_num_groups")
        if mk.get(k) is not None
    }
    return UNetConfig(
        in_channels=mk.get("in_channels", 8),
        out_channels=4,
        cond_channels=cond_channels,
        **structural,
        separate_conv=mk.get("separate_conv", False),
        separate_encoder=mk.get("separate_encoder", False),
        add_adaptor=mk.get("add_adaptor", False),
        use_cross_attention=descriptors != "remove",
        # TPU-native head partitioning. "auto" (the base.yaml default) picks
        # d=128 for scratch training — measured +28% sampling throughput on
        # v5e (BENCHMARKS.md round 3) because QK^T/PV then contract over all
        # 128 MXU lanes instead of SD v1's d=40 padding — and falls back to
        # the SD-v1 8-head split when loading converted SD weights (the
        # checkpoint was *trained* with 8 heads; the head split is a reshape,
        # not a param shape, so numerics not loading would break).
        attention_head_dim=_resolve_head_dim(
            mk.get("attention_head_dim"), p.get("pretrained_model_path")
        ),
        encoder_hid_dim=1024 if descriptors == "clip_image" else None,
        num_object_queries=128 if descriptors == "learnable" else None,
        input_dropout=p["train_kwargs"].get("dropout", 0.0),
        dtype="bfloat16"
        if p["train_kwargs"].get("weight_dtype", "float32") != "float32"
        else "float32",
    )


class TrainerDiffusion:
    def __init__(
        self,
        p: Dict[str, Any],
        mesh=None,
        results_folder: str = "./results",
        dataset_train=None,
        dataset_val=None,
        seed: int = 0,
        unet_cfg: Optional[UNetConfig] = None,
        sd_vae_cfg: Optional[SDVAEConfig] = None,
        tokenizer=None,
        text_encoder_fn=None,
        image_descriptor_fn=None,
    ):
        assert not (text_encoder_fn is not None
                    and image_descriptor_fn is not None), (
            "text and image-descriptor conditioning are mutually exclusive"
        )
        self.p = p
        self.mesh = mesh if mesh is not None else make_mesh()
        self.results_folder = results_folder
        os.makedirs(results_folder, exist_ok=True)
        self.visualization_dir = os.path.join(results_folder, "visualizations")
        os.makedirs(self.visualization_dir, exist_ok=True)
        self.seed = seed
        self.rng = jax.random.PRNGKey(seed)
        self.metrics_logger = MetricsLogger(
            results_folder, use_wandb=p.get("wandb", False), name=p.get("name")
        )
        self.profiler = ProfilerHook(
            results_folder, enabled=p["train_kwargs"].get("profile", False)
        )
        self.tokenizer = tokenizer
        self.text_encoder_fn = text_encoder_fn  # fn(tokens)->embeddings or None
        # fn(images01 [B,H,W,3]) -> [B,S,D] hidden states (clip_image modes);
        # mutually exclusive with text conditioning (ldm_cond.py:730)
        self.image_descriptor_fn = image_descriptor_fn
        self._uncond_cache = {}

        tk, ek, sk = p["train_kwargs"], p["eval_kwargs"], p["sampling_kwargs"]
        self.batch_size = tk["batch_size"]
        n_dev = self.mesh.devices.size
        assert self.batch_size % n_dev == 0, (
            f"batch_size {self.batch_size} must be divisible by the mesh "
            f"size {n_dev} (shard the batch over data x fsdp axes)"
        )
        self.batch_size_val = min(ek.get("batch_size", self.batch_size),
                                  self.batch_size)
        self.accumulate = tk.get("accumulate", 1)
        self.train_num_steps = tk["train_num_steps"]
        self.print_freq = ek.get("print_freq", 100)
        self._last_trim_step = 0
        self.save_and_sample_every = ek.get("vis_every", 1000)
        self.mask_th = ek["mask_th"]
        self.count_th = ek["count_th"]
        self.overlap_th = ek["overlap_th"]
        # postprocess temperature (1.0 = exact reference behavior); fitted
        # on the train split by tools/calibrate_postprocess.py
        # --fit-temperature to make the reference's 0.9/0.9 release
        # thresholds usable on under-confident scratch models
        self.eval_temperature = ek.get("temperature", 1.0)
        self.image_size = p["transformation_kwargs"]["size"]
        self.rgb_size = p["transformation_kwargs"].get("size_rgb", self.image_size)
        self.ignore_label = p.get("ignore_label", 0)
        self.num_classes = p.get("num_classes", 128)
        self.num_inference_steps = sk.get("num_inference_steps", 50)
        self.guidance_scale = sk.get("guidance_scale", 7.5)
        self.sampler = sk.get("sampler", "ddim")
        assert self.sampler in ("ddim", "dpm++"), self.sampler
        self.self_condition = tk.get("self_condition", False)
        self.best_pq = 0.0
        self.epoch = 0

        # models -----------------------------------------------------------
        self.vae_cfg = build_seg_vae_config(p)
        self.seg_vae = SegVAE(self.vae_cfg)
        # optional structural dims (default = SD v1-4 VAE) so non-SD-sized
        # runs round-trip through config snapshots (tools/eval_run.py)
        sdk = p.get("sd_vae_kwargs") or {}
        self.sd_vae_cfg = sd_vae_cfg or SDVAEConfig(
            scaling_factor=p.get("image_scaling_factor", 0.18215),
            dtype=tk.get("weight_dtype", "float32"),
            **{k: (tuple(v) if k == "block_out_channels" else v)
               for k, v in sdk.items()},
        )
        self.sd_vae = SDVAE(self.sd_vae_cfg)
        self.unet_cfg = unet_cfg or build_unet_config(p)
        self.unet = CondUNet(self.unet_cfg)
        self.latent_size = self.image_size // self.vae_cfg.downsample_factor

        self.sched = make_schedule(**p["noise_scheduler_kwargs"])

        # params ------------------------------------------------------------
        k1, k2, k3, self.rng = jax.random.split(self.rng, 4)
        seg_dummy = jnp.zeros(
            (1, self.image_size, self.image_size, self.vae_cfg.in_channels)
        )
        rgb_dummy = jnp.zeros((1, 64, 64, 3))
        lat_dummy = jnp.zeros(
            (1, self.latent_size, self.latent_size, self.unet_cfg.conv_in_channels)
        )
        seg_params = self.seg_vae.init({"params": k1}, seg_dummy, rng=k1)["params"]
        sd_params = self.sd_vae.init({"params": k2}, rgb_dummy, rng=k2)["params"]
        # raw context width: encoder_hid_dim when the UNet projects incoming
        # hidden states (clip_image mode), cross_attention_dim otherwise
        ctx_dim = (self.unet_cfg.encoder_hid_dim
                   or self.unet_cfg.cross_attention_dim)
        ctx_dummy = (
            jnp.zeros((1, 77, ctx_dim))
            if self.unet_cfg.use_cross_attention else None
        )
        unet_params = self.unet.init({"params": k3}, lat_dummy, jnp.array([1]),
                                     ctx_dummy)["params"]

        # pretrained loading -------------------------------------------------
        pm_path = p.get("pretrained_model_path")
        if pm_path and os.path.isdir(pm_path):
            sd_params, unet_params = self._load_sd_pretrained(
                pm_path, sd_params, unet_params
            )
        ae_path = p["vae_model_kwargs"].get("pretrained_path")
        if ae_path and os.path.exists(ae_path):
            if ae_path.endswith(".pt"):
                # reference stage-1 checkpoint (vae.py:116-121)
                data = load_torch_checkpoint(ae_path)
                seg_params = jax.tree_util.tree_map(
                    jnp.asarray, convert_seg_vae(data["vae"], self.vae_cfg)
                )
            else:
                # our own stage-1 orbax checkpoint dir (TrainerAE.save)
                data = restore_checkpoint(
                    os.path.dirname(ae_path), name=os.path.basename(ae_path)
                )
                seg_params = jax.tree_util.tree_map(
                    jnp.asarray, data["params"]
                )
            print(f"Loaded pretrained seg-AE from {ae_path}")

        self.frozen = {"seg_vae": seg_params, "sd_vae": sd_params}

        # data ----------------------------------------------------------------
        t_train = get_train_transforms(p["transformation_kwargs"])
        t_val = get_val_transforms(p["transformation_kwargs"])
        ds_kwargs = dict(
            remap_labels=tk.get("remap_seg", True),
            deterministic_remap=tk.get("deterministic_remap", False),
            encoding_mode=tk.get("encoding_mode", "bits"),
            caption_type=tk.get("caption_type", "none"),
            inpaint_mask_size=tuple(tk.get("inpaint_mask_size", (64, 64))),
            num_classes=self.num_classes,
            fill_value=p.get("fill_value", 0.5),
            ignore_label=self.ignore_label,
            inpainting_strength=p.get("inpainting_strength", 0.0),
            decode_cache=p.get("decode_cache", 0),
            tokenizer=self.tokenizer,
            holdout=p.get("holdout", 0),
            synthetic_categories=p.get("synthetic_categories", 0),
        )
        # kept for offline tools (tools/gate_matrix.py) that rebuild ds_val
        # with overridden holdout/synthetic_categories in the same process
        self._val_ds_kwargs = dict(ds_kwargs)
        self.ds = (
            dataset_train if dataset_train is not None else
            get_dataset(p["train_db_name"], p["data_dir"], p["split"],
                        transform=t_train,
                        caption_dropout=tk.get("caption_dropout", 1.0),
                        **ds_kwargs)
        )
        self.ds_val = (
            dataset_val if dataset_val is not None else
            get_dataset(p["val_db_name"], p["data_dir"], "val",
                        transform=t_val, caption_dropout=1.0, **ds_kwargs)
        )
        self.dl = DataLoader(
            self.ds, self.batch_size, shuffle=True, drop_last=True, seed=seed,
            process_index=jax.process_index(), process_count=jax.process_count(),
            num_threads=tk.get("num_workers", 0),
        )
        self.dl_val = DataLoader(
            self.ds_val, self.batch_size_val, shuffle=False, drop_last=False,
            seed=seed, process_index=jax.process_index(),
            process_count=jax.process_count(),
            num_threads=ek.get("num_workers", 0),
        )

        self.num_iters_per_epoch = math.ceil(len(self.dl) / self.accumulate)
        self.epochs = math.ceil(self.train_num_steps / self.num_iters_per_epoch)
        self.total_iters = self.epochs * self.num_iters_per_epoch
        self.start_epoch = 0
        self.step = 0
        print(f"training for {self.epochs} epochs / {self.total_iters} iters")

        # optimizer ------------------------------------------------------------
        ok = p["optimizer_kwargs"]
        lr_kwargs = p.get("lr_scheduler_kwargs", {})
        base_lr = ok["lr"]
        if lr_kwargs.get("lr_scaling"):
            eff_bs = self.batch_size * self.accumulate * jax.process_count()
            base_lr = base_lr * eff_bs / 64.0
        self.lr_schedule = make_lr_schedule(
            p.get("lr_scheduler_name", "constant"), base_lr, self.total_iters,
            final_lr=lr_kwargs.get("final_lr", 0.0),
            warmup_iters=lr_kwargs.get("warmup_iters", 0),
        )
        self.optim_cfg = OptimConfig(
            name=p.get("optimizer_name", "adamw"),
            lr=base_lr,
            betas=tuple(ok.get("betas", (0.9, 0.999))),
            weight_decay=ok.get("weight_decay", 0.0),
            weight_decay_norm=ok.get("weight_decay_norm", 0.0),
            clip_grad=tk.get("clip_grad", 0.0),
            backbone_multiplier=p.get("optimizer_backbone_multiplier", 1.0),
            freeze_layers=tuple(tk.get("freeze_layers", ())),
            accumulate=self.accumulate,
        )
        self.tx = make_optimizer(unet_params, self.optim_cfg, self.lr_schedule)
        self.use_ema = p.get("ema_on", False)
        self.state = TrainState.create(unet_params, self.tx, ema=self.use_ema)

        # jitted step + sampler --------------------------------------------------
        # compact host->device transfer (steps_ldm.decompress_batch): ship
        # uint8 rgb + uint8 seg ids, re-derive fp32 image / bit-encoded
        # image_semseg on device. Exact only for bits encoding without
        # host-side normalization; default ON there (pure wire-format win).
        self._compact_transfer = compact_transfer_enabled(p)
        self.step_cfg = LDMStepConfig(
            scaling_factor_image=self.sd_vae_cfg.scaling_factor,
            scaling_factor_seg=self.vae_cfg.scaling_factor,
            sample_posterior=tk.get("sample_posterior", False),
            sample_posterior_rgb=tk.get("sample_posterior_rgb", False),
            min_noise_level=tk.get("min_noise_level", 0),
            rgb_noise_level=tk.get("rgb_noise_level", 0),
            cond_noise_level=tk.get("cond_noise_level", 0),
            self_condition=self.self_condition,
            prob_train_on_pred=tk.get("prob_train_on_pred", 0.0),
            prob_inpainting=tk.get("prob_inpainting", 0.0),
            type_mask=tk.get("type_mask", "ignore"),
            ohem_ratio=tk.get("ohem_ratio", 1.0),
            loss_type=tk.get("loss", "l2"),
            ignore_label=self.ignore_label,
            latent_size=self.latent_size,
            num_classes=self.num_classes,
            use_ema=self.use_ema,
            ema_decay=p.get("ema_kwargs", {}).get("decay", 0.9999),
            dropout=tk.get("dropout", 0.0),
            # compact wire format (uint8 image, on-device bit-encode) is
            # exact only for the bits encoding on unnormalized images
            compact_inputs=self._compact_transfer,
            num_bits=p.get("num_bits", 7),
            bits_fill_value=p.get("fill_value", 0.5),
        )
        self._train_step = jax.jit(
            make_ldm_train_step(
                self.unet, self.seg_vae, self.sd_vae, self.sched, self.tx,
                self.step_cfg, mesh=self.mesh,
            ),
            donate_argnums=(0,),
        )
        self._encode_seg, self._encode_rgb = make_encode_fns(
            self.seg_vae, self.sd_vae, self.step_cfg
        )
        self._encode_rgb_jit = jax.jit(self._encode_rgb)
        self._sample_jit = jax.jit(
            self._sample_impl,
            static_argnames=("num_inference_steps", "repeat_noise"),
        )
        self._decode_jit = jax.jit(self._decode_impl)
        self._batch_sharding = batch_sharding(self.mesh)

    # -- pretrained --------------------------------------------------------
    def _load_sd_pretrained(self, path, sd_params, unet_params):
        """Load SD v1-4 from a local diffusers-layout directory."""
        from ldmseg_tpu.models.sd_weights import load_diffusers_state

        vae_state = load_diffusers_state(os.path.join(path, "vae"))
        unet_state = load_diffusers_state(os.path.join(path, "unet"))
        if vae_state is not None:
            sd_params = jax.tree_util.tree_map(
                jnp.asarray, convert_sd_vae(vae_state)
            )
            print("Loaded SD VAE weights")
        if unet_state is not None:
            converted = convert_sd_unet(unet_state, self.unet_cfg)
            mk = self.p["model_kwargs"]
            converted = modify_conv_in(
                converted,
                in_channels=mk.get("in_channels", 8),
                init_mode_seg=mk.get("init_mode_seg", "copy"),
                init_mode_image=mk.get("init_mode_image", "copy"),
                cond_channels=mk.get("cond_channels", 0),
                init_mode_cond=mk.get("init_mode_cond", "zero"),
            )
            unet_params = jax.tree_util.tree_map(jnp.asarray, converted)
            print("Loaded + surgically adapted SD UNet weights")
        return sd_params, unet_params

    # -- sampling / decoding -------------------------------------------------
    def _sample_impl(self, params, rgb_latents, rng, context=None,
                     uncond_context=None,
                     inpaint_mask=None, known_latents=None,
                     num_inference_steps=50, repeat_noise=False):
        # spatial partitioning (mesh sp axis > 1): shard the latent rows
        # across chips — convs get XLA halo exchange, attention dispatches
        # sequence-parallel (kernels/attention.py). Entered inside the
        # traced fn so every retrace sees it.
        sp_active = self.mesh.shape.get("sp", 1) > 1

        def denoise(inputs, t, ctx):
            if sp_active:
                inputs = jax.lax.with_sharding_constraint(
                    inputs, spatial_sharding(self.mesh))
                with sp_scope(self.mesh):
                    return self.unet.apply({"params": params}, inputs, t, ctx)
            return self.unet.apply({"params": params}, inputs, t, ctx)

        # sampling_kwargs.sampler: 'ddim' (default, reference parity) or
        # 'dpm++' (DPM-Solver++(2M), diffusion/dpm.py — DDIM quality in
        # fewer UNet evals; PQ-gated on-chip via tools/eval_run.py)
        sample_fn = dpm_sample if self.sampler == "dpm++" else ddim_sample
        return sample_fn(
            denoise, self.sched, rng, rgb_latents,
            num_inference_steps=num_inference_steps,
            self_condition=self.self_condition,
            encoder_hidden_states=context,
            uncond_hidden_states=uncond_context,
            guidance_scale=self.guidance_scale,
            inpaint_mask=inpaint_mask,
            known_latents=known_latents,
            repeat_noise=repeat_noise,
        )

    def _decode_impl(self, seg_params, latents):
        z = latents / self.vae_cfg.scaling_factor
        if self.mesh.shape.get("sp", 1) > 1:
            # decode has the largest activations (128-way logits at full
            # resolution) — keep its rows spatially sharded too
            z = jax.lax.with_sharding_constraint(z, spatial_sharding(self.mesh))
            with sp_scope(self.mesh):
                return self.seg_vae.apply(
                    {"params": seg_params}, z, True,
                    method=lambda m, a, interp: m.decode(a, interpolate=interp),
                )
        return self.seg_vae.apply(
            {"params": seg_params}, z, True,
            method=lambda m, a, interp: m.decode(a, interpolate=interp),
        )

    def sample(self, rgb_latents, rng=None, num_inference_steps=None, **kw):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        steps = num_inference_steps or self.num_inference_steps
        return self._sample_jit(
            self.eval_params, rgb_latents, rng,
            num_inference_steps=steps, **kw,
        )

    @property
    def eval_params(self):
        return (
            self.state.ema_params
            if (self.use_ema and self.state.ema_params is not None)
            else self.state.params
        )

    def decode_latents(self, latents, return_logits=False,
                       threshold_output=False):
        """Latents -> logits (or colorized id maps); ldm_cond.py:396-442."""
        logits = self._decode_jit(self.frozen["seg_vae"], latents)
        if return_logits:
            return logits
        pred = np.array(jnp.argmax(logits, axis=-1))  # writable copy
        if threshold_output:
            probs = np.asarray(jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1))
            pred[probs < self.mask_th] = self.ignore_label
        return np.stack([colorize_ids(p) for p in pred])

    def encode_rgb_images(self, images01, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        images01 = jnp.asarray(images01)
        if self.rgb_size != images01.shape[1]:
            images01 = resize_bilinear(images01, (self.rgb_size, self.rgb_size))
        lat = self._encode_rgb_jit(self.frozen["sd_vae"], images01, rng)
        if lat.shape[1] != self.latent_size:
            lat = resize_bilinear(lat, (self.latent_size, self.latent_size))
        return lat

    # -- context (text / image descriptors) ----------------------------------
    def _batch_context(self, batch) -> Optional[jnp.ndarray]:
        if self.text_encoder_fn is not None and "tokens" in batch:
            return jnp.asarray(self.text_encoder_fn(batch["tokens"]))
        if self.image_descriptor_fn is not None and "image" in batch:
            # frozen CLIP vision features of the RGB input
            # (ldm_cond.py:721-728); computed host-side, streamed to device
            return jnp.asarray(self.image_descriptor_fn(np.asarray(batch["image"])))
        return None

    def _uncond_context(self, batch_size: int) -> Optional[jnp.ndarray]:
        """Empty-string embeddings for classifier-free guidance, text mode
        only (ldm_cond.py:1113-1117). The clip_image modes duplicate the
        cond context into both halves in the reference (:1100-1107), which
        makes CFG an identity — we run the single equivalent forward."""
        if self.text_encoder_fn is None or self.tokenizer is None:
            return None
        if batch_size not in self._uncond_cache:
            tokens = self.tokenizer(
                [""] * batch_size, padding="max_length",
                max_length=self.tokenizer.model_max_length,
                truncation=True, return_tensors="np",
            ).input_ids
            self._uncond_cache[batch_size] = jnp.asarray(
                self.text_encoder_fn(tokens)
            )
        return self._uncond_cache[batch_size]

    # -- training -------------------------------------------------------------
    def _device_batch(self, batch):
        keys = ["image_semseg", "semseg", "image", "mask", "inpainting_mask"]
        host = {k: np.asarray(batch[k]) for k in keys if k in batch}
        if self._compact_transfer:
            # ~6x fewer bytes per step through the interconnect; the step
            # re-derives the full batch on device (decompress_batch)
            host = pack_compact_host_batch(host)
        db = {
            k: jax.device_put(jnp.asarray(v), self._batch_sharding)
            for k, v in host.items()
        }
        ctx = self._batch_context(batch)
        if ctx is not None:
            db["encoder_hidden_states"] = jax.device_put(ctx, self._batch_sharding)
        return db

    def train_single_epoch(self, epoch, losses, progress):
        # bulk meter flush every print_freq batches and at epoch end: keeps
        # device arrays async between flushes but counts every batch
        pending = []
        n_batches = len(self.dl)
        for batch_idx, batch in enumerate(self.dl):
            db = self._device_batch(batch)
            self.state, metrics = self._train_step(
                self.state, self.frozen, db, jax.random.PRNGKey(self.seed)
            )
            if (batch_idx + 1) % self.accumulate == 0 or batch_idx + 1 == n_batches:
                self.step += 1
            self.profiler.step(self.step)
            # keep only scalar metrics pending (the grid latents in aux
            # would otherwise pin ~0.5MB of HBM per step until the flush)
            pending.append(
                {k: v for k, v in metrics.items()
                 if getattr(v, "ndim", 0) == 0}
            )
            if (batch_idx + 1) % self.print_freq == 0 or batch_idx + 1 == n_batches:
                for m in pending:
                    losses.update(float(m["loss"]), self.batch_size)
                if (batch_idx + 1) % self.print_freq == 0:
                    progress.display(batch_idx)
                self.metrics_logger.log(
                    {"loss": float(pending[-1]["loss"]),
                     "grad_norm": float(pending[-1]["grad_norm"]),
                     "rss_gb": host_rss_gb()},
                    step=self.step,
                )
                pending.clear()
                if self.step - self._last_trim_step >= 100:
                    # bound glibc arena garbage between eval/save trims —
                    # the per-step transfer garbage otherwise accumulates
                    # ~GBs per 100 steps on the tunneled backend
                    # (tools/repro_rss.py; BENCHMARKS.md host-RSS section)
                    self._last_trim_step = self.step
                    trim_host_heap()
            if self.check_iter(batch_idx, epoch) and jax.process_index() == 0:
                self.log_images_train(batch, db, metrics)

    def train_loop(self):
        # seed=None defers to eval_kwargs.eval_seeds (default [0] = the
        # reference's single-seed protocol; the quality recipe sets >=3
        # seeds so best-model selection rides the mean, not one draw)
        evaluation = functools.partial(
            self.compute_metrics, metrics=["pq"], threshold_output=True,
            save_images=True, seed=None,
            num_inference_steps=self.num_inference_steps,
        )
        print("Evaluating ...")
        # full initial eval by default (parity); cap via initial_eval_iters
        evaluation(max_iter=self.p["eval_kwargs"].get("initial_eval_iters"))
        start = time.time()
        eval_every = self.p["eval_kwargs"].get("eval_every", 1)
        # Two-tier eval cadence (VERDICT r4 next #2): the full protocol eval
        # (eval_seeds x num_inference_steps, drives best-model selection)
        # measured ~350-600s on the tunneled TPU; run every 300 steps it ate
        # 80-90% of round-4 training wall-clock. When
        # eval_kwargs.full_eval_every is set, only every full_eval_every-th
        # epoch runs the full protocol; the other eval_every epochs run a
        # cheap trend eval (quick_eval_seeds x quick_eval_steps, default 1
        # seed x 25 steps, logged under val_quick/, never selects
        # best_model). full_eval_every=None keeps reference behavior: every
        # eval is full (trainers_ldm_cond.py:965 evals once per epoch).
        full_eval_every = self.p["eval_kwargs"].get("full_eval_every")
        quick_steps = self.p["eval_kwargs"].get("quick_eval_steps", 25)
        quick_seeds = self.p["eval_kwargs"].get("quick_eval_seeds")
        # per-epoch checkpointing is reference behavior, but a full save is
        # a device_get of the whole UNet (~3.4GB) — pathological for short
        # epochs; train_kwargs.save_every (epochs) spaces it out
        save_every = self.p["train_kwargs"].get("save_every", 1)
        for epoch in range(self.start_epoch, self.epochs):
            print(f"Starting epoch {epoch}")
            self.epoch = epoch
            losses = AverageMeter("Loss", ":.4e")
            progress = ProgressMeter(len(self.dl), [losses],
                                     prefix=f"Epoch: [{epoch}]")
            self.dl.set_epoch(epoch)
            t0 = time.time()
            self.train_single_epoch(epoch, losses, progress)
            if jax.process_index() == 0 and (
                (epoch + 1) % save_every == 0 or epoch == self.epochs - 1
            ):
                self.save(epoch)
            if (epoch + 1) % eval_every == 0 or epoch == self.epochs - 1:
                full = (
                    full_eval_every is None
                    or (epoch + 1) % full_eval_every == 0
                    or epoch == self.epochs - 1
                )
                if full:
                    evaluation(set_save_model=True)
                else:
                    seeds = list(
                        quick_seeds
                        or (self.p["eval_kwargs"].get("eval_seeds") or [0])[:1]
                    )
                    self.compute_metrics(
                        metrics=["pq"], threshold_output=True,
                        save_images=False, seed=seeds,
                        num_inference_steps=quick_steps,
                        set_save_model=False, log_prefix="val_quick",
                    )
            print(f"Epoch {epoch}: avg loss {losses.avg:.4e}, "
                  f"{time.time() - t0:.1f}s")
        evaluation(max_iter=None)
        finalize_pending_saves()  # async saves durable before we return
        print(f"Finished in {time.time() - start:.1f}s")

    def check_iter(self, batch_idx, epoch):
        return (self.step != 0 and self.step % self.save_and_sample_every == 0) or (
            epoch == self.epochs - 1 and batch_idx == len(self.dl) - 1
        )

    # -- evaluation -------------------------------------------------------------
    def compute_metrics(self, metrics=("pq",), threshold_output=True,
                        save_images=False, seed=None, max_iter=None,
                        num_inference_steps=50, set_save_model=False,
                        class_agnostic=True, log_prefix="val", **_):
        results = {}
        for m in metrics:
            if m.lower() == "pq":
                results["pq"] = self.compute_pq(
                    num_inference_steps=num_inference_steps,
                    threshold_output=threshold_output, save_images=save_images,
                    seed=seed, max_iter=max_iter, save_model=set_save_model,
                    class_agnostic=class_agnostic, log_prefix=log_prefix,
                )
            else:
                raise NotImplementedError(m)
        return results

    def compute_pq(self, num_inference_steps=50, guidance_scale=7.5, seed=None,
                   threshold_output=True, save_images=False, max_iter=None,
                   threshold_mode="max", save_model=False, class_agnostic=True,
                   log_prefix="val"):
        """Generative eval: encode RGB -> 50-step sample -> decode -> PQ
        (trainers_ldm_cond.py:1180-1346).

        When ``eval_kwargs.eval_seeds`` lists >1 noise seeds (or ``seed``
        is a list/tuple), the full val sweep runs once per seed and the
        reported PQ is the mean across seeds (per-seed values under
        "PQ_seeds"). On a tiny val set single-seed PQ has a measured std
        of several points (BENCHMARKS.md round-3 multi-seed row), so
        best-model selection on one seed picks lucky draws — the mean is
        the honest criterion (VERDICT r3 weak #2).

        ``class_agnostic=False`` runs the class-aware evaluator (reference
        panoptic_evaluation.py:60-73): predicted segments are assigned
        contiguous category ids, converted back to dataset ids by the
        evaluator. On the bundled examples the categories are the
        synthetic area buckets (data/coco.py area_bucket_category), so the
        prediction side derives each segment's category from its own mask
        area — matching GT iff the mask is approximately right."""
        if isinstance(seed, (list, tuple)):
            seeds = list(seed)
        elif seed is not None:
            seeds = [seed]
        else:
            seeds = list(self.p["eval_kwargs"].get("eval_seeds") or [0])

        per_seed = []
        for s_idx, s in enumerate(seeds):
            res = self._compute_pq_one_seed(
                s, num_inference_steps=num_inference_steps,
                threshold_output=threshold_output,
                save_images=save_images and s_idx == 0, max_iter=max_iter,
                threshold_mode=threshold_mode, class_agnostic=class_agnostic,
            )
            if res is not None:
                per_seed.append(res["panoptic_seg"])

        if not per_seed:
            return None
        keys = per_seed[0].keys()
        results = {"panoptic_seg": {
            k: float(np.mean([r[k] for r in per_seed])) for k in keys
        }}
        if len(per_seed) > 1:
            results["panoptic_seg"]["PQ_seed_std"] = float(
                np.std([r["PQ"] for r in per_seed], ddof=1)
            )
            results["PQ_seeds"] = {
                str(s): r["PQ"] for s, r in zip(seeds, per_seed)
            }
        trim_host_heap()  # eval device_gets GBs of logits; return freed pages
        if jax.process_index() == 0:
            self.metrics_logger.log(
                dict({f"{log_prefix}/{k}": v
                      for k, v in results["panoptic_seg"].items()},
                     rss_gb=host_rss_gb()),
                step=self.step,
            )
        if (
            save_model and jax.process_index() == 0
            and results["panoptic_seg"]["PQ"] > self.best_pq
        ):
            self.best_pq = results["panoptic_seg"]["PQ"]
            print(f"Saving best model with PQ {self.best_pq:.3f} "
                  f"(mean over seeds {seeds})")
            self.save(self.epoch, name="best_model", extra={"PQ": self.best_pq})
        return results

    def _compute_pq_one_seed(self, seed, num_inference_steps=50,
                             threshold_output=True, save_images=False,
                             max_iter=None, threshold_mode="max",
                             class_agnostic=True):
        evaluator = PanopticEvaluator(self.ds_val.meta_data,
                                      class_agnostic=class_agnostic)
        num_buckets = getattr(self.ds_val, "synthetic_categories", 0)
        if not class_agnostic and not num_buckets:
            raise NotImplementedError(
                "class-aware PQ on the examples dataset requires "
                "synthetic_categories>=2 (the model predicts no classes)"
            )
        thing_map = self.ds_val.meta_data["thing_dataset_id_to_contiguous_id"]
        rng = jax.random.PRNGKey(seed)
        # eval observability (VERDICT r4 next #7): when a seed's PQ comes
        # out 0.00 the row must self-explain — was the postprocessor
        # starved of confident mass, or did it keep segments that all
        # missed? Accumulated per seed: kept-segment count, mean kept
        # area, and the fraction of pixels whose max-softmax clears
        # mask_th (same statistic as tools/calibrate_postprocess.py).
        n_segs = 0
        seg_area_sum = 0
        conf_pix = 0
        tot_pix = 0

        for batch_idx, batch in enumerate(self.dl_val):
            # fresh noise per val batch (reference draws sequentially from
            # one generator, trainers_ldm_cond.py:1088)
            rng, rng_batch = jax.random.split(rng)
            rgb = jnp.asarray(batch["image"])
            rgb_latents = self.encode_rgb_images(rgb)
            context = self._batch_context(batch)
            latents = self.sample(
                rgb_latents, rng=rng_batch,
                num_inference_steps=num_inference_steps,
                context=context,
                uncond_context=(
                    self._uncond_context(int(rgb.shape[0]))
                    if context is not None else None
                ),
            )
            logits = self.decode_latents(latents, return_logits=True)
            logits = np.asarray(
                resize_bilinear(logits, (rgb.shape[1], rgb.shape[2]))
            )
            file_names = [m["image_file"] for m in batch["meta"]]
            image_ids = [m["image_id"] for m in batch["meta"]]
            lt = (logits / np.float32(self.eval_temperature)
                  if self.eval_temperature != 1.0 else logits)
            xe = np.exp(lt - lt.max(axis=-1, keepdims=True))
            conf = (xe / xe.sum(axis=-1, keepdims=True)).max(axis=-1)
            conf_pix += int((conf >= self.mask_th).sum())
            tot_pix += int(conf.size)
            outputs = []
            for i in range(len(file_names)):
                pan, segs = postprocess_image(
                    logits[i], np.asarray(batch["mask"][i]),
                    batch["meta"][i]["im_size"],
                    mask_th=self.mask_th, count_th=self.count_th,
                    overlap_th=self.overlap_th, ignore_label=self.ignore_label,
                    threshold_output=threshold_output,
                    threshold_mode=threshold_mode,
                    temperature=self.eval_temperature,
                )
                if not class_agnostic:
                    segs = assign_area_bucket_categories(
                        pan, segs, num_buckets, thing_map
                    )
                n_segs += len(segs)
                ids, cnts = np.unique(pan, return_counts=True)
                seg_area_sum += int(cnts[ids != 0].sum())
                outputs.append({"panoptic_seg": (pan, segs)})
            evaluator.process(file_names, image_ids, outputs)
            if save_images and batch_idx == 0 and jax.process_index() == 0:
                self.log_images_val(batch, latents, outputs)
            if max_iter is not None and batch_idx + 1 >= max_iter:
                break

        res = evaluator.evaluate()
        if res is not None:
            res["panoptic_seg"]["pred_segments"] = float(n_segs)
            res["panoptic_seg"]["seg_mean_area"] = float(
                seg_area_sum / max(n_segs, 1)
            )
            res["panoptic_seg"]["conf_mass"] = float(
                conf_pix / max(tot_pix, 1)
            )
        return res

    # -- visualization -----------------------------------------------------------
    def log_images_val(self, batch, latents, outputs):
        images = self.decode_latents(latents, threshold_output=True)
        n = min(self.batch_size_val, len(images))
        size = self.image_size
        rows = [
            make_row([batch["image"][i] for i in range(n)], size),
            make_row([colorize_ids(np.asarray(batch["semseg"][i]))
                      for i in range(n)], size),
            make_row([images[i] for i in range(n)], size),
            make_row([
                overlay_panoptic(
                    np.asarray(batch["image"][i]),
                    np.asarray(
                        resize_nearest_to(outputs[i]["panoptic_seg"][0],
                                          (size, size))
                    ),
                ) for i in range(n)
            ], size),
        ]
        path = write_image(stack_rows(rows), self.visualization_dir,
                           "overview.png")
        self.metrics_logger.log_image("val/overview", path, step=self.step)

    def log_images_train(self, batch, db, metrics=None):
        """Train grid: rgb / gt / noisy / pred-x0 / generated rows
        (trainers_ldm_cond.py:1348-1538)."""
        rgb_latents = self.encode_rgb_images(jnp.asarray(batch["image"]))
        context = self._batch_context(batch)
        latents = self.sample(
            rgb_latents, context=context,
            uncond_context=(
                self._uncond_context(int(rgb_latents.shape[0]))
                if context is not None else None
            ),
        )
        gen = self.decode_latents(latents, threshold_output=True)
        n = min(self.batch_size_val, len(gen))
        size = self.image_size
        rows = [
            make_row([batch["image"][i] for i in range(n)], size),
            make_row([colorize_ids(np.asarray(batch["semseg"][i]))
                      for i in range(n)], size),
        ]
        if metrics is not None and "noisy_latents" in metrics:
            # decoded noisy input + predicted-x0 latents from the last step
            noisy = self.decode_latents(metrics["noisy_latents"],
                                        threshold_output=False)
            pred = self.decode_latents(metrics["pred_latents"],
                                       threshold_output=False)
            rows.append(make_row([noisy[i] for i in range(min(n, len(noisy)))],
                                 size))
            rows.append(make_row([pred[i] for i in range(min(n, len(pred)))],
                                 size))
        rows.append(make_row([gen[i] for i in range(n)], size))
        path = write_image(stack_rows(rows), self.visualization_dir, "all.png")
        self.metrics_logger.log_image("train/grid", path, step=self.step)

    def visualize_noise_schedule(self, seed: int = 42):
        """Noise-schedule strip (trainers_ldm_cond.py:1571-1604)."""
        if jax.process_index() != 0:
            return
        batch = next(iter(self.dl))
        images = jnp.asarray(batch["image_semseg"][:1])
        # reuse one jit wrapper across calls — a fresh jax.jit() per call
        # leaks an executable every vis_every steps
        if not hasattr(self, "_encode_seg_jit"):
            self._encode_seg_jit = jax.jit(self._encode_seg)
        latents, _ = self._encode_seg_jit(
            self.frozen["seg_vae"], images, jax.random.PRNGKey(seed)
        )
        noise = jax.random.normal(jax.random.PRNGKey(seed), latents.shape)
        panels = [np.asarray(batch["image"][0])]
        for t in range(0, self.sched.num_train_timesteps, 125):
            noisy = add_noise(self.sched, latents, noise, jnp.array([t]))
            panels.append(self.decode_latents(noisy, threshold_output=False)[0])
        write_image(
            make_row(panels, self.image_size), self.visualization_dir,
            "noise_schedule.jpg",
        )

    def visualize_noise(self, nrows: int = 4, num_inference_steps: int = 50):
        """Noise-queries study: same noise across the batch, varying seeds
        (trainers_ldm_cond.py:1606-1717)."""
        if jax.process_index() != 0:
            return
        batch = next(iter(self.dl))
        rgb = jnp.asarray(batch["image"])
        rgb_latents = self.encode_rgb_images(rgb)
        context = self._batch_context(batch)
        uncond = (self._uncond_context(int(rgb.shape[0]))
                  if context is not None else None)
        rows = [make_row(list(np.asarray(batch["image"])), self.image_size)]
        for row in range(nrows):
            latents, noise_map = self.sample(
                rgb_latents, rng=jax.random.PRNGKey(1 + row),
                num_inference_steps=num_inference_steps, repeat_noise=True,
                context=context, uncond_context=uncond,
            )
            gen = self.decode_latents(latents, threshold_output=True)
            rows.append(make_row(list(gen), self.image_size))
        write_image(stack_rows(rows), self.visualization_dir, "noise_queries.jpg")

    # -- checkpointing -------------------------------------------------------------
    def save(self, epoch, name: str = "model", extra: Optional[Dict] = None):
        """Full save dict incl. optimizer state and config snapshot
        (trainers_ldm_cond.py:1791-1814)."""
        from flax import serialization

        payload = {
            "step": self.step,
            "state_step": int(jax.device_get(self.state.step)),
            "epoch": epoch,
            "best_pq": self.best_pq,
            "unet": jax.device_get(self.state.params),
            "vae_semseg": jax.device_get(self.frozen["seg_vae"]),
            "vae_image": jax.device_get(self.frozen["sd_vae"]),
            "ema": (jax.device_get(self.state.ema_params)
                    if self.use_ema else None),
            # namedtuple opt_state -> pure nested dict (stable under orbax
            # raw round-trip; restored via serialization.from_state_dict)
            "opt_state": (
                serialization.to_state_dict(
                    jax.device_get(self.state.opt_state))
                if self.p.get("optimizer_save_optim", False) else None),
        }
        if extra:
            payload.update(extra)
        # config snapshot rides along with the checkpoint (ldm_cond.py:1810).
        # train_kwargs.async_save=True overlaps the multi-GB disk write with
        # training (at most one save in flight; the atomic swap happens
        # before the next save / any restore / end of train_loop)
        save_checkpoint(self.results_folder, payload, name=name,
                        config=self.p,
                        block=not self.p["train_kwargs"].get("async_save", False))
        # the payload is a ~10GB host copy of the full train state; make
        # sure nothing (orbax futures, traceback frames) pins it until the
        # next save — long tunneled runs OOM'd at 130GB host RSS
        del payload
        import gc

        gc.collect()
        trim_host_heap()
        self.metrics_logger.log(
            {"save/rss_gb": host_rss_gb()}, step=self.step
        )

    def resume(self, load_vae: bool = True):
        """Resume a run: params, EMA, optimizer state (Adam moments +
        MultiSteps counters + LR-schedule position), counters
        (trainers_ldm_cond.py:1826-1861)."""
        from flax import serialization

        data = restore_checkpoint(self.results_folder)
        if data is None:
            print("No checkpoint to resume from")
            return
        asarray = functools.partial(jax.tree_util.tree_map, jnp.asarray)
        self.state = self.state.replace(params=asarray(data["unet"]))
        if self.use_ema and data.get("ema") is not None:
            self.state = self.state.replace(ema_params=asarray(data["ema"]))
        if data.get("opt_state") is not None:
            opt_state = serialization.from_state_dict(
                self.state.opt_state, data["opt_state"]
            )
            self.state = self.state.replace(opt_state=asarray(opt_state))
            print("Restored optimizer state")
        if data.get("state_step") is not None:
            self.state = self.state.replace(
                step=jnp.asarray(int(data["state_step"]), jnp.int32)
            )
        if load_vae:
            self.frozen = {
                "seg_vae": asarray(data["vae_semseg"]),
                "sd_vae": asarray(data["vae_image"]),
            }
        self.best_pq = float(data.get("best_pq", 0.0) or 0.0)
        self.start_epoch = int(data["epoch"]) + 1
        # restore the saved trainer-side counter exactly (the reference
        # restores its saved counter too, trainers_ldm_cond.py:1848-1849);
        # recomputing from epoch*iters would silently shift the vis/eval
        # cadence if dataset size / batch / accumulate changed between
        # save and resume. Old checkpoints without "step" fall back.
        if data.get("step") is not None:
            self.step = int(data["step"])
        else:
            self.step = (int(data["epoch"]) + 1) * self.num_iters_per_epoch + 1
        print(f"Resumed from epoch {data['epoch']} (step {self.step})")

    def load(self, model_path: Optional[str] = None, load_vae: bool = True):
        """Cross-stage / pretrained loader; accepts reference .pt checkpoints."""
        if model_path is None or not os.path.exists(model_path):
            return
        if model_path.endswith(".pt"):
            data = load_torch_checkpoint(model_path)
            converted = convert_sd_unet(data["unet"], self.unet_cfg)
            self.state = self.state.replace(
                params=jax.tree_util.tree_map(jnp.asarray, converted)
            )
            if load_vae and "vae_semseg" in data:
                self.frozen["seg_vae"] = jax.tree_util.tree_map(
                    jnp.asarray, convert_seg_vae(data["vae_semseg"], self.vae_cfg)
                )
            print(f"Loaded reference checkpoint {model_path}")
        else:
            data = restore_checkpoint(
                os.path.dirname(model_path), name=os.path.basename(model_path)
            )
            asarray = functools.partial(jax.tree_util.tree_map, jnp.asarray)
            self.state = self.state.replace(params=asarray(data["unet"]))
            if load_vae:
                self.frozen = {
                    "seg_vae": asarray(data["vae_semseg"]),
                    "sd_vae": asarray(data["vae_image"]),
                }
            print(f"Loaded checkpoint {model_path}")


def resize_nearest_to(arr: np.ndarray, size) -> np.ndarray:
    from PIL import Image

    return np.array(
        Image.fromarray(arr.astype(np.int32), mode="I").resize(
            (size[1], size[0]), Image.NEAREST
        )
    )
