"""Stage-1 trainer: shallow panoptic auto-encoder.

Orchestration equivalent of the reference TrainerAE
(ldmseg/trainers/trainers_ae.py) — composed, not inherited, from the data
module (SURVEY §1 structural-quirk note). Owns: datasets/loaders, optimizer
and LR schedule, the jitted train step, mIoU + class-agnostic PQ eval,
checkpoint save/resume/load and visualization dumps.
"""

from __future__ import annotations

import math
import os
import time
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ldmseg_tpu.core.mesh import batch_sharding, make_mesh, replicated_sharding
from ldmseg_tpu.data.coco import get_dataset
from ldmseg_tpu.data.loader import DataLoader
from ldmseg_tpu.data.transforms import get_train_transforms, get_val_transforms
from ldmseg_tpu.eval import PanopticEvaluator, SemsegMeter
from ldmseg_tpu.eval.postprocess import postprocess_image
from ldmseg_tpu.losses import SegLossConfig
from ldmseg_tpu.models import SegVAE, SegVAEConfig
from ldmseg_tpu.models.convert import convert_seg_vae
from ldmseg_tpu.models.layers import resize_bilinear
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
from ldmseg_tpu.train.steps_ae import AEStepConfig, make_ae_train_step
from ldmseg_tpu.train.steps_ldm import (
    compact_transfer_enabled, pack_compact_host_batch,
)
from ldmseg_tpu.utils.meters import AverageMeter, ProgressMeter
from ldmseg_tpu.utils.metrics_logger import (
    MetricsLogger, ProfilerHook, host_rss_gb, trim_host_heap,
)
from ldmseg_tpu.utils.visualize import colorize_ids, make_row, stack_rows, write_image


def build_seg_vae_config(p: Dict[str, Any]) -> SegVAEConfig:
    kw = dict(p["vae_model_kwargs"])
    kw.pop("pretrained_path", None)
    kw["block_out_channels"] = tuple(kw.get("block_out_channels", (32, 64, 128, 256)))
    kw.setdefault("in_channels", p.get("num_bits", 7))
    return SegVAEConfig(**kw)


class TrainerAE:
    def __init__(
        self,
        p: Dict[str, Any],
        mesh=None,
        results_folder: str = "./results",
        dataset_train=None,
        dataset_val=None,
        seed: int = 0,
    ):
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

        tk = p["train_kwargs"]
        ek = p["eval_kwargs"]
        self.batch_size = tk["batch_size"]
        n_dev = self.mesh.devices.size
        assert self.batch_size % n_dev == 0, (
            f"batch_size {self.batch_size} must be divisible by the mesh "
            f"size {n_dev} (shard the batch over data x fsdp axes)"
        )
        self.accumulate = tk.get("accumulate", 1)
        self.train_num_steps = tk["train_num_steps"]
        self.print_freq = ek.get("print_freq", 100)
        self.save_and_sample_every = ek.get("vis_every", 1000)
        self.mask_th = ek["mask_th"]
        self.count_th = ek["count_th"]
        self.overlap_th = ek["overlap_th"]
        self.image_size = p["transformation_kwargs"]["size"]
        self.ignore_label = p.get("ignore_label", 0)
        self.num_classes = p.get("num_classes", 128)

        # model
        self.vae_cfg = build_seg_vae_config(p)
        self.model = SegVAE(self.vae_cfg)
        self.latent_size = self.image_size // self.vae_cfg.downsample_factor

        # shared SD-VAE encoder option (tools/main_ae.py:140-143): the frozen
        # SD encoder produces the moments (requires a 3-channel seg encoding)
        self.shared_encoder = None
        self.frozen = None
        if p.get("shared_vae_encoder"):
            from ldmseg_tpu.models.vae_sd import SDVAE, SDVAEConfig

            sd_cfg = SDVAEConfig(
                scaling_factor=p.get("image_scaling_factor", 0.18215),
                dtype=tk.get("weight_dtype", "float32"),
            )
            self.sd_vae = SDVAE(sd_cfg)
            k_sd, self.rng = jax.random.split(self.rng)
            sd_params = self.sd_vae.init(
                {"params": k_sd}, jnp.zeros((1, 64, 64, 3)), rng=k_sd
            )["params"]
            pm_path = p.get("pretrained_model_path")
            if pm_path and os.path.isdir(pm_path):
                from ldmseg_tpu.models.convert import convert_sd_vae
                from ldmseg_tpu.models.sd_weights import load_diffusers_state

                state = load_diffusers_state(os.path.join(pm_path, "vae"))
                if state is not None:
                    sd_params = jax.tree_util.tree_map(
                        jnp.asarray, convert_sd_vae(state)
                    )
                    print("Loaded SD VAE encoder for shared-encoder AE")
            self.frozen = {"sd_vae": sd_params}
            self.shared_encoder = (self.sd_vae, "sd_vae")

        # data
        t_train = get_train_transforms(p["transformation_kwargs"])
        t_val = get_val_transforms(p["transformation_kwargs"])
        ds_kwargs = dict(
            remap_labels=tk.get("remap_seg", True),
            deterministic_remap=tk.get("deterministic_remap", False),
            encoding_mode=tk.get("encoding_mode", "bits"),
            num_classes=self.num_classes,
            fill_value=p.get("fill_value", 0.5),
            ignore_label=self.ignore_label,
            inpainting_strength=p.get("inpainting_strength", 0.0),
            decode_cache=p.get("decode_cache", 0),
            holdout=p.get("holdout", 0),
            synthetic_categories=p.get("synthetic_categories", 0),
        )
        self.ds = (
            dataset_train
            if dataset_train is not None
            else get_dataset(p["train_db_name"], p["data_dir"], p["split"],
                             transform=t_train, **ds_kwargs)
        )
        self.ds_val = (
            dataset_val
            if dataset_val is not None
            else get_dataset(p["val_db_name"], p["data_dir"], "val",
                             transform=t_val, **ds_kwargs)
        )
        self.dl = DataLoader(
            self.ds, self.batch_size, shuffle=True, drop_last=True, seed=seed,
            process_index=jax.process_index(), process_count=jax.process_count(),
            num_threads=tk.get("num_workers", 0),
        )
        self.dl_val = DataLoader(
            self.ds_val, min(ek.get("batch_size", self.batch_size), self.batch_size),
            shuffle=False, drop_last=False, seed=seed,
            process_index=jax.process_index(), process_count=jax.process_count(),
            num_threads=ek.get("num_workers", 0),
        )

        # schedule bookkeeping (reference trainers_ae.py:176-183)
        self.num_iters_per_epoch = math.ceil(len(self.dl) / self.accumulate)
        self.epochs = math.ceil(self.train_num_steps / self.num_iters_per_epoch)
        self.total_iters = self.epochs * self.num_iters_per_epoch
        self.start_epoch = 0
        self.step = 0

        # optimizer + lr schedule
        ok = p["optimizer_kwargs"]
        lr_kwargs = p.get("lr_scheduler_kwargs", {})
        self.lr_schedule = make_lr_schedule(
            p.get("lr_scheduler_name", "constant"),
            ok["lr"], self.total_iters,
            final_lr=lr_kwargs.get("final_lr", 0.0),
            warmup_iters=lr_kwargs.get("warmup_iters", 0),
        )
        self.optim_cfg = OptimConfig(
            name=p.get("optimizer_name", "adamw"),
            lr=ok["lr"],
            betas=tuple(ok.get("betas", (0.9, 0.999))),
            weight_decay=ok.get("weight_decay", 0.0),
            weight_decay_norm=ok.get("weight_decay_norm", 0.0),
            clip_grad=tk.get("clip_grad", 0.0),
            accumulate=self.accumulate,
        )

        # init params + state
        init_rng, self.rng = jax.random.split(self.rng)
        dummy = jnp.zeros(
            (1, self.image_size, self.image_size, self.vae_cfg.encoder_in_channels)
        )
        params = self.model.init(
            {"params": init_rng},
            dummy[..., : self.vae_cfg.in_channels],
            rng=init_rng,
            rgb_sample=dummy[..., :3] if self.vae_cfg.fuse_rgb else None,
        )["params"]
        pretrained = p["vae_model_kwargs"].get("pretrained_path")
        if pretrained:
            params = self._load_pretrained_params(pretrained, params)
        self.tx = make_optimizer(params, self.optim_cfg, self.lr_schedule)
        self.state = TrainState.create(params, self.tx)

        # jitted steps
        self._compact_transfer = compact_transfer_enabled(p)
        self.step_cfg = AEStepConfig(
            loss_cfg=SegLossConfig(
                ignore_label=self.ignore_label,
                num_classes=self.num_classes,
                **{k: v for k, v in p.get("loss_kwargs", {}).items()
                   if k in ("num_points", "oversample_ratio",
                            "importance_sample_ratio", "temperature",
                            "cost_mask", "cost_class")},
            ),
            w_ce=p["loss_weights"]["ce"],
            w_mask=p["loss_weights"]["mask"],
            w_kl=p["loss_weights"]["kl"],
            prob_inpainting=tk.get("prob_inpainting", 0.0),
            do_matching=p.get("loss_kwargs", {}).get("do_matching", False),
            latent_mask=tk.get("latent_mask", False),
            fuse_rgb=self.vae_cfg.fuse_rgb,
            ignore_label=self.ignore_label,
            downsample_factor=self.vae_cfg.downsample_factor,
            # compact wire format (steps_ldm.decompress_batch): exact only
            # for bits encoding on unnormalized images — see trainer_ldm
            compact_inputs=self._compact_transfer,
            num_bits=p.get("num_bits", 7),
            bits_fill_value=p.get("fill_value", 0.5),
        )
        bs = batch_sharding(self.mesh)
        rs = replicated_sharding(self.mesh)
        self._train_step = jax.jit(
            make_ae_train_step(self.model, self.tx, self.step_cfg,
                               external_encoder=self.shared_encoder),
            donate_argnums=(0,),
        )
        self._eval_forward = jax.jit(self._eval_forward_impl)
        self._batch_sharding = bs

    # ------------------------------------------------------------------
    def _load_pretrained_params(self, path: str, params):
        data = load_torch_checkpoint(path)
        converted = convert_seg_vae(data["vae"], self.vae_cfg)
        print(f"Loaded pretrained seg-AE from {path}")
        return jax.tree_util.tree_map(jnp.asarray, converted)

    def _device_batch(self, batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        keys = ["image_semseg", "semseg"]
        if self.vae_cfg.fuse_rgb:
            keys.append("image")
        host = {k: np.asarray(batch[k]) for k in keys}
        if self._compact_transfer:
            # uint8 wire format; the step re-derives the full batch on
            # device (steps_ldm.decompress_batch)
            host = pack_compact_host_batch(host)
        return {
            k: jax.device_put(jnp.asarray(v), self._batch_sharding)
            for k, v in host.items()
        }

    def _eval_forward_impl(self, params, images, rgbs):
        x = 2.0 * images - 1.0
        if self.shared_encoder is not None:
            sd_vae, key = self.shared_encoder
            moments = sd_vae.apply(
                {"params": self.frozen[key]}, x,
                method=lambda m, a: m.encode_moments(a),
            )
            z, mode, kl = self.model.apply(
                {"params": params}, moments, None, False,
                method=lambda m, mo, r, sp: m.bottleneck(mo, r, sample_posterior=sp),
            )
            return self.model.apply(
                {"params": params}, mode, False,
                method=lambda m, a, interp: m.decode(a, interpolate=interp),
            )
        rgb = 2.0 * rgbs - 1.0 if self.vae_cfg.fuse_rgb else None
        logits, z, kl = self.model.apply(
            {"params": params}, x, rng=None, sample_posterior=False,
            rgb_sample=rgb,
        )
        return logits

    # ------------------------------------------------------------------
    def train_single_epoch(self, epoch: int, meters: Dict[str, AverageMeter],
                           progress: ProgressMeter):
        # metrics stay device arrays between flushes: float() forces a host
        # sync (expensive through the tunnel), so meters are updated in bulk
        # every print_freq batches and at epoch end — every batch is counted
        pending = []
        n_batches = len(self.dl)
        for batch_idx, batch in enumerate(self.dl):
            db = self._device_batch(batch)
            self.state, metrics = self._train_step(
                self.state, db, jax.random.PRNGKey(self.seed), self.frozen
            )
            if (batch_idx + 1) % self.accumulate == 0 or batch_idx + 1 == n_batches:
                self.step += 1
            self.profiler.step(self.step)
            pending.append(metrics)
            if (batch_idx + 1) % self.print_freq == 0 or batch_idx + 1 == n_batches:
                for m in pending:
                    for name, meter in meters.items():
                        meter.update(float(m[name]), self.batch_size)
                if (batch_idx + 1) % self.print_freq == 0:
                    progress.display(batch_idx)
                self.metrics_logger.log(
                    dict(
                        {k: float(pending[-1][k]) for k in
                         ("loss", "ce", "mask", "kl", "grad_norm")},
                        rss_gb=host_rss_gb(),
                    ),
                    step=self.step,
                )
                pending.clear()
            if self.check_iter(batch_idx, epoch):
                self.save_train_images(db, batch)

    def train_loop(self):
        start = time.time()
        self.compute_metrics(["miou", "pq"], threshold_output=True, save_images=True)
        eval_every = self.p["eval_kwargs"].get("eval_every", 1)
        # train_kwargs.save_every (epochs) spaces out checkpoint saves for
        # short epochs (per-epoch is reference behavior and the default)
        save_every = self.p["train_kwargs"].get("save_every", 1)
        for epoch in range(self.start_epoch, self.epochs):
            print(f"Starting epoch {epoch}")
            meters = {k: AverageMeter(k, ":.4e") for k in ("loss", "ce", "mask", "kl")}
            progress = ProgressMeter(
                len(self.dl), list(meters.values()), prefix=f"Epoch: [{epoch}]"
            )
            self.dl.set_epoch(epoch)
            t0 = time.time()
            self.train_single_epoch(epoch, meters, progress)
            if jax.process_index() == 0 and (
                (epoch + 1) % save_every == 0 or epoch == self.epochs - 1
            ):
                self.save(epoch)
            # eval cadence: per-epoch by default (reference behavior);
            # eval_kwargs.eval_every for tiny datasets with short epochs
            if (epoch + 1) % eval_every == 0 or epoch == self.epochs - 1:
                self.compute_metrics(["miou", "pq"], threshold_output=True,
                                     save_images=True)
            print(f"Epoch {epoch} took {time.time() - t0:.1f}s "
                  f"(avg loss {meters['loss'].avg:.4e})")
        self.compute_metrics(["miou", "pq"], threshold_output=True, save_images=True)
        finalize_pending_saves()  # async saves durable before we return
        print(f"Finished in {time.time() - start:.1f}s")

    def check_iter(self, batch_idx: int, epoch: int) -> bool:
        return (self.step != 0 and self.step % self.save_and_sample_every == 0) or (
            epoch == self.epochs - 1 and batch_idx == len(self.dl) - 1
        )

    # -- eval -----------------------------------------------------------
    def compute_metrics(self, names: Union[List[str], str] = ("miou",),
                        threshold_output: bool = False, save_images: bool = False,
                        max_iter: Optional[int] = None):
        if isinstance(names, str):
            names = [names]
        results = {}
        for name in names:
            if name.lower() == "miou":
                results["miou"] = self.compute_miou(
                    threshold_output=threshold_output, save_images=save_images,
                    max_iter=max_iter,
                )
            elif name.lower() == "pq":
                results["pq"] = self.compute_pq(
                    threshold_output=threshold_output, save_images=save_images,
                    max_iter=max_iter,
                )
            else:
                raise NotImplementedError(name)
        trim_host_heap()  # eval device_gets GBs of logits; return freed pages
        return results

    def compute_miou(self, threshold_output=False, save_images=False,
                     max_iter=None):
        meter = SemsegMeter(
            self.num_classes, self.ds.get_class_names(), has_bg=False,
            ignore_index=self.ignore_label,
        )
        seen_ids = set()
        for batch_idx, batch in enumerate(self.dl_val):
            images = jnp.asarray(batch["image_semseg"])
            rgbs = jnp.asarray(batch["image"])
            logits = self._eval_forward(self.state.params, images, rgbs)
            h, w = batch["semseg"].shape[-2:]
            logits = resize_bilinear(logits, (h, w))
            preds = jnp.argmax(logits, axis=-1)
            if threshold_output:
                probs = jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)
                preds = jnp.where(probs < self.mask_th, self.ignore_label, preds)
            preds = np.asarray(preds)
            if save_images and batch_idx == 0 and jax.process_index() == 0:
                self._dump_val_grid(batch, preds)
            # loader repeat-pads partial batches AND wrap-pads the global
            # index space across processes: the is_padding flag marks every
            # non-canonical occurrence so each image is counted exactly once
            # ACROSS processes before synchronize_between_processes sums the
            # meters (ADVICE r4 #2; per-process seen_ids kept as a
            # belt-and-braces local dedup)
            keep = []
            for i, m in enumerate(batch["meta"]):
                if not m.get("is_padding") and m["image_id"] not in seen_ids:
                    seen_ids.add(m["image_id"])
                    keep.append(i)
            meter.update(preds[keep], np.asarray(batch["semseg"])[keep])
            if max_iter is not None and batch_idx >= max_iter:
                break
        meter.synchronize_between_processes()
        return meter.return_score(name="val set")

    def compute_pq(self, threshold_output=True, save_images=False, max_iter=None):
        evaluator = PanopticEvaluator(self.ds_val.meta_data, class_agnostic=True)
        for batch_idx, batch in enumerate(self.dl_val):
            images = jnp.asarray(batch["image_semseg"])
            rgbs = jnp.asarray(batch["image"])
            logits = self._eval_forward(self.state.params, images, rgbs)
            h, w = batch["semseg"].shape[-2:]
            logits = np.asarray(resize_bilinear(logits, (h, w)))
            file_names = [m["image_file"] for m in batch["meta"]]
            image_ids = [m["image_id"] for m in batch["meta"]]
            outputs = []
            for i in range(len(file_names)):
                pan, segs = postprocess_image(
                    logits[i], np.asarray(batch["mask"][i]),
                    batch["meta"][i]["im_size"],
                    mask_th=self.mask_th, count_th=self.count_th,
                    overlap_th=self.overlap_th, ignore_label=self.ignore_label,
                    threshold_output=threshold_output,
                )
                outputs.append({"panoptic_seg": (pan, segs)})
            evaluator.process(file_names, image_ids, outputs)
            if max_iter is not None and batch_idx >= max_iter:
                break
        return evaluator.evaluate()

    # -- io / viz --------------------------------------------------------
    def _dump_val_grid(self, batch, preds):
        n = min(8, preds.shape[0])
        rows = [
            make_row([batch["image"][i] for i in range(n)], self.image_size),
            make_row([colorize_ids(batch["semseg"][i]) for i in range(n)],
                     self.image_size),
            make_row([colorize_ids(preds[i]) for i in range(n)], self.image_size),
        ]
        write_image(stack_rows(rows), self.visualization_dir, "rgb_gt_pred_ae_val.jpg")

    def save_train_images(self, device_batch, batch):
        if jax.process_index() != 0:
            return
        # the compact wire format (loader.py) re-derives image_semseg on
        # device inside the train step, so it is absent from device_batch;
        # viz is rare — take the host copy from the raw batch instead
        logits = self._eval_forward(
            self.state.params, jnp.asarray(batch["image_semseg"]),
            jnp.asarray(batch["image"]),
        )
        h, w = batch["semseg"].shape[-2:]
        preds = np.asarray(jnp.argmax(resize_bilinear(logits, (h, w)), axis=-1))
        self._dump_val_grid(batch, preds)

    def save(self, epoch: int):
        """Save incl. optimizer state + config snapshot (trainers_ae.py:491-505)."""
        from flax import serialization

        payload = {
            "step": self.step,
            "state_step": int(jax.device_get(self.state.step)),
            "epoch": epoch,
            "params": jax.device_get(self.state.params),
            "opt_state": (
                serialization.to_state_dict(
                    jax.device_get(self.state.opt_state))
                if self.p.get("optimizer_save_optim", False) else None
            ),
        }
        save_checkpoint(self.results_folder, payload, config=self.p,
                        block=not self.p["train_kwargs"].get("async_save", False))
        # release the multi-GB host copy promptly (see trainer_ldm.save)
        del payload
        import gc

        gc.collect()
        trim_host_heap()
        self.metrics_logger.log({"save/rss_gb": host_rss_gb()}, step=self.step)
        print(f"Saved checkpoint at epoch {epoch}")

    def resume(self):
        """Resume params + optimizer state + counters (trainers_ae.py:507-530)."""
        from flax import serialization

        data = restore_checkpoint(self.results_folder)
        if data is None:
            print("No checkpoint to resume from")
            return
        self.state = self.state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, data["params"]),
            step=jnp.asarray(
                int(data.get("state_step", data["step"])), jnp.int32),
        )
        if data.get("opt_state") is not None:
            opt_state = serialization.from_state_dict(
                self.state.opt_state, data["opt_state"]
            )
            self.state = self.state.replace(
                opt_state=jax.tree_util.tree_map(jnp.asarray, opt_state)
            )
            print("Restored optimizer state")
        self.start_epoch = int(data["epoch"]) + 1
        # restore the saved counter exactly (see trainer_ldm.resume)
        if data.get("step") is not None:
            self.step = int(data["step"])
        else:
            self.step = int(data["epoch"] + 1) * self.num_iters_per_epoch + 1
        print(f"Resumed from epoch {data['epoch']} (step {self.step})")

    def load(self, model_path: Optional[str] = None):
        if model_path is None or not os.path.exists(model_path):
            return
        if model_path.endswith(".pt"):
            params = self._load_pretrained_params(model_path, self.state.params)
        else:
            params = jax.tree_util.tree_map(
                jnp.asarray, restore_checkpoint(os.path.dirname(model_path),
                                                name=os.path.basename(model_path))["params"]
            )
        self.state = self.state.replace(params=params)
