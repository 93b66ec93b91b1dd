"""Trainer-level integration tests (tiny configs, bundled examples, CPU)."""

import os
import shutil

import jax
import numpy as np
import pytest

from ldmseg_tpu.core.mesh import MeshSpec, make_mesh
from ldmseg_tpu.data.coco import COCOExamples
from ldmseg_tpu.data.transforms import get_train_transforms, get_val_transforms
from ldmseg_tpu.models.unet import tiny_unet_config
from ldmseg_tpu.models.vae_sd import SDVAEConfig

REF_EXAMPLES = "/root/reference/data/examples/coco"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_EXAMPLES), reason="bundled examples unavailable"
)


def tiny_config(tmp_path, size=64):
    return {
        "name": "test",
        "wandb": False,
        "eval_only": False,
        "load_path": None,
        "pretrained_model_path": None,
        "image_scaling_factor": 0.18215,
        "shared_vae_encoder": False,
        "vae_model_kwargs": {
            "in_channels": 7, "int_channels": 16, "out_channels": 128,
            "block_out_channels": [8, 8, 8, 16], "latent_channels": 4,
            "num_latents": 2, "num_upscalers": 2, "upscale_channels": 16,
            "norm_num_groups": 8, "scaling_factor": 0.18215,
            "parametrization": "gaussian", "act_fn": "none",
            "clamp_output": False, "freeze_codebook": False,
            "num_mid_blocks": 0, "fuse_rgb": False, "resize_input": False,
            "skip_encoder": False, "pretrained_path": None,
        },
        "model_kwargs": {
            "in_channels": 8, "init_mode_seg": "copy",
            "init_mode_image": "zero", "cond_channels": 4,
            "separate_conv": False, "separate_encoder": False,
            "add_adaptor": False,
        },
        "noise_scheduler_kwargs": {
            "prediction_type": "epsilon", "beta_schedule": "scaled_linear",
            "num_train_timesteps": 100, "beta_start": 0.00085,
            "beta_end": 0.012, "clip_sample": False,
            "set_alpha_to_one": False, "weight": "max_clamp_snr",
            "max_snr": 2.0,
        },
        "train_kwargs": {
            "dropout": 0.0, "inpaint_mask_size": [8, 8],
            "type_mask": "ignore", "latent_mask": False,
            "encoding_mode": "bits", "image_descriptors": "remove",
            "caption_type": "none", "caption_dropout": 1.0,
            "prob_train_on_pred": 0.0, "prob_inpainting": 0.0,
            "min_noise_level": 0, "rgb_noise_level": 0,
            "cond_noise_level": 0, "self_condition": True,
            "sample_posterior": False, "sample_posterior_rgb": False,
            "remap_seg": True, "train_num_steps": 4, "batch_size": 4,
            "accumulate": 1, "num_workers": 0, "loss": "l2",
            "ohem_ratio": 1.0, "clip_grad": 1.0, "weight_dtype": "float32",
            "freeze_layers": ["time_embedding"],
        },
        "loss_weights": {"mask": 1.0, "ce": 1.0, "kl": 1e-6},
        "loss_kwargs": {
            "num_points": 64, "oversample_ratio": 3,
            "importance_sample_ratio": 0.75,
        },
        "sampling_kwargs": {"num_inference_steps": 2, "guidance_scale": 7.5,
                            "seed": 0},
        "eval_kwargs": {"mask_th": 0.5, "count_th": 16, "overlap_th": 0.5,
                        "batch_size": 4, "num_workers": 0, "vis_every": 1000,
                        "print_freq": 2},
        "optimizer_name": "adamw",
        "optimizer_kwargs": {"lr": 1e-4, "betas": [0.9, 0.999],
                             "weight_decay": 0.0, "weight_decay_norm": 0.0},
        "optimizer_backbone_multiplier": 1.0,
        "optimizer_save_optim": False,
        "ema_on": False,
        "ema_kwargs": {"decay": 0.999},
        "lr_scheduler_name": "warmup",
        "lr_scheduler_kwargs": {"final_lr": 0.0, "warmup_iters": 2},
        "transformation_kwargs": {
            "type": "crop_resize_pil", "size": size, "size_rgb": size,
            "max_size": size, "flip": True, "normalize": False,
            "normalize_params": {"mean": [0.485, 0.456, 0.406],
                                 "std": [0.229, 0.224, 0.225]},
        },
        "train_db_name": "examples", "val_db_name": "examples",
        "split": "train", "num_classes": 128, "num_bits": 7,
        "has_bg": False, "ignore_label": 0, "fill_value": 0.5,
        "inpainting_strength": 0.0, "data_dir": str(tmp_path),
    }


@pytest.fixture(scope="module")
def examples_root(tmp_path_factory):
    dst = tmp_path_factory.mktemp("ex")
    shutil.copytree(REF_EXAMPLES, dst / "coco", dirs_exist_ok=True)
    return str(dst / "coco")


def _datasets(examples_root, p):
    tf_t = get_train_transforms(p["transformation_kwargs"])
    tf_v = get_val_transforms(p["transformation_kwargs"])
    kw = dict(num_classes=128, fill_value=0.5, ignore_label=0)
    return (
        COCOExamples(examples_root, transform=tf_t, split="train", **kw),
        COCOExamples(examples_root, transform=tf_v, split="val", **kw),
    )


def test_head_dim_auto_resolution(tmp_path):
    """'auto' attention_head_dim = 128 for scratch runs (the measured +28%
    TPU-native split, BENCHMARKS.md round 3) but SD-v1 8-head split (None)
    when converted SD weights load — they were trained with 8 heads, and
    convert_sd_unet asserts the config matches."""
    from ldmseg_tpu.train.trainer_ldm import build_unet_config

    p = tiny_config(tmp_path)
    p["model_kwargs"]["attention_head_dim"] = "auto"
    assert build_unet_config(p).attention_head_dim == 128
    p["pretrained_model_path"] = "/some/sd-v1-4"
    assert build_unet_config(p).attention_head_dim is None
    p["model_kwargs"]["attention_head_dim"] = 160  # explicit wins
    assert build_unet_config(p).attention_head_dim == 160
    p["model_kwargs"]["attention_head_dim"] = None
    assert build_unet_config(p).attention_head_dim is None


def test_trainer_diffusion_smoke(tmp_path, examples_root):
    """TrainerDiffusion: init from scratch, train a few steps, sample + PQ."""
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion

    p = tiny_config(tmp_path)
    ds_t, ds_v = _datasets(examples_root, p)
    mesh = make_mesh(MeshSpec(data=4, fsdp=1), devices=jax.devices()[:4])
    trainer = TrainerDiffusion(
        p, mesh=mesh, results_folder=str(tmp_path / "run"),
        dataset_train=ds_t, dataset_val=ds_v,
        unet_cfg=tiny_unet_config(in_channels=8, cond_channels=4),
        sd_vae_cfg=SDVAEConfig(block_out_channels=(8, 8, 8, 8),
                               layers_per_block=1, norm_num_groups=4,
                               dtype="float32"),
    )
    # a couple of optimizer steps
    from ldmseg_tpu.utils.meters import AverageMeter, ProgressMeter

    losses = AverageMeter("Loss", ":.4e")
    progress = ProgressMeter(len(trainer.dl), [losses], prefix="t")
    trainer.train_single_epoch(0, losses, progress)
    assert trainer.step == len(trainer.dl)
    assert losses.avg > 0 and np.isfinite(losses.avg)

    # generative eval: 2-step DDIM -> decode -> postprocess -> PQ
    res = trainer.compute_pq(num_inference_steps=2, max_iter=0,
                             save_images=True)
    assert "PQ" in res["panoptic_seg"]
    assert os.path.exists(
        os.path.join(trainer.visualization_dir, "overview.png")
    )

    # checkpoint save + resume round trip
    trainer.save(epoch=0)
    step_before = int(trainer.state.step)
    trainer.resume(load_vae=True)
    assert trainer.start_epoch == 1

    # visualization studies
    trainer.visualize_noise_schedule()
    assert os.path.exists(
        os.path.join(trainer.visualization_dir, "noise_schedule.jpg")
    )
    trainer.visualize_noise(nrows=1, num_inference_steps=2)
    assert os.path.exists(
        os.path.join(trainer.visualization_dir, "noise_queries.jpg")
    )


def test_trainer_two_tier_eval_cadence(tmp_path, examples_root):
    """full_eval_every (VERDICT r4 next #2): intermediate evals run the
    cheap quick tier (1 seed x quick_eval_steps, logged under val_quick/,
    never selecting best_model); full protocol evals land on the
    full_eval_every grid and on the final epoch, and carry the per-seed
    observability stats (pred_segments / conf_mass / seg_mean_area,
    VERDICT r4 next #7)."""
    import json as _json

    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion

    p = tiny_config(tmp_path)
    p["train_kwargs"]["train_num_steps"] = 8  # len(dl)=4 -> 2 epochs
    p["eval_kwargs"].update(
        eval_every=1, full_eval_every=2, quick_eval_steps=2,
        initial_eval_iters=0, eval_seeds=[0, 1],
    )
    ds_t, ds_v = _datasets(examples_root, p)
    mesh = make_mesh(MeshSpec(data=4, fsdp=1), devices=jax.devices()[:4])
    trainer = TrainerDiffusion(
        p, mesh=mesh, results_folder=str(tmp_path / "run_tt"),
        dataset_train=ds_t, dataset_val=ds_v,
        unet_cfg=tiny_unet_config(in_channels=8, cond_channels=4),
        sd_vae_cfg=SDVAEConfig(block_out_channels=(8, 8, 8, 8),
                               layers_per_block=1, norm_num_groups=4,
                               dtype="float32"),
    )
    trainer.train_loop()
    rows = [_json.loads(l) for l in
            open(os.path.join(str(tmp_path / "run_tt"), "metrics.jsonl"))]
    quick = [r for r in rows if "val_quick/PQ" in r]
    full = [r for r in rows if "val/PQ" in r]
    # epoch 0 -> quick tier; epoch 1 (full_eval_every and last) -> full;
    # plus the initial (max_iter=0) and final train_loop evals -> full
    assert len(quick) == 1
    assert len(full) >= 2
    for r in full + quick:
        pref = "val_quick" if f"val_quick/PQ" in r else "val"
        assert f"{pref}/pred_segments" in r
        assert f"{pref}/conf_mass" in r
        assert f"{pref}/seg_mean_area" in r
    # quick tier ran a single seed -> no seed std; full ran 2 seeds
    assert not any("val_quick/PQ_seed_std" in r for r in quick)
    assert any("val/PQ_seed_std" in r for r in full)


def test_trainer_diffusion_inpainting_sampler(tmp_path, examples_root):
    """Inpainting inference: known latents pasted through the mask."""
    import jax.numpy as jnp

    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion

    p = tiny_config(tmp_path)
    ds_t, ds_v = _datasets(examples_root, p)
    mesh = make_mesh(MeshSpec(data=4, fsdp=1), devices=jax.devices()[:4])
    trainer = TrainerDiffusion(
        p, mesh=mesh, results_folder=str(tmp_path / "run2"),
        dataset_train=ds_t, dataset_val=ds_v,
        unet_cfg=tiny_unet_config(in_channels=8, cond_channels=4),
        sd_vae_cfg=SDVAEConfig(block_out_channels=(8, 8, 8, 8),
                               layers_per_block=1, norm_num_groups=4,
                               dtype="float32"),
    )
    lat = trainer.latent_size
    rgb_latents = jnp.ones((2, lat, lat, 4))
    known = jnp.full((2, lat, lat, 4), 0.5)
    mask = jnp.zeros((2, lat, lat)).at[:, : lat // 2].set(1)
    out = trainer.sample(
        rgb_latents, num_inference_steps=2,
        inpaint_mask=mask, known_latents=known,
    )
    out = np.asarray(out)
    np.testing.assert_allclose(out[:, : lat // 2], 0.5, atol=1e-5)
    assert np.abs(out[:, lat // 2:] - 0.5).max() > 1e-3


def test_trainer_sp_mesh_sampler_matches_flat_mesh(tmp_path, examples_root):
    """A trainer on an sp>1 mesh (spatially partitioned serving) samples and
    decodes to the same values as one on a flat mesh — the trainer wiring of
    sp_scope + spatial sharding constraints (train/trainer_ldm.py) on top of
    the kernel-level equality covered by tests/test_sp.py."""
    import jax.numpy as jnp

    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion

    outs = {}
    for name, spec, n_dev in (
        ("flat", MeshSpec(data=1, fsdp=1), 1),
        ("sp", MeshSpec(data=1, fsdp=1, sp=4), 4),
    ):
        p = tiny_config(tmp_path)
        ds_t, ds_v = _datasets(examples_root, p)
        mesh = make_mesh(spec, devices=jax.devices()[:n_dev])
        trainer = TrainerDiffusion(
            p, mesh=mesh, results_folder=str(tmp_path / f"run_sp_{name}"),
            dataset_train=ds_t, dataset_val=ds_v,
            unet_cfg=tiny_unet_config(in_channels=8, cond_channels=4),
            sd_vae_cfg=SDVAEConfig(block_out_channels=(8, 8, 8, 8),
                                   layers_per_block=1, norm_num_groups=4,
                                   dtype="float32"),
        )
        lat = trainer.latent_size
        rgb_latents = jnp.linspace(-1, 1, 2 * lat * lat * 4).reshape(
            (2, lat, lat, 4))
        latents = trainer.sample(rgb_latents, rng=jax.random.PRNGKey(3),
                                 num_inference_steps=2)
        logits = trainer.decode_latents(latents, return_logits=True)
        outs[name] = (np.asarray(latents), np.asarray(logits))

    np.testing.assert_allclose(outs["sp"][0], outs["flat"][0],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(outs["sp"][1], outs["flat"][1],
                               atol=2e-3, rtol=2e-3)


def test_trainer_sampler_knob_routes_to_dpm(tmp_path, examples_root):
    """sampling_kwargs.sampler='dpm++' routes the jitted sampler through
    diffusion/dpm.py (and unknown samplers are rejected at init)."""
    import jax.numpy as jnp

    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion

    p = tiny_config(tmp_path)
    p["sampling_kwargs"]["sampler"] = "dpm++"
    ds_t, ds_v = _datasets(examples_root, p)
    mesh = make_mesh(MeshSpec(data=4, fsdp=1), devices=jax.devices()[:4])
    trainer = TrainerDiffusion(
        p, mesh=mesh, results_folder=str(tmp_path / "run_dpm"),
        dataset_train=ds_t, dataset_val=ds_v,
        unet_cfg=tiny_unet_config(in_channels=8, cond_channels=4),
        sd_vae_cfg=SDVAEConfig(block_out_channels=(8, 8, 8, 8),
                               layers_per_block=1, norm_num_groups=4,
                               dtype="float32"),
    )
    assert trainer.sampler == "dpm++"
    lat = trainer.latent_size
    out = trainer.sample(jnp.ones((2, lat, lat, 4)), num_inference_steps=3)
    assert out.shape == (2, lat, lat, 4)
    assert bool(jnp.isfinite(out).all())

    p_bad = tiny_config(tmp_path)
    p_bad["sampling_kwargs"]["sampler"] = "euler"
    with pytest.raises(AssertionError):
        TrainerDiffusion(
            p_bad, mesh=mesh, results_folder=str(tmp_path / "run_bad"),
            dataset_train=ds_t, dataset_val=ds_v,
            unet_cfg=tiny_unet_config(in_channels=8, cond_channels=4),
            sd_vae_cfg=SDVAEConfig(block_out_channels=(8, 8, 8, 8),
                                   layers_per_block=1, norm_num_groups=4,
                                   dtype="float32"),
        )


def test_compute_pq_fresh_rng_per_batch_and_max_iter(tmp_path, examples_root):
    """Eval draws fresh noise per val batch (reference samples sequentially
    from one generator, ldm_cond.py:1088) and max_iter=N runs exactly N
    batches."""
    import jax.numpy as jnp

    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion

    p = tiny_config(tmp_path)
    ds_t, ds_v = _datasets(examples_root, p)
    mesh = make_mesh(MeshSpec(data=4, fsdp=1), devices=jax.devices()[:4])
    trainer = TrainerDiffusion(
        p, mesh=mesh, results_folder=str(tmp_path / "runq"),
        dataset_train=ds_t, dataset_val=ds_v,
        unet_cfg=tiny_unet_config(in_channels=8, cond_channels=4),
        sd_vae_cfg=SDVAEConfig(block_out_channels=(8, 8, 8, 8),
                               layers_per_block=1, norm_num_groups=4,
                               dtype="float32"),
    )
    seen = []

    def fake_sample(rgb_latents, rng=None, **kw):
        seen.append(np.asarray(rng))
        ls = trainer.latent_size
        return jnp.zeros((rgb_latents.shape[0], ls, ls, 4))

    trainer.sample = fake_sample
    trainer.compute_pq(num_inference_steps=2, max_iter=2)
    assert len(seen) == 2, len(seen)
    assert not np.array_equal(seen[0], seen[1])


def test_trainer_diffusion_resume_continues_identically(tmp_path, examples_root):
    """Resume restores the FULL optimization: Adam moments, schedule
    position, EMA and counters — N steps + save + resume + M steps must
    reproduce an unbroken N+M-step run exactly
    (reference parity: trainers_ldm_cond.py:1791-1861)."""
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.train.checkpoint import load_config_snapshot

    def build(folder, p):
        ds_t, ds_v = _datasets(examples_root, p)
        mesh = make_mesh(MeshSpec(data=4, fsdp=1), devices=jax.devices()[:4])
        return TrainerDiffusion(
            p, mesh=mesh, results_folder=folder,
            dataset_train=ds_t, dataset_val=ds_v,
            unet_cfg=tiny_unet_config(in_channels=8, cond_channels=4),
            sd_vae_cfg=SDVAEConfig(block_out_channels=(8, 8, 8, 8),
                                   layers_per_block=1, norm_num_groups=4,
                                   dtype="float32"),
        )

    def drive(trainer, db, n):
        out = []
        for _ in range(n):
            trainer.state, metrics = trainer._train_step(
                trainer.state, trainer.frozen, db, jax.random.PRNGKey(0)
            )
            out.append(float(metrics["loss"]))
        return out

    p = tiny_config(tmp_path)
    p["optimizer_save_optim"] = True
    p["ema_on"] = True
    # warmup schedule: LR changes every step, so a schedule reset would
    # visibly diverge the continued losses
    p["lr_scheduler_name"] = "warmup"

    # unbroken run: N + M steps on a fixed batch
    a = build(str(tmp_path / "run_a"), p)
    db = a._device_batch(next(iter(a.dl)))
    losses_unbroken = drive(a, db, 5)
    params_unbroken = jax.device_get(a.state.params)
    ema_unbroken = jax.device_get(a.state.ema_params)

    # broken run: N steps, save, resume in a FRESH trainer, M steps
    b = build(str(tmp_path / "run_b"), p)
    drive(b, db, 3)
    b.save(epoch=0)
    c = build(str(tmp_path / "run_b"), p)
    c.resume(load_vae=True)
    assert int(c.state.step) == 3
    losses_resumed = drive(c, db, 2)

    np.testing.assert_allclose(losses_resumed, losses_unbroken[3:], rtol=1e-6)
    for pu, pr in zip(
        jax.tree_util.tree_leaves(params_unbroken),
        jax.tree_util.tree_leaves(jax.device_get(c.state.params)),
    ):
        np.testing.assert_allclose(pu, pr, atol=1e-6)
    for eu, er in zip(
        jax.tree_util.tree_leaves(ema_unbroken),
        jax.tree_util.tree_leaves(jax.device_get(c.state.ema_params)),
    ):
        np.testing.assert_allclose(eu, er, atol=1e-6)

    # the config snapshot rides along with the checkpoint (ldm_cond.py:1810)
    snap = load_config_snapshot(str(tmp_path / "run_b"))
    assert snap is not None and snap["optimizer_save_optim"] is True


def test_trainer_resume_restores_saved_step_counter(tmp_path, examples_root):
    """resume() restores the SAVED trainer-side step counter, even when the
    batch size (hence num_iters_per_epoch) changed between save and resume
    — recomputing (epoch+1)*iters+1 would silently shift the vis/eval
    cadence and logged positions. Reference restores its saved counter:
    trainers_ldm_cond.py:1848-1849. The optax schedule position
    (state.step) is asserted restored exactly too."""
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion

    def build(folder, p):
        ds_t, ds_v = _datasets(examples_root, p)
        mesh = make_mesh(MeshSpec(data=1, fsdp=1), devices=jax.devices()[:1])
        return TrainerDiffusion(
            p, mesh=mesh, results_folder=folder,
            dataset_train=ds_t, dataset_val=ds_v,
            unet_cfg=tiny_unet_config(in_channels=8, cond_channels=4),
            sd_vae_cfg=SDVAEConfig(block_out_channels=(8, 8, 8, 8),
                                   layers_per_block=1, norm_num_groups=4,
                                   dtype="float32"),
        )

    p = tiny_config(tmp_path)
    p["optimizer_save_optim"] = True
    a = build(str(tmp_path / "run"), p)
    a.step = 7
    a.state = a.state.replace(step=a.state.step + 7)
    a.save(epoch=2)

    p2 = dict(p, train_kwargs=dict(p["train_kwargs"], batch_size=2))
    c = build(str(tmp_path / "run"), p2)
    assert c.num_iters_per_epoch != a.num_iters_per_epoch  # premise
    c.resume(load_vae=True)
    assert c.step == 7
    assert int(c.state.step) == 7
    assert c.start_epoch == 3


def test_trainer_diffusion_loads_stage1_orbax_checkpoint(
    tmp_path, examples_root
):
    """Two-stage handoff: a TrainerAE orbax checkpoint ({'params': ...})
    seeds the LDM's frozen seg-VAE via vae_model_kwargs.pretrained_path
    (reference: vae.py:116-121 loads the stage-1 .pt)."""
    import jax.numpy as jnp
    from ldmseg_tpu.models import SegVAE
    from ldmseg_tpu.train.checkpoint import save_checkpoint
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion, build_seg_vae_config

    p = tiny_config(tmp_path)
    vae_cfg = build_seg_vae_config(p)
    seg_vae = SegVAE(vae_cfg)
    k = jax.random.PRNGKey(7)
    size = p["transformation_kwargs"]["size"]
    ae_params = seg_vae.init(
        {"params": k}, jnp.zeros((1, size, size, vae_cfg.in_channels)), rng=k
    )["params"]
    stage1_dir = str(tmp_path / "stage1")
    save_checkpoint(stage1_dir, {"step": 1, "epoch": 0, "params": ae_params})

    p["vae_model_kwargs"]["pretrained_path"] = os.path.join(stage1_dir, "model")
    ds_t, ds_v = _datasets(examples_root, p)
    mesh = make_mesh(MeshSpec(data=4, fsdp=1), devices=jax.devices()[:4])
    trainer = TrainerDiffusion(
        p, mesh=mesh, results_folder=str(tmp_path / "run2"),
        dataset_train=ds_t, dataset_val=ds_v,
        unet_cfg=tiny_unet_config(in_channels=8, cond_channels=4),
        sd_vae_cfg=SDVAEConfig(block_out_channels=(8, 8, 8, 8),
                               layers_per_block=1, norm_num_groups=4,
                               dtype="float32"),
    )
    loaded = trainer.frozen["seg_vae"]
    ref_leaf = jax.tree_util.tree_leaves(ae_params)[0]
    got_leaf = jax.tree_util.tree_leaves(loaded)[0]
    np.testing.assert_allclose(np.asarray(got_leaf), np.asarray(ref_leaf))
