"""Train-step tests: AE + LDM steps on an 8-device CPU mesh, freezing, EMA."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ldmseg_tpu.core import MeshSpec, make_mesh, batch_sharding, replicated_sharding
from ldmseg_tpu.diffusion import make_schedule
from ldmseg_tpu.losses import SegLossConfig
from ldmseg_tpu.models import SegVAE, SegVAEConfig
from ldmseg_tpu.models.unet import CondUNet, tiny_unet_config
from ldmseg_tpu.models.vae_sd import SDVAE, SDVAEConfig
from ldmseg_tpu.train import TrainState, OptimConfig, make_optimizer, make_lr_schedule
from ldmseg_tpu.train.optim import param_labels
from ldmseg_tpu.train.steps_ae import AEStepConfig, make_ae_train_step
from ldmseg_tpu.train.steps_ldm import LDMStepConfig, make_ldm_train_step


TINY_AE = SegVAEConfig(
    in_channels=7, int_channels=16, out_channels=16,
    block_out_channels=(8, 8, 8, 16), latent_channels=4, norm_num_groups=8,
    num_upscalers=1, upscale_channels=16,
)

TINY_SD = SDVAEConfig(
    block_out_channels=(8, 8, 8, 8), layers_per_block=1, norm_num_groups=4,
    dtype="float32",
)


def _ae_batch(rng, b=8, hw=32):
    semseg = rng.integers(0, 8, size=(b, hw, hw)).astype(np.int32)
    bits = ((semseg[..., None] >> np.arange(7)) % 2).astype(np.float32)
    return {
        "image_semseg": jnp.asarray(bits),
        "semseg": jnp.asarray(semseg),
        "image": jnp.asarray(rng.random((b, hw, hw, 3)).astype(np.float32)),
    }


def test_ae_compact_inputs_exact(cpu_devices):
    """AE train step: compact wire format (uint8 ids, no image_semseg)
    matches the fp32 batch up to float rounding (different XLA graphs;
    see test_compact_inputs_exact). The AE path has no /255 at all — the
    bit-encode itself is value-identical — but graph-level fusion
    differences still require a small tolerance with adamw; sgd keeps the
    one-step diff linear in the grad diff."""
    from ldmseg_tpu.data.encodings import encode_bitmap

    model = SegVAE(TINY_AE)
    rng = np.random.default_rng(5)
    b, hw = 8, 32
    semseg = rng.integers(0, 8, size=(b, hw, hw)).astype(np.uint8)
    bits = np.stack([
        encode_bitmap(s, n=7, fill_value=0.5, ignore_label=0)[0]
        for s in semseg
    ])
    full = {"image_semseg": jnp.asarray(bits),
            "semseg": jnp.asarray(semseg.astype(np.int32))}
    compact = {"semseg": jnp.asarray(semseg)}

    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, full["image_semseg"],
        rng=jax.random.PRNGKey(1),
    )

    def run(batch, compact_inputs):
        cfg = AEStepConfig(
            loss_cfg=SegLossConfig(num_points=64, num_classes=16, max_masks=8),
            w_kl=1e-6, compact_inputs=compact_inputs, bits_fill_value=0.5,
        )
        tx = make_optimizer(
            variables["params"],
            OptimConfig(name="sgd", momentum=0.0, lr=1e-3, clip_grad=3.0),
            make_lr_schedule("warmup", 1e-3, 100, warmup_iters=5),
        )
        state = TrainState.create(variables["params"], tx)
        step = jax.jit(make_ae_train_step(model, tx, cfg))
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        return float(metrics["loss"]), jax.device_get(state.params)

    loss_full, params_full = run(full, False)
    loss_c, params_c = run(compact, True)
    assert abs(loss_full - loss_c) < 1e-5, (loss_full, loss_c)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        params_full, params_c,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


def test_ae_train_step_runs_and_learns(cpu_devices):
    mesh = make_mesh(MeshSpec(data=8, fsdp=1))
    model = SegVAE(TINY_AE)
    rng = np.random.default_rng(0)
    batch = _ae_batch(rng)

    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch["image_semseg"],
        rng=jax.random.PRNGKey(1),
    )
    cfg = AEStepConfig(
        loss_cfg=SegLossConfig(num_points=64, num_classes=16, max_masks=8),
        w_kl=1e-6,
    )
    tx = make_optimizer(
        variables["params"],
        OptimConfig(lr=1e-3, clip_grad=3.0, weight_decay=0.01),
        make_lr_schedule("warmup", 1e-3, 100, warmup_iters=5),
    )
    state = TrainState.create(variables["params"], tx)
    step = jax.jit(
        make_ae_train_step(model, tx, cfg),
        in_shardings=(
            replicated_sharding(mesh),
            jax.tree_util.tree_map(lambda _: batch_sharding(mesh), batch),
            replicated_sharding(mesh),
        ),
    )
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 4
    assert losses[-1] < losses[0]  # same batch -> must overfit


def test_optimizer_freezing_and_labels():
    cfg = tiny_unet_config()
    unet = CondUNet(cfg)
    x = jnp.zeros((1, 16, 16, 8))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.array([1]))["params"]
    labels = param_labels(params, freeze_layers=("norm", "time_embedding"))
    flat = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(labels)
    }
    assert all(
        v == "frozen" for k, v in flat.items() if "time_embedding" in k
    )
    assert all(v == "frozen" for k, v in flat.items() if "/norm1']['scale" in k)
    assert any(v == "train" for v in flat.values())

    tx = make_optimizer(
        params,
        OptimConfig(lr=1e-3, freeze_layers=("norm", "time_embedding")),
        make_lr_schedule("constant", 1e-3, 10),
    )
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    upd_flat = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(updates)
    }
    for k, v in upd_flat.items():
        if "time_embedding" in k:
            assert float(jnp.abs(v).max()) == 0.0, k
        if k.endswith("['scale']"):
            assert float(jnp.abs(v).max()) == 0.0, k


def _ldm_batch(rng, b=8, hw=32):
    semseg = rng.integers(0, 8, size=(b, hw, hw)).astype(np.int32)
    bits = ((semseg[..., None] >> np.arange(7)) % 2).astype(np.float32)
    return {
        "image_semseg": jnp.asarray(bits),
        "semseg": jnp.asarray(semseg),
        "image": jnp.asarray(rng.random((b, hw, hw, 3)).astype(np.float32)),
        "mask": jnp.ones((b, hw, hw), jnp.int32),
        "inpainting_mask": jnp.asarray(
            (rng.random((b, 4, 4)) < 0.3).astype(np.int32)
        ),
    }


def test_ldm_train_step_full_featured(cpu_devices):
    """Exercises: self-conditioning, inpainting, SNR weights, OHEM, EMA, fsdp."""
    mesh = make_mesh(MeshSpec(data=4, fsdp=2))
    seg_vae = SegVAE(TINY_AE)
    sd_vae = SDVAE(TINY_SD)
    unet_cfg = tiny_unet_config(in_channels=8, cond_channels=4)
    unet = CondUNet(unet_cfg)

    rng = np.random.default_rng(0)
    batch = _ldm_batch(rng)

    seg_params = seg_vae.init(
        {"params": jax.random.PRNGKey(0)}, batch["image_semseg"],
        rng=jax.random.PRNGKey(1),
    )["params"]
    sd_params = sd_vae.init(
        {"params": jax.random.PRNGKey(2)}, batch["image"],
        rng=jax.random.PRNGKey(3),
    )["params"]
    x = jnp.zeros((8, 4, 4, 12))
    unet_params = unet.init(jax.random.PRNGKey(4), x, jnp.array([1]))["params"]

    sched = make_schedule(
        num_train_timesteps=100, beta_schedule="scaled_linear",
        beta_start=0.00085, beta_end=0.012, weight="max_clamp_snr", max_snr=2.0,
        clip_sample=False, set_alpha_to_one=False,
    )
    cfg = LDMStepConfig(
        self_condition=True, prob_inpainting=0.5, ohem_ratio=0.9,
        latent_size=4, use_ema=True, min_noise_level=10,
        rgb_noise_level=20, cond_noise_level=20,
        prob_train_on_pred=0.3, loss_type="smooth_l1",
    )
    tx = make_optimizer(
        unet_params,
        OptimConfig(lr=1e-4, clip_grad=1.0, weight_decay=0.05,
                    freeze_layers=("time_embedding",)),
        make_lr_schedule("cosine", 1e-4, 100, warmup_iters=10),
    )
    state = TrainState.create(unet_params, tx, ema=True)
    frozen = {"seg_vae": seg_params, "sd_vae": sd_params}

    step = jax.jit(make_ldm_train_step(unet, seg_vae, sd_vae, sched, tx, cfg))
    for i in range(2):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    assert int(state.step) == 2
    # ema differs from params but tracks them
    d = jax.tree_util.tree_map(
        lambda e, p: float(jnp.abs(e - p).max()), state.ema_params, state.params
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_zero1_gather_matches_unsharded(cpu_devices):
    """The explicit ZeRO-1 param gather (core/mesh.zero1_gather: all-gather
    fsdp-sharded params fwd, reduce-scatter grad cotangents bwd) is purely
    a layout choice: one train step on a data=4 x fsdp=2 mesh with sharded
    params/opt-state must produce the same loss and updated params as the
    unsharded step. Parity target: the reference's ZeRO-1
    (ldmseg/trainers/optim.py:40-49) is exact w.r.t. plain DDP too."""
    from ldmseg_tpu.core.mesh import shard_params_fsdp

    def run(mesh, fsdp_min_size=2 ** 8):
        seg_vae = SegVAE(TINY_AE)
        sd_vae = SDVAE(TINY_SD)
        unet = CondUNet(tiny_unet_config(in_channels=8, cond_channels=4))
        rng = np.random.default_rng(3)
        batch = _ldm_batch(rng)
        seg_params = seg_vae.init(
            {"params": jax.random.PRNGKey(0)}, batch["image_semseg"],
            rng=jax.random.PRNGKey(1),
        )["params"]
        sd_params = sd_vae.init(
            {"params": jax.random.PRNGKey(2)}, batch["image"],
            rng=jax.random.PRNGKey(3),
        )["params"]
        unet_params = unet.init(
            jax.random.PRNGKey(4), jnp.zeros((8, 4, 4, 12)), jnp.array([1])
        )["params"]
        sched = make_schedule(
            num_train_timesteps=100, beta_schedule="scaled_linear",
            beta_start=0.00085, beta_end=0.012, weight="max_clamp_snr",
            max_snr=2.0, clip_sample=False, set_alpha_to_one=False,
        )
        cfg = LDMStepConfig(self_condition=True, latent_size=4, use_ema=False)
        # sgd/momentum=0: the update is LINEAR in the gradient, so the only
        # zero1-vs-unsharded difference is fp32 reduction-order rounding
        # (~1e-7 on the grads -> ~1e-10 on params). One-step adam is
        # sign(g)*lr and flips on near-zero grads under a different
        # (reduce-scatter) summation order — 2*lr false diffs.
        tx = make_optimizer(
            unet_params, OptimConfig(name="sgd", momentum=0.0, lr=1e-3,
                                     clip_grad=1.0),
            make_lr_schedule("constant", 1e-3, 100),
        )
        state = TrainState.create(unet_params, tx, ema=False)
        frozen = {"seg_vae": seg_params, "sd_vae": sd_params}
        if mesh is not None:
            param_sh = shard_params_fsdp(state.params, mesh,
                                         min_size=fsdp_min_size)
            state = state.replace(
                params=jax.device_put(state.params, param_sh),
                opt_state=jax.device_put(
                    state.opt_state, replicated_sharding(mesh)),
            )
            frozen = jax.device_put(frozen, replicated_sharding(mesh))
            batch = jax.device_put(
                batch, jax.tree_util.tree_map(
                    lambda _: batch_sharding(mesh), batch))
        step = jax.jit(make_ldm_train_step(
            unet, seg_vae, sd_vae, sched, tx, cfg, mesh=mesh,
            fsdp_min_size=fsdp_min_size,
        ))
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(9))
        return float(metrics["loss"]), jax.device_get(state.params)

    loss_ref, params_ref = run(None)
    loss_z1, params_z1 = run(make_mesh(MeshSpec(data=4, fsdp=2)))
    assert abs(loss_ref - loss_z1) < 1e-5, (loss_ref, loss_z1)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        params_ref, params_z1,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


def test_compact_inputs_exact(cpu_devices):
    """The compact wire format (uint8 rgb + uint8 ids, no image_semseg;
    steps_ldm.decompress_batch) reproduces the fp32 batch: uint8->f32/255
    inverts the loader's /255 (values are k/255) and the on-device
    bit-encode equals the host encode_bitmap. Equality is up to float
    rounding only (the two programs are different XLA graphs — e.g. the
    /255 may lower as a reciprocal multiply — so inputs can differ by
    <=1 ulp); with a LINEAR optimizer (sgd, momentum 0) that bounds the
    one-step param diff at ~1e-7."""
    from ldmseg_tpu.data.encodings import encode_bitmap

    seg_vae = SegVAE(TINY_AE)
    sd_vae = SDVAE(TINY_SD)
    unet = CondUNet(tiny_unet_config(in_channels=8, cond_channels=4))
    rng = np.random.default_rng(7)
    b, hw = 8, 32
    semseg = rng.integers(0, 8, size=(b, hw, hw)).astype(np.uint8)
    img_u8 = rng.integers(0, 256, size=(b, hw, hw, 3)).astype(np.uint8)
    bits = np.stack([
        encode_bitmap(s, n=7, fill_value=0.5, ignore_label=0)[0]
        for s in semseg
    ])
    inp = (rng.random((b, 4, 4)) < 0.3)
    full = {
        "image_semseg": jnp.asarray(bits),
        "semseg": jnp.asarray(semseg.astype(np.int32)),
        "image": jnp.asarray(img_u8.astype(np.float32) / 255.0),
        "mask": jnp.ones((b, hw, hw), jnp.int32),
        "inpainting_mask": jnp.asarray(inp.astype(np.int32)),
    }
    compact = {
        "semseg": jnp.asarray(semseg),
        "image": jnp.asarray(img_u8),
        "mask": jnp.ones((b, hw, hw), jnp.uint8),
        "inpainting_mask": jnp.asarray(inp.astype(np.uint8)),
    }

    seg_params = seg_vae.init(
        {"params": jax.random.PRNGKey(0)}, full["image_semseg"],
        rng=jax.random.PRNGKey(1),
    )["params"]
    sd_params = sd_vae.init(
        {"params": jax.random.PRNGKey(2)}, full["image"],
        rng=jax.random.PRNGKey(3),
    )["params"]
    unet_params = unet.init(
        jax.random.PRNGKey(4), jnp.zeros((8, 4, 4, 12)), jnp.array([1])
    )["params"]
    sched = make_schedule(
        num_train_timesteps=100, beta_schedule="scaled_linear",
        beta_start=0.00085, beta_end=0.012, weight="max_clamp_snr",
        max_snr=2.0, clip_sample=False, set_alpha_to_one=False,
    )
    frozen = {"seg_vae": seg_params, "sd_vae": sd_params}

    def run(batch, compact_inputs):
        cfg = LDMStepConfig(
            self_condition=True, latent_size=4, use_ema=False,
            prob_inpainting=0.5, compact_inputs=compact_inputs,
            bits_fill_value=0.5,
        )
        tx = make_optimizer(
            unet_params, OptimConfig(name="sgd", momentum=0.0, lr=1e-3,
                                     clip_grad=1.0),
            make_lr_schedule("constant", 1e-3, 100),
        )
        state = TrainState.create(unet_params, tx, ema=False)
        step = jax.jit(make_ldm_train_step(unet, seg_vae, sd_vae, sched, tx, cfg))
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(11))
        return float(metrics["loss"]), jax.device_get(state.params)

    loss_full, params_full = run(full, False)
    loss_c, params_c = run(compact, True)
    assert abs(loss_full - loss_c) < 1e-5, (loss_full, loss_c)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        params_full, params_c,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


def _tiny_ldm_setup(rng_seed=0, accumulate=1, use_ema=True,
                    prob_inpainting=0.0, sched_kwargs=None):
    seg_vae = SegVAE(TINY_AE)
    sd_vae = SDVAE(TINY_SD)
    unet_cfg = tiny_unet_config(in_channels=8, cond_channels=4)
    unet = CondUNet(unet_cfg)
    rng = np.random.default_rng(rng_seed)
    batch = _ldm_batch(rng)
    seg_params = seg_vae.init(
        {"params": jax.random.PRNGKey(0)}, batch["image_semseg"],
        rng=jax.random.PRNGKey(1),
    )["params"]
    sd_params = sd_vae.init(
        {"params": jax.random.PRNGKey(2)}, batch["image"],
        rng=jax.random.PRNGKey(3),
    )["params"]
    x = jnp.zeros((8, 4, 4, 12))
    unet_params = unet.init(jax.random.PRNGKey(4), x, jnp.array([1]))["params"]
    sched = make_schedule(
        num_train_timesteps=100, beta_schedule="scaled_linear",
        beta_start=0.00085, beta_end=0.012, weight="max_clamp_snr",
        max_snr=2.0, clip_sample=False, set_alpha_to_one=False,
        **(sched_kwargs or {}),
    )
    cfg = LDMStepConfig(
        self_condition=True, latent_size=4, use_ema=use_ema,
        prob_inpainting=prob_inpainting,
    )
    tx = make_optimizer(
        unet_params,
        OptimConfig(lr=1e-3, clip_grad=1.0, accumulate=accumulate),
        make_lr_schedule("constant", 1e-3, 100),
    )
    state = TrainState.create(unet_params, tx, ema=use_ema)
    frozen = {"seg_vae": seg_params, "sd_vae": sd_params}
    step = jax.jit(make_ldm_train_step(unet, seg_vae, sd_vae, sched, tx, cfg))
    return seg_vae, sd_vae, unet, state, frozen, batch, step, cfg


def test_ema_and_schedule_advance_per_optimizer_step():
    """Under accumulate=2, EMA + LR-schedule position advance once per
    OPTIMIZER step, not per microbatch (ldm_cond.py:857-877)."""
    _, _, _, state, frozen, batch, step, _ = _tiny_ldm_setup(accumulate=2)

    def tree_max_diff(a, b):
        return max(
            jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                lambda x, y: float(jnp.abs(x - y).max()), a, b))
        )

    ema0 = jax.device_get(state.ema_params)
    # microbatch 1: accumulation only — params and EMA untouched
    state, _ = step(state, frozen, batch, jax.random.PRNGKey(7))
    assert int(state.opt_state.mini_step) == 1
    assert int(state.opt_state.gradient_step) == 0
    assert tree_max_diff(ema0, state.ema_params) == 0.0
    # microbatch 2: real optimizer step — EMA updated exactly once
    state, _ = step(state, frozen, batch, jax.random.PRNGKey(7))
    assert int(state.opt_state.mini_step) == 0
    assert int(state.opt_state.gradient_step) == 1
    assert tree_max_diff(ema0, state.ema_params) > 0.0
    # after 4 microbatches: 2 optimizer steps recorded (schedule position)
    state, _ = step(state, frozen, batch, jax.random.PRNGKey(7))
    state, _ = step(state, frozen, batch, jax.random.PRNGKey(7))
    assert int(state.opt_state.gradient_step) == 2
    assert int(state.step) == 4


def test_train_step_inpainting_paste_and_grid_latents():
    """aux pred_latents: paste of the original (mean) latents through the
    inpainting mask (ldm_cond.py:605-615); noisy_latents returned for the
    train grid."""
    from ldmseg_tpu.train.steps_ldm import make_encode_fns

    seg_vae, sd_vae, _, state, frozen, batch, step, cfg = _tiny_ldm_setup(
        prob_inpainting=1.0
    )
    batch = dict(batch)
    batch["inpainting_mask"] = jnp.ones_like(batch["inpainting_mask"])
    state2, metrics = step(state, frozen, batch, jax.random.PRNGKey(3))
    assert metrics["noisy_latents"].shape == metrics["pred_latents"].shape

    # with the mask active everywhere, pred_latents == scaled mean latents
    encode_seg, _ = make_encode_fns(seg_vae, sd_vae, cfg)
    _, latents_mean = jax.jit(encode_seg)(
        frozen["seg_vae"], batch["image_semseg"], jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(
        np.asarray(metrics["pred_latents"]), np.asarray(latents_mean),
        atol=1e-5,
    )
    # with the mask empty, the model prediction shows through
    batch["inpainting_mask"] = jnp.zeros_like(batch["inpainting_mask"])
    _, metrics0 = step(state2, frozen, batch, jax.random.PRNGKey(3))
    assert (
        np.abs(np.asarray(metrics0["pred_latents"]) - np.asarray(latents_mean))
        .max() > 1e-3
    )


def test_grad_accumulation_multisteps():
    model = SegVAE(TINY_AE)
    rng = np.random.default_rng(0)
    batch = _ae_batch(rng, b=2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, batch["image_semseg"],
        rng=jax.random.PRNGKey(1),
    )
    cfg = AEStepConfig(loss_cfg=SegLossConfig(num_points=32, num_classes=16,
                                              max_masks=4))
    tx = make_optimizer(
        variables["params"],
        OptimConfig(lr=1e-3, accumulate=2),
        make_lr_schedule("constant", 1e-3, 10),
    )
    state = TrainState.create(variables["params"], tx)
    step = jax.jit(make_ae_train_step(model, tx, cfg))
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    # first micro-step: no param update yet
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    p2 = jax.tree_util.tree_leaves(state.params)[0]
    assert np.abs(np.asarray(p2) - np.asarray(p0)).max() > 0


def test_constrain_batch_scoping(cpu_devices):
    """constrain_batch is identity outside dp_scope / on a 1x1 mesh, and
    pins the batch sharding over data x fsdp inside a multi-device scope
    (the mechanism behind the UNet's clean 8-device SPMD compile)."""
    from ldmseg_tpu.core.mesh import constrain_batch, dp_scope

    x = jnp.ones((8, 4))
    # outside any scope: identity (same object, not even a constraint op)
    assert constrain_batch(x) is x
    # 1-device scope: still identity
    mesh1 = make_mesh(MeshSpec(data=1, fsdp=1), devices=jax.devices()[:1])
    with dp_scope(mesh1):
        assert constrain_batch(x) is x

    mesh = make_mesh(MeshSpec(data=4, fsdp=2))

    @jax.jit
    def f(x):
        with dp_scope(mesh):
            return constrain_batch(x * 2.0)

    y = f(jax.device_put(x, batch_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(y), 2.0 * np.asarray(x))
    assert y.sharding.spec == P(("data", "fsdp"))


def test_fsdp_spec_prefers_output_dim(cpu_devices):
    """Parameter fsdp sharding picks the LAST divisible axis (output
    features): contraction-dim sharding makes SPMD want contraction-sharded
    activations and fall back to full rematerialization (see core/mesh)."""
    from ldmseg_tpu.core.mesh import _fsdp_spec

    assert _fsdp_spec((1280, 320), 2, min_size=0) == P(None, "fsdp")
    assert _fsdp_spec((3, 3, 320, 640), 2, min_size=0) == P(
        None, None, None, "fsdp")
    # odd last dim falls back to an earlier divisible axis
    assert _fsdp_spec((640, 7), 2, min_size=0) == P("fsdp", None)
    # too small or fsdp=1: replicated
    assert _fsdp_spec((16, 16), 2, min_size=2**16) == P()
    assert _fsdp_spec((1280, 320), 1, min_size=0) == P()
