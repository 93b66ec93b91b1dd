"""LDM training-step throughput on one chip (SD-sized models, bf16).

Measures the full jitted train step of BASELINE config 5 on synthetic data:
frozen SD-VAE + seg-AE encodes at 512x512, self-conditioning double forward,
masked/SNR-weighted loss, adamw update with freezing. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    from ldmseg_tpu.core.config import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from ldmseg_tpu.diffusion import make_schedule
    from ldmseg_tpu.models import SegVAE, SegVAEConfig
    from ldmseg_tpu.models.unet import CondUNet, UNetConfig
    from ldmseg_tpu.models.vae_sd import SDVAE, SDVAEConfig
    from ldmseg_tpu.train import OptimConfig, TrainState, make_lr_schedule, make_optimizer
    from ldmseg_tpu.train.steps_ldm import LDMStepConfig, make_ldm_train_step

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    size = int(os.environ.get("BENCH_IMAGE_SIZE", "512"))
    remat = os.environ.get("BENCH_REMAT", "0") == "1"

    unet_cfg = UNetConfig(in_channels=8, cond_channels=4, out_channels=4,
                          use_cross_attention=False, dtype="bfloat16",
                          gradient_checkpointing=remat)
    seg_cfg = SegVAEConfig(num_upscalers=2, dtype="bfloat16")
    sd_cfg = SDVAEConfig(dtype="bfloat16")
    unet, seg_vae, sd_vae = CondUNet(unet_cfg), SegVAE(seg_cfg), SDVAE(sd_cfg)

    k = jax.random.PRNGKey(0)
    latent = size // 8
    uparams = unet.init(k, jnp.zeros((1, latent, latent, 12)), jnp.array([1]))["params"]
    sparams = seg_vae.init({"params": k}, jnp.zeros((1, size, size, 7)), rng=k)["params"]
    vparams = sd_vae.init({"params": k}, jnp.zeros((1, 64, 64, 3)), rng=k)["params"]
    sched = make_schedule(num_train_timesteps=1000, beta_schedule="scaled_linear",
                          beta_start=0.00085, beta_end=0.012, weight="max_clamp_snr",
                          max_snr=2.0, clip_sample=False, set_alpha_to_one=False)
    cfg = LDMStepConfig(self_condition=True, latent_size=latent,
                        type_mask="ignore")
    tx = make_optimizer(
        uparams,
        OptimConfig(lr=1e-4, clip_grad=1.0, weight_decay=0.05,
                    freeze_layers=("time_embedding",)),
        make_lr_schedule("cosine", 1e-4, 1000, warmup_iters=10),
    )
    state = TrainState.create(uparams, tx)
    frozen = {"seg_vae": sparams, "sd_vae": vparams}

    rng = np.random.default_rng(0)
    semseg = rng.integers(0, 128, (batch, size, size)).astype(np.int32)
    bits = ((semseg[..., None] >> np.arange(7)) % 2).astype(np.float32)
    data = {
        "image_semseg": jnp.asarray(bits),
        "semseg": jnp.asarray(semseg),
        "image": jnp.asarray(rng.random((batch, size, size, 3)), jnp.float32),
        "mask": jnp.ones((batch, size, size), jnp.int32),
    }

    step = jax.jit(make_ldm_train_step(unet, seg_vae, sd_vae, sched, tx, cfg),
                   donate_argnums=(0,))
    state, metrics = step(state, frozen, data, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics["loss"])

    iters = int(os.environ.get("BENCH_ITERS", "5"))
    t0 = time.perf_counter()
    losses = []
    for _ in range(iters):
        state, metrics = step(state, frozen, data, jax.random.PRNGKey(2))
        losses.append(metrics["loss"])
    # block on every step's loss, not just the last — see bench.py: the
    # tunneled backend once resolved a final handle before earlier
    # executions finished, yielding an impossible reading
    for loss in losses:
        jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "metric": "ldm_train_step_throughput",
        "batch": batch,
        "remat": remat,
        "step_s": round(dt, 4),
        "value": round(batch / dt, 3),
        "unit": "images/sec/chip",
    }))


if __name__ == "__main__":
    main()
