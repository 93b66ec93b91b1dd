"""Benchmark: 50-step DDIM panoptic sampling throughput (images/sec/chip).

Measures the full generative-eval pipeline of BASELINE config 2/3 on one
chip: SD-VAE encode of 512x512 RGB -> 50 conditional UNet denoising steps
(self-conditioning, 12-channel input, one fused lax.scan) -> seg-AE decode
to 128-way logits at 512x512 -> on-device argmax.

Baseline: the reference has no published throughput (SURVEY §6); the north
star is >=4x an H100 running the PyTorch reference. Estimated reference
H100 rate for this pipeline (fp16, batched, 50 DDIM steps of an 860M-param
UNet at 64x64 latents + AE decode): ~2.0 images/sec/chip, so the target is
8.0 images/sec/chip. vs_baseline reports measured / 8.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

H100_ESTIMATE_IMG_PER_S = 2.0
TARGET = 4.0 * H100_ESTIMATE_IMG_PER_S


def main():
    import jax
    import jax.numpy as jnp

    from ldmseg_tpu.diffusion import make_schedule
    from ldmseg_tpu.diffusion.sampling import ddim_sample
    from ldmseg_tpu.models import SegVAE, SegVAEConfig
    from ldmseg_tpu.models.unet import CondUNet, UNetConfig
    from ldmseg_tpu.models.vae_sd import SDVAE, SDVAEConfig

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", "512"))
    latent = image_size // 8

    unet_cfg = UNetConfig(in_channels=8, cond_channels=4, out_channels=4,
                          use_cross_attention=False, dtype="bfloat16")
    seg_cfg = SegVAEConfig(num_upscalers=2, dtype="bfloat16")
    sd_cfg = SDVAEConfig(dtype="bfloat16")
    unet, seg_vae, sd_vae = CondUNet(unet_cfg), SegVAE(seg_cfg), SDVAE(sd_cfg)

    k = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    unet_params = unet.init(
        k1, jnp.zeros((1, latent, latent, 12)), jnp.array([1])
    )["params"]
    seg_params = seg_vae.init(
        {"params": k2}, jnp.zeros((1, image_size, image_size, 7)), rng=k2
    )["params"]
    sd_params = sd_vae.init(
        {"params": k3}, jnp.zeros((1, 64, 64, 3)), rng=k3
    )["params"]
    sched = make_schedule(
        num_train_timesteps=1000, beta_schedule="scaled_linear",
        beta_start=0.00085, beta_end=0.012, clip_sample=False,
        set_alpha_to_one=False,
    )

    def pipeline(params, rgb01, rng):
        x = 2.0 * rgb01 - 1.0
        _, rgb_lat, _ = sd_vae.apply(
            {"params": params["sd"]}, x, None, False,
            method=lambda m, a, r, sp: m.encode(a, r, sample_posterior=sp),
        )
        rgb_lat = rgb_lat * 0.18215

        def denoise(inputs, t, ctx):
            return unet.apply({"params": params["unet"]}, inputs, t, ctx)

        latents = ddim_sample(
            denoise, sched, rng, rgb_lat,
            num_inference_steps=steps, self_condition=True,
        )
        logits = seg_vae.apply(
            {"params": params["seg"]}, latents / seg_cfg.scaling_factor, True,
            method=lambda m, a, interp: m.decode(a, interpolate=interp),
        )
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # params as explicit jit args (closure capture would bake ~3.4GB of
    # constants into the program and re-ship them per compile)
    params = jax.device_put(
        {"unet": unet_params, "sd": sd_params, "seg": seg_params}
    )
    fn = jax.jit(pipeline, donate_argnums=())
    rgb = jax.random.uniform(k4, (batch, image_size, image_size, 3))

    # compile + warmup
    out = fn(params, rgb, jax.random.PRNGKey(1))
    out.block_until_ready()

    iters = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(params, rgb, jax.random.PRNGKey(2 + i))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    n_chips = max(len(jax.devices()), 1)
    images_per_sec_per_chip = batch * iters / dt / n_chips
    print(json.dumps({
        "metric": "ddim50_panoptic_sampling_throughput",
        "value": round(images_per_sec_per_chip, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec_per_chip / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
