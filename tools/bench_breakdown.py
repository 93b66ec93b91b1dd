"""Per-component timing breakdown of the 50-step sampling pipeline on TPU.

Times (post-compile, median of N):
  * one UNet forward (the hot op: 860M params, bf16, 12-ch 64x64 input)
  * the full 50-step DDIM scan
  * SD-VAE encode at 512x512
  * seg-AE decode + argmax at 512x512

Run with LDMSEG_ATTENTION=flash|reference to A/B the Pallas kernel.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, *args, iters=5):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / iters


def jax_block(x):
    import jax

    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, x
    )


def main():
    import jax
    import jax.numpy as jnp

    from ldmseg_tpu.diffusion import make_schedule
    from ldmseg_tpu.diffusion.sampling import ddim_sample
    from ldmseg_tpu.models import SegVAE, SegVAEConfig
    from ldmseg_tpu.models.unet import CondUNet, UNetConfig
    from ldmseg_tpu.models.vae_sd import SDVAE, SDVAEConfig

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    size = int(os.environ.get("BENCH_IMAGE_SIZE", "512"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    latent = size // 8

    unet = CondUNet(UNetConfig(in_channels=8, cond_channels=4, out_channels=4,
                               use_cross_attention=False, dtype="bfloat16"))
    seg = SegVAE(SegVAEConfig(num_upscalers=2, dtype="bfloat16"))
    sd = SDVAE(SDVAEConfig(dtype="bfloat16"))

    k = jax.random.PRNGKey(0)
    uparams = unet.init(k, jnp.zeros((1, latent, latent, 12)), jnp.array([1]))["params"]
    sparams = seg.init({"params": k}, jnp.zeros((1, size, size, 7)), rng=k)["params"]
    vparams = sd.init({"params": k}, jnp.zeros((1, 64, 64, 3)), rng=k)["params"]
    sched = make_schedule(num_train_timesteps=1000, beta_schedule="scaled_linear",
                          beta_start=0.00085, beta_end=0.012, clip_sample=False,
                          set_alpha_to_one=False)

    x_lat = jnp.zeros((batch, latent, latent, 12), jnp.bfloat16)
    rgb = jnp.zeros((batch, size, size, 3), jnp.float32)
    lat4 = jnp.zeros((batch, latent, latent, 4), jnp.float32)

    unet_fwd = jax.jit(lambda p, x, t: unet.apply({"params": p}, x, t))
    encode = jax.jit(lambda p, x: sd.apply(
        {"params": p}, 2.0 * x - 1.0, None, False,
        method=lambda m, a, r, sp: m.encode(a, r, sample_posterior=sp))[1])
    decode = jax.jit(lambda p, z: jnp.argmax(seg.apply(
        {"params": p}, z, True,
        method=lambda m, a, interp: m.decode(a, interpolate=interp)), -1))

    def scan_fn(p, rgb_lat, rng):
        return ddim_sample(
            lambda i, t, c: unet.apply({"params": p}, i, t, c),
            sched, rng, rgb_lat, num_inference_steps=steps, self_condition=True,
        )

    scan = jax.jit(scan_fn)

    def retry(f, *a, **kw):
        for attempt in range(3):
            try:
                return f(*a, **kw)
            except Exception as e:  # transient remote-compile drops
                print(f"# retry {attempt}: {type(e).__name__}: {e}",
                      file=sys.stderr)
        return float("nan")

    results = {
        "attention": os.environ.get("LDMSEG_ATTENTION", "auto"),
        "batch": batch,
    }
    results["unet_forward_ms"] = round(
        1e3 * retry(timed, unet_fwd, uparams, x_lat, jnp.array([500])), 2)
    print("# unet_forward_ms:", results["unet_forward_ms"], flush=True)
    results["sd_encode_ms"] = round(1e3 * retry(timed, encode, vparams, rgb), 2)
    print("# sd_encode_ms:", results["sd_encode_ms"], flush=True)
    results["seg_decode_argmax_ms"] = round(
        1e3 * retry(timed, decode, sparams, lat4), 2)
    print("# seg_decode_argmax_ms:", results["seg_decode_argmax_ms"], flush=True)
    results["ddim50_scan_s"] = round(
        retry(timed, scan, uparams, lat4, jax.random.PRNGKey(0), iters=2), 3)
    results["imgs_per_s_scan_only"] = round(batch / results["ddim50_scan_s"], 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
