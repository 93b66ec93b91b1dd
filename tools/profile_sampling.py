"""Capture and summarize a jax.profiler trace of the sampling scan on TPU.

Writes the trace to PROFILE_DIR (default /tmp/ldmseg_profile) and, when
xprof/tensorboard_plugin_profile can parse it, prints the top self-time ops
— the roadmap input for kernel work (BENCHMARKS.md).
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def summarize(profile_dir: str, top: int = 25):
    """Best-effort op summary from the xplane proto."""
    planes = glob.glob(
        os.path.join(profile_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not planes:
        print("no xplane captured")
        return
    path = sorted(planes)[-1]
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [path], "op_profile", {}
        )
        print(data if isinstance(data, str) else data.decode()[:8000])
    except Exception as e:  # pragma: no cover
        print(f"xprof parse unavailable ({type(e).__name__}: {e}); "
              f"trace left at {path} for offline inspection")


def main():
    import jax

    from ldmseg_tpu.core.config import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from ldmseg_tpu.diffusion import make_schedule
    from ldmseg_tpu.diffusion.sampling import ddim_sample
    from ldmseg_tpu.models.unet import CondUNet, UNetConfig

    profile_dir = os.environ.get("PROFILE_DIR", "/tmp/ldmseg_profile")
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))

    unet = CondUNet(UNetConfig(in_channels=8, cond_channels=4, out_channels=4,
                               use_cross_attention=False, dtype="bfloat16"))
    k = jax.random.PRNGKey(0)
    uparams = unet.init(k, jnp.zeros((1, 64, 64, 12)), jnp.array([1]))["params"]
    sched = make_schedule(num_train_timesteps=1000, beta_schedule="scaled_linear",
                          beta_start=0.00085, beta_end=0.012, clip_sample=False,
                          set_alpha_to_one=False)
    lat = jnp.zeros((batch, 64, 64, 4), jnp.float32)

    scan = jax.jit(lambda p, x, r: ddim_sample(
        lambda i, t, c: unet.apply({"params": p}, i, t, c),
        sched, r, x, num_inference_steps=steps, self_condition=True,
    ))
    out = scan(uparams, lat, jax.random.PRNGKey(0))
    out.block_until_ready()

    jax.profiler.start_trace(profile_dir)
    out = scan(uparams, lat, jax.random.PRNGKey(1))
    out.block_until_ready()
    jax.profiler.stop_trace()
    print(f"trace captured in {profile_dir}")
    summarize(profile_dir)


if __name__ == "__main__":
    main()
