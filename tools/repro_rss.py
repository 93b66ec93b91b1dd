"""Host-RSS growth repro for the tunneled-TPU runtime (VERDICT r2 #5).

Observed in quality runs (metrics.jsonl telemetry): host RSS grows
~12-22 MB per train step during plain training — save/eval spikes are
reused arena space (peaks track the per-step slope), and the post-eval
``malloc_trim`` reclaims less each time, i.e. the growth is live/pinned
allocations, not glibc arena garbage. ~22 MB/step matches the per-step
batch ``device_put`` payload (B=8: 512^2x3 fp32 rgb ~25 MB + 256^2
semseg tensors), pointing at per-transfer host buffers retained by the
tunnel client.

Two scripted discriminators:

  python tools/repro_rss.py cpu [steps]
      The real trainer loop (tools/main_ldm.py) with a tiny UNet on the
      CPU backend, saves/evals pushed out of range, same batch shapes.
      Flat RSS slope here == the leak is not in the framework's Python
      (loader, trainer loop, metrics) but in the device runtime.

  python tools/repro_rss.py tput [iters] [--mb 25] [--hold]
      Raw ``jax.device_put`` loop of an ``--mb``-sized fp32 array against
      the default backend (the tunneled TPU), deleting each result
      (default) or holding refs (--hold, positive control). Prints RSS
      every 20 iters; a slope ~= bytes-transferred with deletion means
      the tunnel client retains per-transfer buffers.

Findings go to BENCHMARKS.md ("host-RSS attribution").
"""

import os
import sys


def _rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return 0.0


def repro_cpu(steps: int = 400) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.main_ldm import main

    data = "/tmp/ldmseg_data/examples"
    if not os.path.isdir(data):
        import shutil

        os.makedirs(os.path.dirname(data), exist_ok=True)
        shutil.copytree("/root/reference/data/examples/coco", data)
    main([
        "datasets=examples",
        f"env.data_dir={data}",
        "env.root_dir=/tmp/ldmseg_rss",
        "run_idx=90",
        "base.wandb=False",
        "base.train_kwargs.batch_size=8",
        f"base.train_kwargs.train_num_steps={steps}",
        "base.train_kwargs.num_workers=2",
        "base.eval_kwargs.eval_every=100000",
        "base.train_kwargs.save_every=100000",
        "base.eval_kwargs.num_workers=0",
        "base.transformation_kwargs.size=256",
        # tiny UNet: same batch/transfer shapes, trivial compute
        "base.model_kwargs.block_out_channels=[32,64,96,128]",
        "base.model_kwargs.layers_per_block=1",
        "base.model_kwargs.attention_head_dim=32",
        "base.model_kwargs.cond_channels=4",
        "base.train_kwargs.self_condition=True",
        "base.vae_model_kwargs.num_mid_blocks=0",
        "base.vae_model_kwargs.num_upscalers=2",
        "base.vae_model_kwargs.parametrization=gaussian",
    ])
    print(f"repro_cpu done: final rss={_rss_gb():.2f} GB "
          f"(slope: see /tmp/ldmseg_rss/.../run_90/metrics.jsonl)")


def repro_tget(iters: int = 100, mb: int = 25) -> None:
    """device_get direction: download an on-device array repeatedly and
    drop the host copy. Distinguishes pinned upload buffers (the measured
    leak) from ordinary trimmable host allocations on the download path."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    y = jax.device_put(
        jnp.ones((mb * 1024 * 1024 // 4,), jnp.float32), dev)
    y.block_until_ready()
    print(f"backend={dev.platform} payload={mb}MB rss0={_rss_gb():.3f}GB",
          flush=True)
    r0 = _rss_gb()
    for i in range(iters):
        x = np.asarray(y)
        del x
        if (i + 1) % 20 == 0:
            r = _rss_gb()
            print(f"iter {i+1:4d} rss={r:.3f}GB "
                  f"slope={(r - r0) * 1024 / (i + 1):.2f}MB/iter", flush=True)
    import ctypes

    ctypes.CDLL("libc.so.6").malloc_trim(0)
    print(f"after malloc_trim: rss={_rss_gb():.3f}GB", flush=True)


def repro_tput(iters: int = 200, mb: int = 25, hold: bool = False) -> None:
    import numpy as np

    import jax

    x = np.ones((mb * 1024 * 1024 // 4,), np.float32)
    dev = jax.devices()[0]
    print(f"backend={dev.platform} payload={x.nbytes/1e6:.0f}MB "
          f"hold={hold} rss0={_rss_gb():.3f}GB", flush=True)
    keep = []
    r0 = _rss_gb()
    for i in range(iters):
        y = jax.device_put(x, dev)
        y.block_until_ready()
        if hold:
            keep.append(y)
        else:
            y.delete()
        if (i + 1) % 20 == 0:
            r = _rss_gb()
            print(f"iter {i+1:4d} rss={r:.3f}GB "
                  f"slope={(r - r0) * 1024 / (i + 1):.2f}MB/iter", flush=True)
    import ctypes

    ctypes.CDLL("libc.so.6").malloc_trim(0)
    print(f"after malloc_trim: rss={_rss_gb():.3f}GB", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    rest = [a for a in sys.argv[2:] if not a.startswith("--")]
    if mode == "cpu":
        repro_cpu(int(rest[0]) if rest else 400)
    elif mode == "tget":
        repro_tget(int(rest[0]) if rest else 100,
                   mb=int(rest[1]) if len(rest) > 1 else 25)
    elif mode == "tput":
        repro_tput(int(rest[0]) if rest else 200,
                   mb=int(rest[1]) if len(rest) > 1 else 25,
                   hold="--hold" in sys.argv)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
