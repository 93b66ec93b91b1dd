"""Microbenchmark: int8 vs bf16 matmul + conv throughput on this TPU.

Motivation: BENCHMARKS.md round-2 concluded the bf16 sampling pipeline is
structurally saturated (convs at XLA's ~60% MFU ceiling, flash kernels at
~70% of the padded-matmul roofline). The remaining hardware lever on v5e
is the int8 MXU path (~2x bf16 peak: 394 vs 197 TOPS). This probes whether
XLA actually reaches it for the UNet's dominant shapes before we invest in
a quantized serving mode.

Shapes probed = the UNet hot spots at 512^2 inputs (64^2 latents):
  - 3x3 conv 64^2x320 -> 320 (down block resnets)
  - 3x3 conv 32^2x640 -> 640
  - 1x1-equivalent matmul [B*4096, 320] x [320, 320] (attention projections)
  - flash-attention shaped matmul [2048, 128pad] x [128pad, 1024]
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else fn(
        *args
    ).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def bench_matmul(m, k, n, dtype):
    if dtype == jnp.int8:
        a = jnp.ones((m, k), jnp.int8)
        b = jnp.ones((k, n), jnp.int8)
        f = jax.jit(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32))
    else:
        a = jnp.ones((m, k), dtype)
        b = jnp.ones((k, n), dtype)
        f = jax.jit(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32))
    dt = timeit(f, a, b)
    flops = 2 * m * k * n
    return dt, flops / dt / 1e12


def bench_conv(bhwc, cout, dtype, kernel=3):
    b, h, w, c = bhwc
    if dtype == jnp.int8:
        x = jnp.ones((b, h, w, c), jnp.int8)
        k_ = jnp.ones((kernel, kernel, c, cout), jnp.int8)
        pref = jnp.int32
    else:
        x = jnp.ones((b, h, w, c), dtype)
        k_ = jnp.ones((kernel, kernel, c, cout), dtype)
        pref = jnp.float32

    @jax.jit
    def f(x, k_):
        return jax.lax.conv_general_dilated(
            x, k_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pref,
        )

    dt = timeit(f, x, k_)
    flops = 2 * b * h * w * c * cout * kernel * kernel
    return dt, flops / dt / 1e12


def main():
    print("backend:", jax.default_backend(), jax.devices())
    for name, (m, k, n) in {
        "proj 32768x320x320": (32768, 320, 320),
        "attn 2048x128x1024": (2048, 128, 1024),
        "big 8192x2048x2048": (8192, 2048, 2048),
    }.items():
        for dt_name, dt in [("bf16", jnp.bfloat16), ("int8", jnp.int8)]:
            try:
                t, tput = bench_matmul(m, k, n, dt)
                print(f"matmul {name:24s} {dt_name}: {t*1e3:7.3f} ms  {tput:6.1f} TOP/s")
            except Exception as e:  # noqa: BLE001
                print(f"matmul {name:24s} {dt_name}: FAILED {type(e).__name__}: {e}")
    for name, (shape, cout) in {
        "conv 8x64x64x320->320": ((8, 64, 64, 320), 320),
        "conv 8x32x32x640->640": ((8, 32, 32, 640), 640),
        "conv 8x16x16x1280->1280": ((8, 16, 16, 1280), 1280),
    }.items():
        for dt_name, dt in [("bf16", jnp.bfloat16), ("int8", jnp.int8)]:
            try:
                t, tput = bench_conv(shape, cout, dt)
                print(f"{name:28s} {dt_name}: {t*1e3:7.3f} ms  {tput:6.1f} TOP/s")
            except Exception as e:  # noqa: BLE001
                print(f"{name:28s} {dt_name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
