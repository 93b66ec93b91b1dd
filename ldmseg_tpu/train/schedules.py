"""LR schedules (reference: ldmseg/utils/utils.py:84-157).

Pure functions of the step index (no precomputed host arrays indexed per
step — the schedule evaluates inside the jitted update via optax), with
numpy-array variants kept for test parity against the reference semantics.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np


def cosine_scheduler(
    base_value: float,
    final_value: float,
    epochs: int,
    niter_per_ep: int,
    start_warmup_value: float = 0.0,
    warmup_iters: Optional[int] = None,
) -> np.ndarray:
    warmup_iters = warmup_iters or 0
    warmup = np.linspace(start_warmup_value, base_value, warmup_iters)
    iters = np.arange(epochs * niter_per_ep - warmup_iters)
    sched = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / len(iters))
    )
    out = np.concatenate([warmup, sched])
    assert len(out) == epochs * niter_per_ep
    return out


def warmup_scheduler(
    base_value: float,
    final_value: float,
    epochs: int,
    niter_per_ep: int,
    start_warmup_value: float = 0.0,
    warmup_iters: Optional[int] = None,
) -> np.ndarray:
    warmup_iters = warmup_iters or 0
    warmup = np.linspace(start_warmup_value, base_value, warmup_iters)
    sched = np.full(epochs * niter_per_ep - warmup_iters, base_value)
    out = np.concatenate([warmup, sched])
    assert len(out) == epochs * niter_per_ep
    return out


def step_scheduler(
    base_value: float,
    final_value: float,
    epochs: int,
    niter_per_ep: int,
    decay_epochs: List[int] = (20, 40),
    decay_rate: float = 0.1,
    start_warmup_value: float = 0.0,
    warmup_iters: Optional[int] = None,
) -> np.ndarray:
    warmup_iters = warmup_iters or 0
    warmup = np.linspace(start_warmup_value, base_value, warmup_iters)
    sched = np.full(epochs * niter_per_ep - warmup_iters, base_value)
    for de in decay_epochs:
        sched[int(de * niter_per_ep - warmup_iters):] *= decay_rate
    out = np.concatenate([warmup, sched])
    assert len(out) == epochs * niter_per_ep
    return out


def make_lr_schedule(
    name: str,
    base_lr: float,
    total_iters: int,
    final_lr: float = 0.0,
    warmup_iters: Optional[int] = None,
    decay_rate: float = 0.1,
) -> Callable:
    """Callable step -> lr, jit-friendly (evaluated inside the update)."""
    import jax.numpy as jnp

    warmup_iters = warmup_iters or 0

    def warmup_part(step):
        # np.linspace semantics: value at step i is base * i / (n - 1)
        denom = max(warmup_iters - 1, 1)
        return base_lr * jnp.minimum(step, warmup_iters - 1) / denom

    if name == "warmup":
        def fn(step):
            return jnp.where(step < warmup_iters, warmup_part(step), base_lr)
    elif name == "cosine":
        n = max(total_iters - warmup_iters, 1)

        def fn(step):
            i = jnp.clip(step - warmup_iters, 0, n - 1)
            cos = final_lr + 0.5 * (base_lr - final_lr) * (1 + jnp.cos(jnp.pi * i / n))
            return jnp.where(step < warmup_iters, warmup_part(step), cos)
    elif name == "step":
        half, three_q = total_iters // 2, 3 * total_iters // 4

        def fn(step):
            lr = base_lr * jnp.where(step >= half, decay_rate, 1.0)
            lr = lr * jnp.where(step >= three_q, decay_rate, 1.0)
            return jnp.where(step < warmup_iters, warmup_part(step), lr)
    elif name in ("none", "constant"):
        def fn(step):
            return jnp.asarray(base_lr)
    else:
        raise NotImplementedError(f"lr scheduler '{name}'")

    return fn
