"""Mixed-precision policy.

The reference mixes fp16 autocast + GradScaler with fp32 master weights
(reference: trainers_ldm_cond.py:106,834, tools/main_ldm.py:164-172).
On TPU the idiomatic policy is bf16 compute + fp32 params — no loss scaling
needed. DDIM tables always stay fp32 (SURVEY §7 hard parts).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype used for frozen encoders (reference casts them to fp16 while the
    # trainable UNet stays fp32; we use bf16 for frozen paths)
    frozen_dtype: jnp.dtype = jnp.bfloat16

    @staticmethod
    def from_name(name: str) -> "DTypePolicy":
        name = (name or "bfloat16").lower()
        if name in ("float32", "fp32"):
            return DTypePolicy(compute_dtype=jnp.float32, frozen_dtype=jnp.float32)
        if name in ("bfloat16", "bf16", "float16", "fp16"):
            # fp16 requests map to bf16: TPU-native half precision
            return DTypePolicy()
        raise ValueError(f"Unknown dtype policy '{name}'")
