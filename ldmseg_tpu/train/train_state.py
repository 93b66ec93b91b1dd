"""Train state pytree."""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, ema: bool = False):
        import jax

        # ema must NOT alias params: donation would see the same buffer twice
        ema_params = jax.tree_util.tree_map(jnp.copy, params) if ema else None
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=ema_params,
        )
