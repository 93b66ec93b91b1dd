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
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=params if ema else None,
        )
