"""Train state pytree: params + optimizer state + step counter."""

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, tx):
        import jax.numpy as jnp

        return cls(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
