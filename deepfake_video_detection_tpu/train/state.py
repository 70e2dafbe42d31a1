"""Train state pytree.

One immutable dataclass registered as a pytree: params, mutable model state
(BN running stats), optimizer state, and the step counter. The whole thing
lives on device, sharded/replicated by the mesh helpers — the reference's
equivalent was scattered ``model/optimizer/scheduler state_dict`` triples in
checkpoints (SURVEY.md §5.4 layout 1).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Any
    model_state: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, variables, tx) -> "TrainState":
        params = variables["params"]
        return cls(
            params=params,
            model_state=variables.get("state", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    @property
    def variables(self):
        return {"params": self.params, "state": self.model_state}
