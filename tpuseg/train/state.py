"""Train state: params + batch stats + optimizer state, one pytree.

The reference's mutable pile (net.state_dict + amp state + optimizer +
epoch counter global) collapses into this single immutable struct passed
through the jitted step.
"""
from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=new_batch_stats,
                            opt_state=new_opt_state)


def create_train_state(model, tx, rng, example_input, train: bool = False):
    """Initialize params/batch_stats with a jitted init (eager init through
    the device tunnel is ~30x slower) and build the optimizer state."""
    import jax.numpy as jnp

    def init_fn(rng, x):
        return model.init(rng, x, train=train)

    variables = jax.jit(init_fn)(rng, example_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state, tx=tx)
