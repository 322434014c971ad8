"""Train state and optimizer factory."""
from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, lr, new_batch_stats=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        # lr is injected as a traced scalar so host-side plateau scheduling
        # never triggers a recompile
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params,
                            opt_state=new_opt,
                            batch_stats=(new_batch_stats
                                         if new_batch_stats is not None
                                         else self.batch_stats))


def make_optimizer(name: str = "adam", weight_decay: float = 0.0
                   ) -> optax.GradientTransformation:
    """Learning-rate-free transform; the step multiplies by lr at apply time
    (matching torch Adam + external ReduceLROnPlateau semantics)."""
    if name == "adam":
        tx = optax.scale_by_adam()
    elif name == "sgd":
        tx = optax.identity()
    else:
        raise ValueError(name)
    if weight_decay:
        tx = optax.chain(tx, optax.add_decayed_weights(weight_decay))
    return optax.chain(tx, optax.scale(-1.0))


def create_state(model, rng, sample_args, optimizer="adam",
                 weight_decay: float = 0.0, **init_kwargs) -> TrainState:
    variables = model.init(rng, *sample_args, **init_kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(optimizer, weight_decay)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params),
                      tx=tx)


def grad_finite(grads) -> jnp.ndarray:
    """True iff all gradient entries are finite (reference: src/utils.py:
    393-399 grad_norm NaN/Inf guard). Used to skip bad updates."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.all(jnp.stack([jnp.all(jnp.isfinite(l)) for l in leaves]))
