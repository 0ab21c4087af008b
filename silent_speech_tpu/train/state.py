"""Train state and optimizer construction.

The reference trains with AdamW (torch defaults β=(0.9, 0.999), ε=1e-8,
decoupled weight decay) where the LR is poked from the outside each step —
linear warmup then ReduceLROnPlateau (``transduction_model.py:178-189``) or
MultiStepLR (``recognition_model.py:72-83``). We mirror that control scheme:
the host computes the LR (warmup × plateau/milestone scale) and writes it
into an ``optax.inject_hyperparams`` slot — a scalar leaf update, never a
retrace.

Unlike the reference's ``model.pt`` (weights only, no optimizer/step —
SURVEY.md §5.4), our checkpoints capture the full train state.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=params, opt_state=new_opt_state,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats))


def make_adamw(weight_decay: float = 0.0,
               grad_accum: int = 1) -> optax.GradientTransformation:
    """AdamW with an injectable learning rate (torch-default moments).

    ``grad_accum > 1`` wraps in ``optax.MultiSteps`` — the recognition loop
    steps the optimizer every 2 batches (``recognition_model.py:105-107``).
    """
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=0.0, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=weight_decay)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Write the LR into the inject_hyperparams slot (handles MultiSteps)."""
    if isinstance(opt_state, optax.MultiStepsState):
        inner = set_learning_rate(opt_state.inner_opt_state, lr)
        return opt_state._replace(inner_opt_state=inner)
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hyperparams)


def create_train_state(model, rng, example_batch, tx,
                       mesh=None, param_sharding_fn=None) -> TrainState:
    """Initialize params/batch_stats from an example batch."""
    init_rngs = {"params": rng}
    variables = model.init(
        init_rngs, jnp.asarray(example_batch.emg),
        jnp.asarray(example_batch.raw_emg),
        jnp.asarray(example_batch.session_ids), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state,
                      tx=tx, apply_fn=model.apply)
