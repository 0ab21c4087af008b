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


class FusedAdamWState(struct.PyTreeNode):
    count: jnp.ndarray
    mu: Any
    nu: Any


def fused_adamw(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8, weight_decay: float = 0.0,
                moment_dtype=jnp.bfloat16) -> optax.GradientTransformation:
    """AdamW with reduced-precision moment storage, one pass per leaf.

    The optimizer update is HBM-bandwidth-bound: torch-layout AdamW moves
    p/m/v/g ≈ 7 full parameter images per step. Storing both moments in
    bfloat16 (compute stays f32) cuts that to 5 images; the whole leaf
    update is a single fused elementwise expression so XLA emits one HBM
    pass. bf16 moments have f32's exponent range and perturb the Adam
    direction by ~2⁻⁹ relative — a train-time noise floor far below the
    batch noise (cf. 8-bit Adam, arXiv:2110.02861). Exact optax.adamw
    arithmetic otherwise (bias correction, additive decoupled decay);
    ``moment_dtype=float32`` restores bit-compatible optax behavior and is
    what the torch-parity tests pin.
    """
    # python-scalar coefficient arithmetic ORDER matters: optax computes
    # (1 - decay) in python float64 then casts — f32(1 - 0.999) and
    # 1 - f32(0.999) differ by 1e-5 relative, visible in parity tests
    one_minus_b1 = 1.0 - b1
    one_minus_b2 = 1.0 - b2

    def init(params):
        zeros = lambda p: jnp.zeros(p.shape, moment_dtype)  # noqa: E731
        return FusedAdamWState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params))

    def update(grads, state, params):
        count = state.count + 1
        bc1 = 1 - b1 ** count   # optax.bias_correction arithmetic
        bc2 = 1 - b2 ** count
        lr = jnp.asarray(learning_rate, jnp.float32)
        wd = jnp.float32(weight_decay)

        def leaf(g, m, v, p):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + one_minus_b1 * g32
            v32 = b2 * v.astype(jnp.float32) + one_minus_b2 * (g32 * g32)
            mhat = m32 / bc1
            vhat = v32 / bc2
            upd = mhat / (jnp.sqrt(vhat) + eps) \
                + wd * p.astype(jnp.float32)
            return ((-lr * upd).astype(p.dtype), m32.astype(moment_dtype),
                    v32.astype(moment_dtype))

        out = jax.tree_util.tree_map(leaf, grads, state.mu, state.nu,
                                     params)
        updates = jax.tree_util.tree_map(lambda o: o[0], out,
                                         is_leaf=lambda x: isinstance(
                                             x, tuple))
        mu = jax.tree_util.tree_map(lambda o: o[1], out,
                                    is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree_util.tree_map(lambda o: o[2], out,
                                    is_leaf=lambda x: isinstance(x, tuple))
        return updates, FusedAdamWState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_adamw(weight_decay: float = 0.0,
               grad_accum: int = 1,
               moment_dtype: str = "bfloat16"
               ) -> optax.GradientTransformation:
    """AdamW with an injectable learning rate (torch-default moments).

    ``grad_accum > 1`` wraps in ``optax.MultiSteps`` — the recognition loop
    steps the optimizer every 2 batches (``recognition_model.py:105-107``).
    ``moment_dtype="float32"`` selects stock ``optax.adamw`` (bit-exact
    torch-parity configuration); the default stores Adam moments in
    bfloat16 via :func:`fused_adamw` (~30% less optimizer HBM traffic).
    """
    if moment_dtype == "float32":
        tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=0.0, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay)
    else:
        tx = optax.inject_hyperparams(fused_adamw, static_args=(
            "moment_dtype",))(
            learning_rate=0.0, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay, moment_dtype=jnp.bfloat16)
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
