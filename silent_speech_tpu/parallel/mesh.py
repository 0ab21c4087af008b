"""Mesh construction and sharding rules (data + tensor parallelism).

The reference is strictly single-device (SURVEY.md §2.4) — parallelism is a
new, first-class subsystem here. Design (the scaling-book recipe):

- a 2-D logical mesh ``('data', 'model')``; gradients all-reduce over the
  data axis, Megatron-style tensor parallelism over the model axis,
- **data**: every packed-batch array shards its leading (chunk/utterance)
  dimension over ``data``,
- **model**: attention heads and FFN hidden dims shard over ``model``; the
  attention output / FFN down projections produce partial sums that GSPMD
  turns into a single ``psum`` per layer over ICI,
- everything else (norms, small convs' inputs, heads) stays replicated;
  XLA propagates intermediate shardings from these anchors.

No hand-written collectives: shardings are declared, XLA inserts
``all-reduce``/``all-gather`` on ICI.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data_parallel: int = -1, model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel == -1:
        data_parallel = max(1, n // model_parallel)
    use = data_parallel * model_parallel
    assert use <= n, (
        f"mesh {data_parallel}x{model_parallel} needs {use} devices, "
        f"have {n}")
    arr = np.asarray(devices[:use]).reshape(data_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


# (regex over 'a/b/c' param paths) → PartitionSpec
_PARAM_RULES = [
    # attention: shard heads over the model axis
    (r".*self_attn/w_[qkvo]$", P("model", None, None)),
    (r".*self_attn/rel_emb$", P("model", None, None)),
    # FFN: Megatron split — up proj columns, down proj rows
    (r".*linear1/kernel$", P(None, "model")),
    (r".*linear1/bias$", P("model")),
    (r".*linear2/kernel$", P("model", None)),
    # conv stack: shard output channels; BN params follow the channel dim
    (r".*res\d+/conv\d+/kernel$", P(None, None, "model")),
    (r".*res\d+/conv\d+/bias$", P("model")),
    (r".*res\d+/residual_path/kernel$", P(None, None, "model")),
    (r".*res\d+/residual_path/bias$", P("model")),
    (r".*res\d+/(bn\d+|res_norm)/(scale|bias|mean|var)$", P("model")),
]


def param_partition_spec(path: str) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.match(pattern, path):
            return spec
    return P()


def _tree_paths_specs(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    specs = []
    for path, leaf in flat:
        name = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path)
        specs.append(param_partition_spec(name))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params, mesh: Mesh):
    """Place a param/batch-stats pytree on the mesh per the TP rules."""
    specs = _tree_paths_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def params_shardings(params, mesh: Mesh):
    specs = _tree_paths_specs(params)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim sharding over the data axis for batch arrays."""
    return NamedSharding(mesh, P("data"))


def constrain_batch(batch, mesh: Mesh):
    """``with_sharding_constraint`` twin of :func:`shard_batch` for use
    INSIDE jit: anchors the on-device-assembled batch to data-sharding so
    GSPMD partitions the downstream forward/backward, replicating arrays
    whose leading dim is not divisible by the axis."""
    dp = mesh.shape["data"]

    def constrain(v):
        ok = v.ndim > 0 and v.shape[0] % dp == 0
        spec = P("data") if ok else P()
        return jax.lax.with_sharding_constraint(
            v, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(constrain, batch)


def replicate(tree, mesh: Mesh):
    """device_put a pytree fully replicated over the mesh (the corpus
    cache: every device holds the flat arrays, batches shard on gather)."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda v: jax.device_put(np.asarray(v), s), tree)


def shard_batch(batch, mesh: Mesh, leading_axis: int = 0):
    """device_put a DeviceBatch with leading dims sharded over 'data'.

    The packers' ``chunk_bucket``/``utt_bucket`` guarantee divisibility of
    the leading dim by the data-axis size for real batch arrays; anything
    not divisible (e.g. the (1, 1, F) feature placeholder when
    ``send_feature_input`` is off) is replicated instead.
    """
    dp = mesh.shape["data"]
    sharded = batch_sharding(mesh)
    replicated = NamedSharding(mesh, P())

    def put(v):
        v = np.asarray(v)
        ok = v.ndim > leading_axis and v.shape[leading_axis] % dp == 0
        spec = [None] * v.ndim
        if ok:
            spec[leading_axis] = "data"
        s = (NamedSharding(mesh, P(*spec)) if ok and leading_axis
             else (sharded if ok else replicated))
        return jax.device_put(v, s)

    return jax.tree_util.tree_map(put, batch)
