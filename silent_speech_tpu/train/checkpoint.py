"""Checkpointing: full train state via orbax + reference-format export.

The reference saves weights-only ``model.pt`` each epoch with no
optimizer/step state and no resume support (``transduction_model.py:217``,
SURVEY.md §5.4). Here:

- :func:`save_checkpoint` / :func:`restore_checkpoint` persist the complete
  train state (params, batch stats, optimizer state, step) with orbax, so
  training resumes exactly,
- :func:`export_reference_checkpoint` /
  :func:`load_reference_checkpoint` bridge to the reference's ``model.pt``
  layout via :mod:`..models.convert` for ecosystem compatibility.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _state_dict(state) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(directory: str, state, name: str = "checkpoint",
                    extra: Optional[dict] = None) -> str:
    """Save the train state under ``directory/name`` (overwrites, like the
    reference's fixed ``model.pt``). Host-side schedule state (``extra``, a
    JSON-able dict) is written alongside so training resumes exactly —
    something the reference cannot do (SURVEY.md §5.4)."""
    import json

    path = os.path.abspath(os.path.join(directory, name))
    ckpt = _checkpointer()
    ckpt.save(path, jax.device_get(_state_dict(state)), force=True)
    if extra is not None:
        with open(path + ".extra.json", "w") as f:
            json.dump(extra, f)
    return path


def restore_checkpoint(directory: str, state, name: str = "checkpoint",
                       with_extra: bool = False):
    """Restore into the structure of ``state`` (a template with matching
    pytree); ``with_extra`` also returns the saved host-side dict."""
    import json

    path = os.path.abspath(os.path.join(directory, name))
    ckpt = _checkpointer()
    restored = ckpt.restore(path, item=jax.device_get(_state_dict(state)))
    new_state = state.replace(
        step=restored["step"], params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"])
    if with_extra:
        extra = {}
        if os.path.exists(path + ".extra.json"):
            with open(path + ".extra.json") as f:
                extra = json.load(f)
        return new_state, extra
    return new_state


def checkpoint_exists(directory: str, name: str = "checkpoint") -> bool:
    return os.path.isdir(os.path.join(directory, name))


def load_any_checkpoint(state, path: str, num_layers: int = 6):
    """(params, batch_stats) from a reference ``model.pt``, a run directory
    containing ``checkpoint``, or an orbax checkpoint directory — loaded
    into the structure of ``state`` (shared by evaluate.py and the serving
    exporter)."""
    if os.path.isdir(path):
        if checkpoint_exists(path):   # run dir containing 'checkpoint'
            state = restore_checkpoint(path, state)
        else:                          # path IS the orbax checkpoint dir
            state = restore_checkpoint(
                os.path.dirname(path), state, name=os.path.basename(path))
    else:
        params, stats = load_reference_checkpoint(path,
                                                  num_layers=num_layers)
        state = load_params_into_state(state, params, stats)
    return state.params, state.batch_stats


def export_reference_checkpoint(state, path: str) -> None:
    """Write weights as a reference-compatible ``model.pt`` (needs torch)."""
    from ..models.convert import save_torch_checkpoint

    save_torch_checkpoint(path, jax.device_get(state.params),
                          jax.device_get(state.batch_stats))


def load_reference_checkpoint(path: str, num_layers: int = 6):
    """Read a reference ``model.pt`` → (params, batch_stats) numpy trees."""
    from ..models.convert import load_torch_checkpoint

    return load_torch_checkpoint(path, num_layers=num_layers)


def load_params_into_state(state, params, batch_stats, strict: bool = False):
    """Warm-start semantics (reference ``strict=False`` load at
    ``transduction_model.py:171-173``): copy matching leaves, keep the rest."""
    def merge(tree, new_tree):
        if not isinstance(tree, dict):
            return np.asarray(new_tree) if new_tree is not None else tree
        out = {}
        for k, v in tree.items():
            if new_tree is not None and k in new_tree:
                out[k] = merge(v, new_tree[k])
            else:
                if strict:
                    raise KeyError(f"missing checkpoint entry: {k}")
                out[k] = v
        return out

    return state.replace(
        params=merge(jax.device_get(state.params), params),
        batch_stats=merge(jax.device_get(state.batch_stats), batch_stats))
