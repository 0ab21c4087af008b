"""Checkpoint conversion between reference PyTorch layout and our Flax tree.

The reference saves bare ``state_dict()`` files (``transduction_model.py:217``,
``recognition_model.py:114``) with keys like ``conv_blocks.0.conv1.weight``,
``transformer.layers.3.self_attn.w_q`` … This module maps those to/from our
parameter tree so users can bring existing checkpoints to TPU (and export
back). Conventions converted:

- torch Linear ``weight`` (out, in) ↔ flax Dense ``kernel`` (in, out)
- torch Conv1d ``weight`` (out, in, k) ↔ flax Conv ``kernel`` (k, in, out)
- torch BatchNorm ``weight/bias/running_mean/running_var`` ↔ flax
  ``scale/bias`` params + ``mean/var`` batch stats
- relative embeddings ``(H, 2M-1, Dh, 1)`` ↔ ``(H, 2M-1, Dh)``

Works on plain dict-of-numpy-arrays, so torch is only needed by the caller
that reads/writes ``.pt`` files.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t(x):
    return np.asarray(x).T


def _conv_t2f(w):
    return np.transpose(np.asarray(w), (2, 1, 0))


def _conv_f2t(w):
    return np.transpose(np.asarray(w), (2, 1, 0))


def torch_to_flax(state: Dict[str, np.ndarray], num_layers: int = 6
                  ) -> Tuple[dict, dict]:
    """Reference state_dict (numpy values) → (params, batch_stats)."""
    params: dict = {}
    stats: dict = {}

    def bn(prefix):
        p = {"scale": np.asarray(state[f"{prefix}.weight"]),
             "bias": np.asarray(state[f"{prefix}.bias"])}
        s = {"mean": np.asarray(state[f"{prefix}.running_mean"]),
             "var": np.asarray(state[f"{prefix}.running_var"])}
        return p, s

    for i in range(3):
        rp = f"conv_blocks.{i}"
        blk_p: dict = {}
        blk_s: dict = {}
        blk_p["conv1"] = {"kernel": _conv_t2f(state[f"{rp}.conv1.weight"]),
                          "bias": np.asarray(state[f"{rp}.conv1.bias"])}
        blk_p["conv2"] = {"kernel": _conv_t2f(state[f"{rp}.conv2.weight"]),
                          "bias": np.asarray(state[f"{rp}.conv2.bias"])}
        blk_p["bn1"], blk_s["bn1"] = bn(f"{rp}.bn1")
        blk_p["bn2"], blk_s["bn2"] = bn(f"{rp}.bn2")
        if f"{rp}.residual_path.weight" in state:
            blk_p["residual_path"] = {
                "kernel": _conv_t2f(state[f"{rp}.residual_path.weight"]),
                "bias": np.asarray(state[f"{rp}.residual_path.bias"])}
            blk_p["res_norm"], blk_s["res_norm"] = bn(f"{rp}.res_norm")
        params[f"res{i}"] = blk_p
        stats[f"res{i}"] = blk_s

    params["w_raw_in"] = {"kernel": _t(state["w_raw_in.weight"]),
                          "bias": np.asarray(state["w_raw_in.bias"])}

    for i in range(num_layers):
        rp = f"transformer.layers.{i}"
        layer = {
            "self_attn": {
                "w_q": np.asarray(state[f"{rp}.self_attn.w_q"]),
                "w_k": np.asarray(state[f"{rp}.self_attn.w_k"]),
                "w_v": np.asarray(state[f"{rp}.self_attn.w_v"]),
                "w_o": np.asarray(state[f"{rp}.self_attn.w_o"]),
                "rel_emb": np.asarray(
                    state[f"{rp}.self_attn.relative_positional.embeddings"]
                )[..., 0],
            },
            "linear1": {"kernel": _t(state[f"{rp}.linear1.weight"]),
                        "bias": np.asarray(state[f"{rp}.linear1.bias"])},
            "linear2": {"kernel": _t(state[f"{rp}.linear2.weight"]),
                        "bias": np.asarray(state[f"{rp}.linear2.bias"])},
            "norm1": {"scale": np.asarray(state[f"{rp}.norm1.weight"]),
                      "bias": np.asarray(state[f"{rp}.norm1.bias"])},
            "norm2": {"scale": np.asarray(state[f"{rp}.norm2.weight"]),
                      "bias": np.asarray(state[f"{rp}.norm2.bias"])},
        }
        params[f"layer{i}"] = layer

    params["w_out"] = {"kernel": _t(state["w_out.weight"]),
                       "bias": np.asarray(state["w_out.bias"])}
    if "w_aux.weight" in state:
        params["w_aux"] = {"kernel": _t(state["w_aux.weight"]),
                           "bias": np.asarray(state["w_aux.bias"])}

    return params, stats


def flax_to_torch(params: dict, batch_stats: dict) -> Dict[str, np.ndarray]:
    """(params, batch_stats) → reference-layout state dict (numpy values)."""
    out: Dict[str, np.ndarray] = {}

    def put_bn(prefix, p, s):
        out[f"{prefix}.weight"] = np.asarray(p["scale"])
        out[f"{prefix}.bias"] = np.asarray(p["bias"])
        out[f"{prefix}.running_mean"] = np.asarray(s["mean"])
        out[f"{prefix}.running_var"] = np.asarray(s["var"])
        out[f"{prefix}.num_batches_tracked"] = np.asarray(0)

    for i in range(3):
        blk_p = params[f"res{i}"]
        blk_s = batch_stats[f"res{i}"]
        rp = f"conv_blocks.{i}"
        out[f"{rp}.conv1.weight"] = _conv_f2t(blk_p["conv1"]["kernel"])
        out[f"{rp}.conv1.bias"] = np.asarray(blk_p["conv1"]["bias"])
        out[f"{rp}.conv2.weight"] = _conv_f2t(blk_p["conv2"]["kernel"])
        out[f"{rp}.conv2.bias"] = np.asarray(blk_p["conv2"]["bias"])
        put_bn(f"{rp}.bn1", blk_p["bn1"], blk_s["bn1"])
        put_bn(f"{rp}.bn2", blk_p["bn2"], blk_s["bn2"])
        if "residual_path" in blk_p:
            out[f"{rp}.residual_path.weight"] = _conv_f2t(
                blk_p["residual_path"]["kernel"])
            out[f"{rp}.residual_path.bias"] = np.asarray(
                blk_p["residual_path"]["bias"])
            put_bn(f"{rp}.res_norm", blk_p["res_norm"], blk_s["res_norm"])

    out["w_raw_in.weight"] = _t(params["w_raw_in"]["kernel"])
    out["w_raw_in.bias"] = np.asarray(params["w_raw_in"]["bias"])

    i = 0
    while f"layer{i}" in params:
        layer = params[f"layer{i}"]
        rp = f"transformer.layers.{i}"
        sa = layer["self_attn"]
        out[f"{rp}.self_attn.w_q"] = np.asarray(sa["w_q"])
        out[f"{rp}.self_attn.w_k"] = np.asarray(sa["w_k"])
        out[f"{rp}.self_attn.w_v"] = np.asarray(sa["w_v"])
        out[f"{rp}.self_attn.w_o"] = np.asarray(sa["w_o"])
        out[f"{rp}.self_attn.relative_positional.embeddings"] = np.asarray(
            sa["rel_emb"])[..., None]
        out[f"{rp}.linear1.weight"] = _t(layer["linear1"]["kernel"])
        out[f"{rp}.linear1.bias"] = np.asarray(layer["linear1"]["bias"])
        out[f"{rp}.linear2.weight"] = _t(layer["linear2"]["kernel"])
        out[f"{rp}.linear2.bias"] = np.asarray(layer["linear2"]["bias"])
        out[f"{rp}.norm1.weight"] = np.asarray(layer["norm1"]["scale"])
        out[f"{rp}.norm1.bias"] = np.asarray(layer["norm1"]["bias"])
        out[f"{rp}.norm2.weight"] = np.asarray(layer["norm2"]["scale"])
        out[f"{rp}.norm2.bias"] = np.asarray(layer["norm2"]["bias"])
        i += 1

    out["w_out.weight"] = _t(params["w_out"]["kernel"])
    out["w_out.bias"] = np.asarray(params["w_out"]["bias"])
    if "w_aux" in params:
        out["w_aux.weight"] = _t(params["w_aux"]["kernel"])
        out["w_aux.bias"] = np.asarray(params["w_aux"]["bias"])
    return out


def load_torch_checkpoint(path: str, num_layers: int = 6
                          ) -> Tuple[dict, dict]:
    """Read a reference ``model.pt`` and convert (requires torch)."""
    import torch

    state = torch.load(path, map_location="cpu")
    state_np = {k: v.detach().numpy() for k, v in state.items()}
    return torch_to_flax(state_np, num_layers=num_layers)


def save_torch_checkpoint(path: str, params: dict, batch_stats: dict) -> None:
    """Export our weights as a reference-compatible ``model.pt``."""
    import torch

    state = {k: torch.tensor(np.asarray(v))
             for k, v in flax_to_torch(params, batch_stats).items()}
    torch.save(state, path)
