"""Shared test helper: fabricate a reference-layout HiFi-GAN checkpoint.

Produces the official checkpoint naming (``generator`` state dict,
weight-norm-free) that ``models/hifigan.py::Vocoder`` loads, plus the
sibling ``config.json`` — lets CLI tests drive the full vocoder path
without the released UNIVERSAL_V1 weights.
"""

import json
import os

import numpy as np


def random_generator_state(rng, cfg):
    """Official-naming random state dict (already weight-norm-free)."""
    state = {}
    ch = cfg.upsample_initial_channel

    def rconv(name, cin, cout, k):
        state[f"{name}.weight"] = rng.normal(
            size=(cout, cin, k)).astype(np.float32) * 0.1
        state[f"{name}.bias"] = rng.normal(size=(cout,)).astype(
            np.float32) * 0.1

    rconv("conv_pre", cfg.num_mels, ch, 7)
    nk = len(cfg.resblock_kernel_sizes)
    for i, (rate, ksize) in enumerate(zip(cfg.upsample_rates,
                                          cfg.upsample_kernel_sizes)):
        cin, cout = ch // (2 ** i), ch // (2 ** (i + 1))
        state[f"ups.{i}.weight"] = rng.normal(
            size=(cin, cout, ksize)).astype(np.float32) * 0.1
        state[f"ups.{i}.bias"] = rng.normal(size=(cout,)).astype(
            np.float32) * 0.1
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            r = i * nk + j
            for d_idx in range(len(rd)):
                rconv(f"resblocks.{r}.convs1.{d_idx}", cout, cout, rk)
                rconv(f"resblocks.{r}.convs2.{d_idx}", cout, cout, rk)
    final = ch // (2 ** len(cfg.upsample_rates))
    rconv("conv_post", final, 1, 7)
    return state


def write_tiny_checkpoint(dirpath, cfg, seed=3):
    """Write ``generator`` (torch checkpoint) + ``config.json``; returns
    the checkpoint path."""
    import torch

    os.makedirs(dirpath, exist_ok=True)
    state = {k: torch.tensor(v) for k, v in
             random_generator_state(np.random.default_rng(seed),
                                    cfg).items()}
    path = os.path.join(dirpath, "generator")
    torch.save({"generator": state}, path)
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump({
            "resblock": cfg.resblock,
            "upsample_rates": list(cfg.upsample_rates),
            "upsample_kernel_sizes": list(cfg.upsample_kernel_sizes),
            "upsample_initial_channel": cfg.upsample_initial_channel,
            "resblock_kernel_sizes": list(cfg.resblock_kernel_sizes),
            "resblock_dilation_sizes": [
                list(d) for d in cfg.resblock_dilation_sizes],
            "num_mels": cfg.num_mels,
        }, f)
    return path
