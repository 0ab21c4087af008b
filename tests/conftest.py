"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the multi-device test strategy described in SURVEY.md §4: TPU meshes
are simulated with ``--xla_force_host_platform_device_count=8`` so sharding
logic is exercised without hardware.

Note: this environment's sitecustomize pre-imports jax with
``JAX_PLATFORMS=axon`` (the tunneled TPU), so setting env vars here is too
late for the platform choice — we must go through ``jax.config.update``.
``XLA_FLAGS`` is still read at backend-initialization time, so the virtual
device count env var does take effect.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
