"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the multi-device test strategy described in SURVEY.md §4: TPU meshes
are simulated with 8 virtual CPU devices so sharding logic is exercised
without hardware. Platform forcing goes through the shared helper
(``silent_speech_tpu.utils.platform``) — this environment's sitecustomize
pre-imports jax pinned to the tunneled TPU, so plain env vars don't work.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from silent_speech_tpu.utils.platform import force_cpu  # noqa: E402

force_cpu(8)

import jax  # noqa: E402

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8, \
    jax.devices()
