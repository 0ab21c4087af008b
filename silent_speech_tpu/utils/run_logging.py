"""Run-directory logging with the reference's observability surface.

Matches ``transduction_model.py:229-244`` / ``recognition_model.py:127-142``:
a ``log.txt`` (file + stream handlers, bare-message format) capturing the git
SHA, the working-tree diff, argv, split sizes, and per-epoch scalars — plus
our additions (device/mesh info, steps/sec).
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys
from typing import Optional


def setup_run_logging(output_directory: str,
                      filename: str = "log.txt") -> None:
    os.makedirs(output_directory, exist_ok=True)
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
    logging.basicConfig(
        handlers=[
            logging.FileHandler(os.path.join(output_directory, filename),
                                "w"),
            logging.StreamHandler(),
        ],
        level=logging.INFO, format="%(message)s")


def log_run_provenance() -> None:
    """git SHA + diff + argv, as the reference logs for reproducibility."""
    for cmd in (["git", "rev-parse", "HEAD"], ["git", "diff"]):
        try:
            out = subprocess.run(cmd, stdout=subprocess.PIPE,
                                 stderr=subprocess.DEVNULL,
                                 universal_newlines=True, timeout=10).stdout
        except Exception:
            out = f"<{' '.join(cmd)} unavailable>"
        logging.info(out)
    logging.info(sys.argv)


def log_device_info(mesh=None) -> None:
    import jax

    devs = jax.devices()
    logging.info("devices: %d x %s", len(devs),
                 devs[0].device_kind if devs else "none")
    if mesh is not None:
        logging.info("mesh: %s", dict(zip(mesh.axis_names,
                                          mesh.devices.shape)))
