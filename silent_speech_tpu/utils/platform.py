"""Robust JAX platform forcing — one shared helper.

This environment's ``sitecustomize`` pre-imports jax pinned to the 1-chip
``axon`` TPU platform, so ``JAX_PLATFORMS=cpu`` in ``os.environ`` (or a
subprocess env) is read too early/late to take effect, and ``XLA_FLAGS``'
``--xla_force_host_platform_device_count`` is cached at first backend
initialization. The only reliable sequence once jax is importable is:

1. ``jax.config.update("jax_platforms", "cpu")``
2. clear the live backends (``jax.extend.backend.clear_backends``)
3. ``jax.config.update("jax_num_cpu_devices", n)`` — legal again now that
   no backend is initialized
4. first ``jax.devices()`` call re-initializes on the virtual CPU mesh

Used by ``tests/conftest.py``, the CLI-subprocess tests, and
``__graft_entry__.dryrun_multichip`` (the driver's multi-chip artifact) so
sharding logic is exercised without TPU hardware — the test strategy from
SURVEY.md §4.
"""

from __future__ import annotations

import os


def _backends_initialized() -> bool:
    """True if any JAX backend has already been initialized.

    Probing ``jax.devices()`` on an uninitialized process initializes the
    DEFAULT backend — here the tunneled ``axon`` TPU, whose init blocks
    indefinitely when the tunnel is wedged. Callers that are about to force
    a different platform anyway must skip the probe in that case.
    """
    try:
        from jax._src import xla_bridge as xb
        return bool(xb.backends_are_initialized())
    except Exception:  # pragma: no cover - jax version fallback
        return True  # conservative: fall back to probing


def _default_platform() -> str:
    """The platform jax would initialize if nothing is initialized yet."""
    import jax

    p = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS") or ""
    return p.split(",")[0].strip().lower()


def ensure_devices(n: int, platform: str = "cpu") -> None:
    """Guarantee at least ``n`` JAX devices, re-initializing onto a virtual
    ``n``-device CPU backend if the current platform has fewer.

    Safe to call whether or not a backend is already initialized, and
    whether or not arrays exist (callers must not hold live device arrays
    across the switch). No-op when enough devices already exist — so on
    real multi-chip hardware (e.g. a v5e-8) the request is satisfied by
    the real devices, never by a forced virtual mesh.
    """
    import jax

    if _backends_initialized():
        if len(jax.devices()) >= n:
            return
    # Probing jax.devices() initializes the default backend; do that only
    # when it could actually satisfy the request — the tunneled 1-chip
    # "axon" platform never can for n>1, and its init blocks indefinitely
    # when the tunnel is wedged.
    elif _default_platform() != "axon" or n <= 1:
        if len(jax.devices()) >= n:
            return

    # Keep env coherent for any subprocess we spawn later.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    os.environ["JAX_PLATFORMS"] = platform

    jax.config.update("jax_platforms", platform)
    _clear_backends()
    try:
        jax.config.update("jax_num_cpu_devices", n)
    except Exception:
        pass  # older jax: XLA_FLAGS alone governs; re-raise via assert below
    have = len(jax.devices())
    assert have >= n, (
        f"platform forcing failed: wanted {n} {platform} devices, got {have}")


def apply_env_platform_override() -> None:
    """Honor ``SSTPU_FORCE_PLATFORM`` (``cpu`` or ``cpu:<n_devices>``).

    The subprocess-spawning tests use this instead of ``JAX_PLATFORMS``,
    which this environment's sitecustomize consumes before user code runs.
    Called by ``config_from_flags()`` so every CLI honors it.
    """
    spec = os.environ.get("SSTPU_FORCE_PLATFORM")
    if not spec:
        return
    platform, _, n = spec.partition(":")
    force_cpu(int(n) if n else 1) if platform == "cpu" else ensure_devices(
        int(n) if n else 1, platform)


def _clear_backends() -> None:
    import jax

    try:
        from jax.extend.backend import clear_backends
    except ImportError:  # pragma: no cover - jax version fallback
        from jax._src.api import clear_backends  # type: ignore
    clear_backends()


def force_cpu(n: int = 1) -> None:
    """Force the CPU platform (with ``n`` virtual devices) regardless of the
    current backend. Unlike :func:`ensure_devices` this always switches."""
    import jax

    # Probe for the early return only when it could succeed: an already-
    # initialized backend, or an uninitialized default that IS cpu. Any
    # other default platform would fail the cpu check anyway — don't
    # initialize it (the tunneled TPU's init blocks when the tunnel is
    # down) just to discard it.
    if ((_backends_initialized() or _default_platform() == "cpu")
            and jax.devices()[0].platform == "cpu"
            and len(jax.devices()) >= n):
        return
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    _clear_backends()
    if n > 1:
        try:
            jax.config.update("jax_num_cpu_devices", n)
        except Exception:
            pass
    have = len(jax.devices())
    assert jax.devices()[0].platform == "cpu" and have >= n, (
        f"force_cpu failed: platform={jax.devices()[0].platform}, n={have}")
