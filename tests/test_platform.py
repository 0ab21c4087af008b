"""Platform-forcing helper: probe-skipping and default-platform logic.

The conftest has already forced an 8-device virtual CPU mesh through
``force_cpu(8)`` — these tests pin the helper's behavior around it, in
particular that forcing never needs to initialize a backend it is about
to discard (the tunneled TPU backend's init blocks indefinitely when the
tunnel is wedged, so an eager ``jax.devices()`` probe would hang every
CPU-only process).
"""

import jax

from silent_speech_tpu.utils import platform as plat


def test_backends_initialized_after_conftest():
    assert plat._backends_initialized()
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) >= 8


def test_default_platform_reflects_config():
    # conftest routed through force_cpu → jax_platforms == "cpu"
    assert plat._default_platform() == "cpu"


def test_force_cpu_is_idempotent_noop():
    before = jax.devices()
    plat.force_cpu(8)
    assert jax.devices() == before


def test_ensure_devices_noop_when_enough():
    before = jax.devices()
    plat.ensure_devices(8)
    plat.ensure_devices(1)
    assert jax.devices() == before


def test_ensure_devices_skips_probe_for_axon_default(monkeypatch):
    # with no backend initialized and the 1-chip tunneled platform as the
    # default, an n>1 request must not probe (init can hang); the first
    # jax.devices() call must happen only AFTER the platform config is
    # switched to cpu. All backend mutation is faked — the live suite
    # backend stays untouched.
    events = []
    monkeypatch.setattr(plat, "_backends_initialized", lambda: False)
    monkeypatch.setattr(plat, "_default_platform", lambda: "axon")
    monkeypatch.setattr(plat, "_clear_backends",
                        lambda: events.append("clear"))

    class FakeDev:
        platform = "cpu"

    monkeypatch.setattr(
        jax, "devices",
        lambda *a, **k: events.append("devices") or [FakeDev()] * 8)
    monkeypatch.setattr(
        jax.config, "update",
        lambda name, val: events.append(("update", name, val)))
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

    plat.ensure_devices(8)
    first_probe = events.index("devices")
    platform_set = events.index(("update", "jax_platforms", "cpu"))
    assert platform_set < first_probe, events


def test_force_cpu_skips_probe_for_noncpu_default(monkeypatch):
    # same contract for force_cpu: a non-cpu uninitialized default is
    # never probed just to discard it
    events = []
    monkeypatch.setattr(plat, "_backends_initialized", lambda: False)
    monkeypatch.setattr(plat, "_default_platform", lambda: "axon")
    monkeypatch.setattr(plat, "_clear_backends",
                        lambda: events.append("clear"))

    class FakeDev:
        platform = "cpu"

    monkeypatch.setattr(
        jax, "devices",
        lambda *a, **k: events.append("devices") or [FakeDev()] * 8)
    monkeypatch.setattr(
        jax.config, "update",
        lambda name, val: events.append(("update", name, val)))
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

    plat.force_cpu(8)
    first_probe = events.index("devices")
    platform_set = events.index(("update", "jax_platforms", "cpu"))
    assert platform_set < first_probe, events
