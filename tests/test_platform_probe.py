"""Backend liveness probe (`platform.require_live_backend`).

The tunneled TPU can go down for hours with ``jax.devices()`` either
hanging or raising transient RPC errors; the probe must (a) return
promptly on a live backend, (b) retry raise-type transients instead of
silently burning the whole window on the first failure.
"""

import jax

from ospo_tpu import platform


def test_probe_returns_on_live_backend():
    platform.require_live_backend(60)  # would os._exit(2) on failure


def test_probe_is_idempotent_after_success(monkeypatch):
    """Once one probe succeeded, later calls must not touch the backend
    again (bench probes unconditionally AND apply_platform_env probes
    under OSPO_STARTUP_PROBE_S — only one round-trip should happen)."""
    platform.require_live_backend(60)
    assert platform._BACKEND_VERIFIED

    def exploding_devices(*a, **kw):
        raise AssertionError("probe ran despite prior success")

    monkeypatch.setattr(jax, "devices", exploding_devices)
    platform.require_live_backend(60)  # must return without probing


def test_probe_retries_transient_raise(monkeypatch):
    monkeypatch.setattr(platform, "_BACKEND_VERIFIED", False)
    real_devices = jax.devices
    calls = {"n": 0}

    def flaky_devices(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient tunnel RPC failure")
        return real_devices(*a, **kw)

    monkeypatch.setattr(jax, "devices", flaky_devices)
    # shrink the retry sleep so the test doesn't sit for 10 s
    import time as time_mod

    monkeypatch.setattr(time_mod, "sleep", lambda s: None)
    platform.require_live_backend(60)
    assert calls["n"] >= 2


def test_probe_disabled_is_noop():
    platform.require_live_backend(0)
