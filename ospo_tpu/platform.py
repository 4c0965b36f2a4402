"""Platform selection + persistent compile cache for pipeline CLIs.

The hosting environment may pre-register a TPU plugin and pin
``JAX_PLATFORMS`` at interpreter startup (sitecustomize), which silently
overrides the conventional env var.  ``apply_platform_env()`` re-asserts
the user's choice through ``jax.config`` before any backend initialises —
call it first in every CLI ``__main__``.

Priority: ``OSPO_PLATFORM`` > no-op. Values: ``cpu`` / ``tpu`` / ``axon``.

It also enables JAX's persistent compilation cache: cold compiles of the
serving programs cost 160-600 s through the remote compile endpoint
(BENCH_NOTES), so every pipeline invocation would otherwise repay them.
``OSPO_COMPILE_CACHE`` overrides the location; ``0``/``off`` disables.
CPU runs skip the cache unless ``OSPO_COMPILE_CACHE`` is set explicitly
(cross-host CPU AOT reload risks SIGILL; CPU compiles are cheap anyway).
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/ospo_tpu/xla")


def enable_compilation_cache() -> str | None:
    """Point JAX's persistent compilation cache at a stable directory so
    repeat pipeline invocations skip the multi-minute remote compiles.
    Returns the cache dir, or None when disabled.

    Default-on only for TPU runs: the cache's value is the 160-600 s
    remote compiles.  CPU compiles are seconds, and XLA:CPU AOT entries
    bake in the build host's vector ISA — reloading them on a different
    host risks SIGILL (observed: '+prefer-no-scatter not supported on the
    host machine' loader errors).  Set OSPO_COMPILE_CACHE explicitly to
    cache CPU compiles anyway."""
    loc = os.environ.get("OSPO_COMPILE_CACHE")
    if loc is None:
        plat = (os.environ.get("OSPO_PLATFORM")
                or os.environ.get("JAX_PLATFORMS") or "")
        if "cpu" in plat.lower():
            return None
        loc = DEFAULT_CACHE_DIR
    if loc.lower() in ("0", "off", "none", ""):
        return None
    import jax

    os.makedirs(loc, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", loc)
    # cache every compile that took ≥2 s — the tunnel's per-compile floor
    # is far above the 1 s default anyway, and tiny programs are free
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return loc


_DIST_INITIALIZED = False


def maybe_init_distributed() -> None:
    """Join the multi-process runtime when launched by
    ``scripts/run_multihost.sh`` (or any scheduler exporting
    ``OSPO_COORDINATOR`` / ``OSPO_NUM_PROCESSES`` / ``OSPO_PROCESS_ID``) —
    the ``jax.distributed`` equivalent of the reference's Lightning DDP
    spawn (``ospo/utils/generate.py:5-15``).  After this, every step CLI is
    automatically data-parallel: ``io.shard_for_process`` strides the work
    list per process and ``io.save_json_sharded`` gathers + dedups on
    host 0 (the ``save_json_ddp`` semantics).  No-op when unset."""
    global _DIST_INITIALIZED
    coord = os.environ.get("OSPO_COORDINATOR")
    if not coord or _DIST_INITIALIZED:
        return
    import jax

    kwargs = dict(
        coordinator_address=coord,
        num_processes=int(os.environ["OSPO_NUM_PROCESSES"]),
        process_id=int(os.environ["OSPO_PROCESS_ID"]),
    )
    ids = os.environ.get("OSPO_LOCAL_DEVICE_IDS")
    if ids:
        kwargs["local_device_ids"] = [int(x) for x in ids.split(",")]
    jax.distributed.initialize(**kwargs)
    _DIST_INITIALIZED = True
    print(f"# distributed runtime: process {kwargs['process_id']}"
          f"/{kwargs['num_processes']} @ {coord}", flush=True)


_BACKEND_VERIFIED = False


def require_live_backend(timeout_s: int) -> None:
    """Fail fast (exit 2) when the backend is unreachable.  The tunneled
    TPU can go down for hours with ``jax.devices()`` hanging forever; a
    watchdog thread probes devices + a tiny jitted matmul and aborts
    with a clear message at the deadline instead of blocking a run's
    whole time budget.  ``timeout_s <= 0`` disables.  Idempotent per
    process: once a probe has succeeded, later calls return immediately
    (bench probes unconditionally AND ``apply_platform_env`` probes when
    ``OSPO_STARTUP_PROBE_S`` is set — one device round-trip is enough)."""
    global _BACKEND_VERIFIED
    if timeout_s <= 0 or _BACKEND_VERIFIED:
        return
    import sys
    import threading

    done = threading.Event()
    info = {}

    def probe():
        import time

        import jax
        import jax.numpy as jnp

        # a hang (dead tunnel) blocks inside jax.devices() until the
        # deadline; a RAISE (transient RPC error while the tunnel flaps)
        # is retried so a momentary failure doesn't burn the whole window
        while not done.is_set():
            try:
                info["devices"] = jax.devices()
                jax.block_until_ready(
                    jax.jit(lambda x: (x @ x).sum())(jnp.ones((8, 8))))
                done.set()
            except Exception as e:  # noqa: BLE001 — deadline reports it
                info["error"] = f"{type(e).__name__}: {e}"
                time.sleep(10)

    threading.Thread(target=probe, daemon=True).start()
    if done.wait(timeout_s):
        _BACKEND_VERIFIED = True
    else:
        print(f"# FATAL: backend unreachable — device probe did not "
              f"complete within {timeout_s}s "
              f"(devices seen: {info.get('devices')}, "
              f"last error: {info.get('error')})", file=sys.stderr)
        sys.stderr.flush()
        os._exit(2)


def apply_platform_env(compile_cache: bool = True) -> None:
    if compile_cache:
        enable_compilation_cache()
    plat = os.environ.get("OSPO_PLATFORM")
    if plat:
        import jax

        if plat == "tpu" and "axon" in str(os.environ.get("JAX_PLATFORMS", "")):
            plat = "axon"  # tunneled TPU registers under the 'axon' name
        jax.config.update("jax_platforms", plat)
        if plat == "cpu":
            n = int(os.environ.get("OSPO_CPU_DEVICES", "0"))
            if n > 1:
                jax.config.update("jax_num_cpu_devices", n)
    # after platform selection, before any backend initialises
    maybe_init_distributed()
    # opt-in startup probe for pipeline CLIs (bench always probes):
    # OSPO_STARTUP_PROBE_S=600 makes a run on a dead tunnel fail fast
    # instead of hanging at the first device touch
    require_live_backend(int(os.environ.get("OSPO_STARTUP_PROBE_S", "0")))
