"""Platform selection for pipeline CLIs.

The hosting environment may pre-register a TPU plugin and pin
``JAX_PLATFORMS`` at interpreter startup (sitecustomize), which silently
overrides the conventional env var.  ``apply_platform_env()`` re-asserts
the user's choice through ``jax.config`` before any backend initialises —
call it first in every CLI ``__main__``.

Priority: ``OSPO_PLATFORM`` > no-op. Values: ``cpu`` / ``tpu`` / ``axon``.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("OSPO_PLATFORM")
    if not plat:
        return
    import jax

    if plat == "tpu" and "axon" in str(os.environ.get("JAX_PLATFORMS", "")):
        plat = "axon"  # tunneled TPU registers under the 'axon' name
    jax.config.update("jax_platforms", plat)
    if plat == "cpu":
        n = int(os.environ.get("OSPO_CPU_DEVICES", "0"))
        if n > 1:
            jax.config.update("jax_num_cpu_devices", n)
