"""Test harness: force an 8-device virtual CPU platform so sharding and
multi-device code paths run without TPU hardware.

The session environment presets ``JAX_PLATFORMS=axon`` (a tunneled TPU) and
a sitecustomize that imports jax at interpreter startup, so env vars alone
are too late — override through jax.config before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
