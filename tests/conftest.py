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


# ---------------------------------------------------------------------------
# fast/slow split: `pytest -m "not slow"` runs the fast set (~1/3 of the
# wall time); the full suite stays the CI default. Modules here hold the
# long-running integration tests (engine decode loops, pipeline e2e,
# sharded train steps) measured >25 s each on this box.
SLOW_MODULES = {
    "test_constraint_matrix",
    "test_decode_attention",
    "test_full_finetune",
    "test_inference_cli",
    "test_model_factory",
    "test_multichip",
    "test_multihost_pipeline",
    "test_pipeline_e2e",
    "test_quant",
    "test_step1",
    "test_synthetic_checkpoint",
    "test_validate_weights",
    "test_trainer_extras",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
