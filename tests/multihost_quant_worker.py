"""Worker for test_multihost_quant: build a QUANTIZED tiny model through
the factory with ``mesh_scope: global`` under 2 jax.distributed processes.
Exercises ``mesh._put``'s host round-trip: the post-load quantize leaves
are committed jit outputs, which plain device_put rejects for
cross-process shardings."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(sys.argv[1], int(sys.argv[3]), int(sys.argv[2]))

import numpy as np

from ospo_tpu.config import Config
from ospo_tpu.pipeline.model_factory import get_model

model, tok, proc = get_model(Config.from_nested({
    "model_preset": "tiny",
    "seed": 0,
    "quantize": "int8",
    "data_parallel": 2,
    "mesh_scope": "global",
}))
assert model.mesh is not None
wq = model.params["language_model"]["layers"]["wq"]
assert isinstance(wq, dict) and "q" in wq, "trunk must be int8-quantized"
assert not wq["q"].sharding.is_fully_addressable, \
    "params must be sharded across both processes"

# the sharded quantized trunk must still compute: one tiny jitted embed
ids = np.zeros((2, 4), np.int32)
out = jax.jit(lambda p, i: p["language_model"]["embed"][i.flatten()].sum())(
    model.params, ids)
assert np.isfinite(float(out))
print("QUANT-GLOBAL-OK", flush=True)
