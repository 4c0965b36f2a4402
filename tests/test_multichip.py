"""Multi-device sharding: the dryrun entry must compile and execute the
full sharded train step on a virtual 8-device CPU mesh, and TP-sharded
inference must match single-device outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ospo_tpu.models import janus as janus_lib
from ospo_tpu.models import llama as llama_lib
from ospo_tpu.parallel import mesh as mesh_lib


def test_dryrun_multichip_8():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import os
    import sys

    sys.path.insert(0, "/root/repo")
    os.environ["OSPO_ENTRY_PRESET"] = "tiny"
    import importlib

    import __graft_entry__ as ge
    importlib.reload(ge)
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 1  # B=1 after CFG halving
    del os.environ["OSPO_ENTRY_PRESET"]


def test_tp_sharded_forward_matches_replicated():
    """Tensor-parallel Llama forward over a 2×4-model mesh must equal the
    unsharded forward (GSPMD inserts the collectives; math unchanged)."""
    cfg = llama_lib.tiny_config(num_heads=4)
    params = llama_lib.init_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.arange(24).reshape(2, 12) % cfg.vocab_size
    mask = jnp.ones((2, 12), jnp.int32)
    pos = llama_lib.positions_from_mask(mask)

    x = llama_lib.embed_tokens(params, ids)
    ref, _ = llama_lib.forward(params, cfg, x, mask, pos)
    ref_logits = llama_lib.logits_from_hidden(params, ref)

    mesh = mesh_lib.create_mesh(n_devices=8, model_parallel=4)
    specs = mesh_lib.llama_param_specs()
    from jax.sharding import NamedSharding

    sharded = jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )
    batch = mesh_lib.shard_batch({"ids": ids, "mask": mask}, mesh)

    @jax.jit
    def fwd(params, ids, mask):
        x = llama_lib.embed_tokens(params, ids)
        h, _ = llama_lib.forward(params, cfg, x, mask,
                                 llama_lib.positions_from_mask(mask))
        return llama_lib.logits_from_hidden(params, h)

    with mesh:
        out = fwd(sharded, batch["ids"], batch["mask"])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_logits), atol=2e-4, rtol=2e-4
    )
