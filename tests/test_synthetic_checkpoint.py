"""Synthetic-checkpoint generator ↔ porting-path consistency: the generated
key set must load through ``weights.load_janus`` into a pytree with exactly
the structure and shapes of ``JanusModel.init`` for the same config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("safetensors.torch")
pytest.importorskip("torch")

from ospo_tpu.models import janus as janus_lib
from ospo_tpu.models import synthetic, weights


def test_tiny_synthetic_checkpoint_round_trips(tmp_path):
    cfg = janus_lib.tiny_janus_config()
    path = synthetic.write_synthetic_checkpoint(str(tmp_path / "ckpt"), cfg)

    model = weights.load_janus(path, cfg=cfg, use_cache=False)
    ref = janus_lib.JanusModel.init(cfg, seed=0)

    # checkpoints carry the (unused) latent attention-pool head; init does
    # not create it — port keeps it for capability completeness
    assert "attn_pool" in model.params["vision_model"]
    params = dict(model.params)
    params["vision_model"] = {
        k: v for k, v in model.params["vision_model"].items()
        if k != "attn_pool"
    }
    ported = jax.tree.leaves_with_path(params)
    expect = jax.tree.leaves_with_path(ref.params)
    assert [p for p, _ in ported] == [p for p, _ in expect]
    for (p, a), (_, b) in zip(ported, expect):
        assert a.shape == b.shape, (p, a.shape, b.shape)

    # values must be finite and non-degenerate
    flat = jax.tree.leaves(model.params)
    assert all(bool(jnp.isfinite(x).all()) for x in flat)
    big = [x for x in flat if x.size > 1024]
    assert any(float(jnp.std(x.astype(jnp.float32))) > 0 for x in big)


def test_synthetic_checkpoint_loads_via_cache(tmp_path):
    cfg = janus_lib.tiny_janus_config()
    path = synthetic.write_synthetic_checkpoint(str(tmp_path / "ckpt"), cfg)
    m1 = weights.load_janus(path, cfg=cfg, use_cache=True)   # writes cache
    m2 = weights.load_janus(path, cfg=cfg, use_cache=True)   # reads cache
    for a, b in zip(jax.tree.leaves(m1.params), jax.tree.leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
