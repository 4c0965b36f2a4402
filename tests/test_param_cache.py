"""Ported-parameter cache: second from_pretrained load must bypass the
state-dict mapping and produce identical (incl. bf16) parameters."""

import numpy as np
import jax
import jax.numpy as jnp

from ospo_tpu.models import weights


def test_param_cache_roundtrip(tmp_path):
    import dataclasses

    from tests.test_weights_roundtrip import make_fake_checkpoint
    from ospo_tpu.models import janus as janus_lib
    from ospo_tpu.models import vit as vit_lib
    from ospo_tpu.models import vqgan as vqgan_lib

    ckpt, _, lcfg = make_fake_checkpoint(tmp_path)
    cfg = janus_lib.JanusConfig(
        language=dataclasses.replace(lcfg, dtype=jnp.bfloat16),
        vision=vit_lib.ViTConfig(image_size=32, patch_size=16, width=32,
                                 layers=2, heads=2, select_layer=-1,
                                 dtype=jnp.bfloat16),
        vq=vqgan_lib.tiny_vq_config(),
        gen_embed_dim=8, image_token_size=64, gen_image_size=16,
        dtype=jnp.bfloat16,
    )
    m1 = weights.load_janus(ckpt, cfg)            # writes the cache
    import os

    assert os.path.isfile(os.path.join(ckpt, "ported_params.npz"))
    m2 = weights.load_janus(ckpt, cfg)            # reads the cache

    flat1 = jax.tree.leaves(m1.params)
    flat2 = jax.tree.leaves(m2.params)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
