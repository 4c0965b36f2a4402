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


def test_param_cache_preserves_structure(tmp_path):
    """Treedef equality — leaves-only comparison missed empty containers
    ('attn': [] in VQ-GAN levels) silently vanishing through the flat-npz
    round-trip, which crashed decoder_forward with KeyError 'attn'."""
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
    m1 = weights.load_janus(ckpt, cfg)            # ports + writes cache
    m2 = weights.load_janus(ckpt, cfg)            # loads cache
    t1 = jax.tree.structure(m1.params)
    t2 = jax.tree.structure(m2.params)
    assert t1 == t2, f"cache round-trip changed the tree structure:\n{t1}\nvs\n{t2}"
    # and the cache-loaded VQ decoder must actually run
    ids = jnp.zeros((1, 4), jnp.int32)
    out = vqgan_lib.decode_code(m2.params["gen_vision_model"], cfg.vq, ids,
                                latent_hw=(2, 2))
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_flatten_roundtrips_empty_containers():
    from ospo_tpu.train.checkpoint import _flatten, _unflatten

    tree = {"a": {"attn": [], "res": [np.ones((2,))]},
            "b": [], "c": {}, "d": np.zeros((1,))}
    rt = _unflatten(_flatten(tree))
    assert rt["a"]["attn"] == []
    assert rt["b"] == []
    assert rt["c"] == {}
    np.testing.assert_array_equal(rt["a"]["res"][0], np.ones((2,)))
