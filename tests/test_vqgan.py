"""VQ-GAN: shape contracts, codebook roundtrip, quantizer math."""

import jax
import jax.numpy as jnp
import numpy as np

from ospo_tpu.models import vqgan


def test_encode_decode_shapes():
    cfg = vqgan.tiny_vq_config()  # ch_mult (1,2) → 2× downsample
    params = vqgan.init_params(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    z_q, ids = vqgan.encode(params, cfg, x)
    assert ids.shape == (2, 8, 8)
    assert z_q.shape == (2, 8, 8, cfg.codebook_dim)
    out = vqgan.decode_code(params, cfg, ids.reshape(2, -1))
    assert out.shape == (2, 16, 16, 3)


def test_full_vq16_downsample_factor():
    cfg = vqgan.VQ_16
    assert cfg.downsample_factor == 16  # 384 → 24×24 = 576 tokens


def test_quantize_picks_nearest_and_roundtrips():
    cfg = vqgan.tiny_vq_config(codebook_size=16, codebook_dim=4)
    params = vqgan.init_params(cfg, jax.random.PRNGKey(0))
    cb = np.asarray(vqgan.normalized_codebook(params, cfg))
    z = jnp.asarray(cb[[3, 7, 11]].reshape(1, 3, 1, 4) * 2.0)  # scaled copies
    z_q, ids = vqgan.quantize(params, cfg, z)
    # l2-normalised lookup → scaling must not change the chosen code
    np.testing.assert_array_equal(np.asarray(ids).ravel(), [3, 7, 11])
    np.testing.assert_allclose(np.asarray(z_q).reshape(3, 4), cb[[3, 7, 11]],
                               atol=1e-6)


def test_encode_to_ids_flat():
    cfg = vqgan.tiny_vq_config()
    params = vqgan.init_params(cfg, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    ids = vqgan.encode_to_ids(params, cfg, x)
    assert ids.shape == (2, 64)
    assert int(ids.max()) < cfg.codebook_size
