"""Flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ospo_tpu.ops.attention import xla_attention
from ospo_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("t,s_extra", [(128, 0), (200, 0)])
@pytest.mark.parametrize("causal", [True, False])
def test_flash_matches_xla(t, s_extra, causal):
    key = jax.random.PRNGKey(0)
    b, h, d = 2, 4, 128
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, t + s_extra, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, t + s_extra, h, d), jnp.float32)
    # left-padding: first rows of batch row 1 invalid
    mask = np.ones((b, t + s_extra), np.int32)
    mask[1, :7] = 0
    mask = jnp.asarray(mask)

    ref = xla_attention(q, k, v, mask, q_offset=0, causal=causal)
    out = flash_attention(q, k, v, mask=mask, causal=causal,
                          blk_q=128, blk_k=128, interpret=True)
    # padded query rows of the flash kernel are defined as 0; compare valid rows
    valid_q = np.asarray(mask[:, :t], bool)
    np.testing.assert_allclose(
        np.asarray(out)[valid_q], np.asarray(ref)[valid_q], atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("causal", [True, False])
def test_flash_backward_matches_xla(causal):
    """Custom-VJP flash gradients ≡ autodiff through the XLA reference."""
    key = jax.random.PRNGKey(7)
    b, t, h, d = 2, 160, 2, 128
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, t, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, t, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, t, h, d), jnp.float32)
    mask = np.ones((b, t), np.int32)
    mask[0, :9] = 0
    mask = jnp.asarray(mask)
    cotangent = jax.random.normal(kg, (b, t, h, d), jnp.float32)
    # zero the cotangent on padded query rows (their outputs are garbage by
    # construction in both impls, and defined differently)
    cotangent = cotangent * mask[:, :, None, None]

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, mask=mask, causal=causal,
                              blk_q=128, blk_k=128, interpret=True)
        return jnp.sum(out * cotangent)

    def loss_xla(q, k, v):
        out = xla_attention(q, k, v, mask, q_offset=0, causal=causal)
        return jnp.sum(out * cotangent)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=3e-4, rtol=3e-4,
            err_msg=f"d{name}",
        )


def test_fully_masked_rows_are_finite():
    b, t, h, d = 1, 128, 2, 128
    q = jnp.ones((b, t, h, d))
    k = jnp.ones((b, t, h, d))
    v = jnp.ones((b, t, h, d))
    mask = jnp.zeros((b, t), jnp.int32)
    out = flash_attention(q, k, v, mask=mask, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_flash_dispatch_rejects_nonzero_offset():
    """impl='flash' has no q_offset notion (row-local j<=i causality) —
    a nonzero or traced offset must error, not silently hide the prefix."""
    from ospo_tpu.ops.attention import attention

    q = jnp.zeros((1, 8, 2, 128), jnp.float32)
    k = jnp.zeros((1, 8, 2, 128), jnp.float32)
    v = jnp.zeros((1, 8, 2, 128), jnp.float32)
    with pytest.raises(ValueError, match="q_offset"):
        attention(q, k, v, q_offset=4, impl="flash")
    with pytest.raises(ValueError, match="q_offset"):
        attention(q, k, v, q_offset=jnp.int32(0), impl="flash")  # traced


def test_parse_kv_quant_spellings():
    from ospo_tpu.ops.quant import parse_kv_quant

    assert parse_kv_quant("bf16") is False     # documented 'off' spelling
    assert parse_kv_quant(True) == "int8"
    assert parse_kv_quant("int4") == "int4"
    with pytest.raises(ValueError):
        parse_kv_quant("INT_8")


def test_text_engine_validates_kv_quant():
    """Direct construction must validate spellings too, not only
    from_generation_config (CLAUDE.md loud-validation convention)."""
    from ospo_tpu.engine.text_engine import TextGenEngine

    with pytest.raises(ValueError):
        TextGenEngine(None, None, kv_quant="INT_4")
