"""int8 KV cache: decode equivalence with the bf16 cache within
quantization tolerance, and exact prefill/self-attention parity."""

import numpy as np
import jax
import jax.numpy as jnp

from ospo_tpu.models import llama


def run_decode(cfg, params, quantized):
    rng = np.random.default_rng(0)
    b, t_prompt, n_new, smax = 2, 8, 6, 32
    ids = rng.integers(0, cfg.vocab_size, (b, t_prompt + n_new))
    mask = np.ones((b, t_prompt + n_new), np.int64)

    x = llama.embed_tokens(params, jnp.asarray(ids))
    pos = llama.positions_from_mask(jnp.asarray(mask))
    cache = llama.init_kv_cache(cfg, b, smax, quantized=quantized)
    window = np.zeros((b, smax), np.int64)
    window[:, :t_prompt] = 1

    h, cache = llama.forward(
        params, cfg, x[:, :t_prompt], jnp.asarray(mask[:, :t_prompt]),
        pos[:, :t_prompt], kv_cache=cache, self_attn=True,
    )
    outs = [np.asarray(h[:, -1])]
    for step in range(t_prompt, t_prompt + n_new):
        window[:, step] = 1
        h, cache = llama.forward(
            params, cfg, x[:, step:step + 1], jnp.asarray(window),
            pos[:, step:step + 1], kv_cache=cache,
        )
        outs.append(np.asarray(h[:, 0]))
    return np.stack(outs)


def test_kv_quant_decode_close_to_bf16():
    cfg = llama.tiny_config(hidden_size=128, intermediate_size=256, num_heads=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ref = run_decode(cfg, params, quantized=False)
    out = run_decode(cfg, params, quantized=True)
    # prefill output identical (self-attention path doesn't read the cache)
    np.testing.assert_allclose(out[0], ref[0], atol=1e-5)
    # decode steps within int8-KV tolerance
    rel = np.abs(out[1:] - ref[1:]).mean() / np.abs(ref[1:]).mean()
    assert rel < 0.05, rel


def test_kv_int4_decode_close_to_bf16():
    """int4 nibble-packed KV (llama._quantize_rows_int4): same machinery,
    looser tolerance (15 levels/row)."""
    cfg = llama.tiny_config(hidden_size=128, intermediate_size=256, num_heads=4)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ref = run_decode(cfg, params, quantized=False)
    out = run_decode(cfg, params, quantized="int4")
    np.testing.assert_allclose(out[0], ref[0], atol=1e-5)
    rel = np.abs(out[1:] - ref[1:]).mean() / np.abs(ref[1:]).mean()
    assert rel < 0.15, rel


def test_quantize_rows_int4_roundtrip():
    """pack → unpack → dequant reproduces values within half a level
    (head-pair packing: byte j = heads (j, j + H/2))."""
    from ospo_tpu.ops.attention import unpack_int4

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 16), jnp.float32)
    packed, s = llama._quantize_rows_int4(x)
    assert packed.shape == (2, 3, 2, 16) and packed.dtype == jnp.int8
    assert s.shape == (2, 3, 4)
    low, high = unpack_int4(packed)
    deq = np.concatenate([np.asarray(low), np.asarray(high)], axis=-2) \
        * np.asarray(s)[..., None]
    err = np.abs(deq - np.asarray(x))
    assert (err <= np.asarray(s)[..., None] / 2 + 1e-6).all()


def test_xla_attention_int4_matches_dequantized():
    """The int4 dict path of xla_attention must equal attention over the
    manually dequantised cache exactly (machinery, not quantization)."""
    from ospo_tpu.ops.attention import unpack_int4, xla_attention

    B, T, H, S, dh = 2, 1, 4, 24, 16
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (B, T, H, dh), jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[1, :3] = 0
    # quantize in [B, S, H, dh] (head axis -2, as llama does pre-perm),
    # then transpose payload+scales into each cache layout
    kf = jax.random.normal(ks[1], (B, S, H, dh), jnp.float32)
    vf = jax.random.normal(ks[2], (B, S, H, dh), jnp.float32)
    kq0, ksc0 = llama._quantize_rows_int4(kf)   # [B,S,H/2,dh], [B,S,H]
    vq0, vsc0 = llama._quantize_rows_int4(vf)

    def deq0(p, s):
        low, high = unpack_int4(p)
        return jnp.concatenate([low, high], axis=-2).astype(
            jnp.float32) * s[..., None]          # [B,S,H,dh]

    for layout, pperm in (("bshd", None), ("bhsd", (0, 2, 1, 3)),
                          ("shbd", (1, 2, 0, 3))):
        tp = (lambda a: jnp.transpose(a, pperm)) if pperm else (lambda a: a)
        # scales to xla_attention's [B, H, S] convention
        sc_k = jnp.transpose(ksc0, (0, 2, 1))
        sc_v = jnp.transpose(vsc0, (0, 2, 1))
        out = xla_attention(q, {"q4": tp(kq0), "s": sc_k},
                            {"q4": tp(vq0), "s": sc_v},
                            jnp.asarray(mask), q_offset=S - 1, causal=True,
                            kv_layout=layout)
        ref = xla_attention(q, tp(deq0(kq0, ksc0)), tp(deq0(vq0, vsc0)),
                            jnp.asarray(mask), q_offset=S - 1, causal=True,
                            kv_layout=layout)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"layout={layout}")
