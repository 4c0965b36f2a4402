"""Decode-attention kernel vs the XLA reference (interpret mode).
Caches are batch-minor [L, S, H, B, dh] (llama.init_kv_cache 'shbd'),
scales layout-matched [L, S, H, B]."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ospo_tpu.ops.attention import xla_attention
from ospo_tpu.ops.decode_attention import decode_attention


def make_case(quantized, L=3, B=2, S=256, H=4, dh=128, cur=170, li=1, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (B, 1, H, dh), jnp.float32)
    kc = jax.random.normal(ks[1], (L, S, H, B, dh), jnp.float32)
    vc = jax.random.normal(ks[2], (L, S, H, B, dh), jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[1, :5] = 0  # left padding
    mask = jnp.asarray(mask)

    if quantized:
        from ospo_tpu.models.llama import _quantize_rows

        kq, ksc = _quantize_rows(kc)   # scales [L, S, H, B]
        vq, vsc = _quantize_rows(vc)
        return q, kq, vq, ksc, vsc, mask, cur, li, kc, vc
    return q, kc, vc, None, None, mask, cur, li, kc, vc


@pytest.mark.parametrize("quantized", [False, True])
def test_decode_attention_matches_xla(quantized):
    q, kc, vc, ksc, vsc, mask, cur, li, kc_f, vc_f = make_case(quantized)
    out = decode_attention(q, kc, vc, li, cur, mask,
                           k_scale=ksc, v_scale=vsc, interpret=True)

    # reference: dense attention over the populated prefix of layer li
    window = np.asarray(mask).copy()
    window[:, cur:] = 0
    if quantized:
        k_ref = (np.asarray(kc[li], np.float32)
                 * np.asarray(ksc[li])[..., None])     # [S, H, B, dh]
        v_ref = (np.asarray(vc[li], np.float32)
                 * np.asarray(vsc[li])[..., None])
    else:
        k_ref, v_ref = np.asarray(kc[li]), np.asarray(vc[li])
    ref = xla_attention(q, jnp.asarray(k_ref), jnp.asarray(v_ref),
                        jnp.asarray(window), q_offset=cur - 1, causal=True,
                        kv_layout="shbd")

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_decode_attention_quantized_cache_dict_roundtrip():
    """The kernel consumes exactly what llama's shbd decode loop writes:
    int8 payload [L,S,H,B,dh] + scales [L,S,H,B]."""
    q, kq, vq, ksc, vsc, mask, cur, li, kc_f, vc_f = make_case(True, seed=3)
    out = decode_attention(q, kq, vq, li, cur, mask,
                           k_scale=ksc, v_scale=vsc, interpret=True)
    window = np.asarray(mask).copy()
    window[:, cur:] = 0
    # xla_attention's quantized-dict path with shbd scales transposed to
    # [B, H, S] — the same read path llama's non-kernel branch uses
    k_att = {"q": kq[li], "s": jnp.transpose(ksc[li], (2, 1, 0))}
    v_att = {"q": vq[li], "s": jnp.transpose(vsc[li], (2, 1, 0))}
    ref = xla_attention(q, k_att, v_att, jnp.asarray(window),
                        q_offset=cur - 1, causal=True, kv_layout="shbd")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_engine_decode_kernel_parity():
    """Full image-engine decode with the Pallas kernel (interpret mode on
    CPU) must produce identical tokens to the XLA cache path."""
    from ospo_tpu.engine.image_engine import ImageGenEngine
    from ospo_tpu.image_processing import ImageProcessor
    from ospo_tpu.models import janus
    from ospo_tpu.processing import Processor, t2i_prompt
    from ospo_tpu.tokenizer import ByteTokenizer
    import dataclasses

    cfg = janus.tiny_janus_config()
    # decode kernel wants lane-aligned head dims
    cfg = dataclasses.replace(
        cfg, language=dataclasses.replace(cfg.language, hidden_size=512,
                                          num_heads=4))
    model = janus.JanusModel.init(cfg, seed=0)
    tok = ByteTokenizer(vocab_size=cfg.language.vocab_size)
    proc = Processor(tok, ImageProcessor(image_size=16), num_image_tokens=4)
    prompts = [t2i_prompt(proc, "A cat")]

    ref_eng = ImageGenEngine(model, proc, image_token_num=8, img_size=16,
                             patch_size=4)
    kern_eng = ImageGenEngine(model, proc, image_token_num=8, img_size=16,
                              patch_size=4, decode_kernel=True)
    ref = ref_eng.generate_tokens(prompts, seed=0)
    out = kern_eng.generate_tokens(prompts, seed=0)
    np.testing.assert_array_equal(ref, out)


def test_engine_decode_kernel_parity_int8_kv():
    """Kernel path with the int8 KV cache == XLA path with the int8 KV
    cache (same quantization, different attention implementation)."""
    from ospo_tpu.engine.image_engine import ImageGenEngine
    from ospo_tpu.image_processing import ImageProcessor
    from ospo_tpu.models import janus
    from ospo_tpu.processing import Processor, t2i_prompt
    from ospo_tpu.tokenizer import ByteTokenizer
    import dataclasses

    cfg = janus.tiny_janus_config()
    cfg = dataclasses.replace(
        cfg, language=dataclasses.replace(cfg.language, hidden_size=512,
                                          num_heads=4))
    model = janus.JanusModel.init(cfg, seed=0)
    tok = ByteTokenizer(vocab_size=cfg.language.vocab_size)
    proc = Processor(tok, ImageProcessor(image_size=16), num_image_tokens=4)
    prompts = [t2i_prompt(proc, "A dog")]

    ref_eng = ImageGenEngine(model, proc, image_token_num=8, img_size=16,
                             patch_size=4, kv_quant=True, kv_layout="shbd")
    kern_eng = ImageGenEngine(model, proc, image_token_num=8, img_size=16,
                              patch_size=4, kv_quant=True, decode_kernel=True)
    ref = ref_eng.generate_tokens(prompts, seed=0)
    out = kern_eng.generate_tokens(prompts, seed=0)
    np.testing.assert_array_equal(ref, out)


def test_decode_attention_ignores_tail():
    """Values beyond cur_len must not influence the output."""
    q, kc, vc, _, _, mask, cur, li, *_ = make_case(False)
    out1 = decode_attention(q, kc, vc, li, cur, mask, interpret=True)
    kc2 = kc.at[:, cur:].set(99.0)
    vc2 = vc.at[:, cur:].set(-99.0)
    out2 = decode_attention(q, kc2, vc2, li, cur, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
