"""Shared-prefix text decode: the few-shot template prefix of a prompt
batch is prefilled ONCE (B=1) and read as a batch-shared attention
segment — exact math vs the plain per-row path (joint softmax over
[prefix ++ own] scores).  Parity/fallback/sharding coverage for
``TextGenEngine._generate_shared`` and ``llama.forward(prefix_kv=...)``.

Reference bar: HF ``generate`` recomputes and stores the full prompt KV
per batch row (``ospo/wrapper/text_generation.py:63-81``); the shared
segment is TPU-side HBM engineering with no reference equivalent.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ospo_tpu.engine.text_engine import TextGenEngine
from ospo_tpu.image_processing import ImageProcessor
from ospo_tpu.models import janus
from ospo_tpu.parallel import mesh as mesh_lib
from ospo_tpu.processing import Processor
from ospo_tpu.tokenizer import ByteTokenizer

COMMON = ("You are given an object and must produce three contrastive "
          "prompts, as shown in the following few-shot examples: ")


@pytest.fixture(scope="module")
def setup():
    cfg = janus.tiny_janus_config()
    model = janus.JanusModel.init(cfg, seed=0)
    tok = ByteTokenizer(vocab_size=cfg.language.vocab_size)
    proc = Processor(tok, ImageProcessor(image_size=16), num_image_tokens=4)
    return cfg, model, proc


def _engines(model, proc, **kw):
    shared = TextGenEngine(model, proc, shared_prefix=True, **kw)
    plain = TextGenEngine(model, proc, shared_prefix=False, **kw)
    return shared, plain


def test_greedy_parity_bf16(setup):
    """Shared-prefix greedy tokens ≡ plain-path greedy tokens (the joint
    softmax is the same math, so greedy decode must agree exactly on the
    f32 tiny model)."""
    _, model, proc = setup
    shared, plain = _engines(model, proc, max_new_tokens=8, do_sample=False)
    prompts = [COMMON + "a red apple on a table",
               COMMON + "two dogs",
               COMMON + "an umbrella in the rain"]
    assert shared.signature_for(prompts)[0] == "shared"
    np.testing.assert_array_equal(shared.generate_ids(prompts, seed=0),
                                  plain.generate_ids(prompts, seed=0))


def test_greedy_parity_int8_cache(setup):
    """int8 own-cache: the shared path quantizes only tail+generated rows
    (the prefix stays bf16 — strictly more accurate); greedy tokens still
    match the plain path on the tiny model."""
    _, model, proc = setup
    shared, plain = _engines(model, proc, max_new_tokens=8, do_sample=False,
                             kv_quant="int8")
    prompts = [COMMON + "a red apple", COMMON + "two dogs in the park"]
    np.testing.assert_array_equal(shared.generate_ids(prompts, seed=0),
                                  plain.generate_ids(prompts, seed=0))


def test_greedy_parity_int4_cache(setup):
    """int4 head-pair-packed own cache composes with the bf16 shared
    segment (the prefix concat rides the score axis, so the nibble-packed
    head order is unaffected)."""
    _, model, proc = setup
    shared, plain = _engines(model, proc, max_new_tokens=6, do_sample=False,
                             kv_quant="int4")
    prompts = [COMMON + "a red apple", COMMON + "two dogs"]
    np.testing.assert_array_equal(shared.generate_ids(prompts, seed=0),
                                  plain.generate_ids(prompts, seed=0))


def test_identical_prompts_step1_pattern(setup):
    """Step 1 batches the SAME prompt B times (sampling provides the
    diversity): common prefix = all-but-last-token; deterministic per
    seed, varies across seeds."""
    _, model, proc = setup
    eng = TextGenEngine(model, proc, max_new_tokens=6, do_sample=True,
                        shared_prefix=True)
    same = [COMMON + "generate an object list"] * 3
    assert eng.signature_for(same)[0] == "shared"
    o1 = eng.generate_ids(same, seed=3)
    np.testing.assert_array_equal(o1, eng.generate_ids(same, seed=3))
    assert not np.array_equal(o1, eng.generate_ids(same, seed=4))


def test_ragged_tails(setup):
    """Rows with very different tail lengths (one much longer than the
    common prefix bucket) left-pad into the tail bucket and still match
    the plain path."""
    _, model, proc = setup
    shared, plain = _engines(model, proc, max_new_tokens=6, do_sample=False)
    prompts = [COMMON + "a", COMMON + "b" * 150]
    np.testing.assert_array_equal(shared.generate_ids(prompts, seed=0),
                                  plain.generate_ids(prompts, seed=0))


def test_short_prefix_falls_back_to_plain(setup):
    """Prompts sharing <SHARED_PREFIX_MIN common tokens run the plain
    program (the B=1 prefill overhead isn't worth it)."""
    _, model, proc = setup
    eng = TextGenEngine(model, proc, max_new_tokens=4, do_sample=False)
    prompts = ["hello world", "hi there"]
    assert eng._shared_split(prompts) is None
    assert eng.signature_for(prompts)[0] == "plain"
    out = eng.generate_ids(prompts, seed=0)
    assert out.shape == (2, 4)


def test_singleton_batch_falls_back(setup):
    _, model, proc = setup
    eng = TextGenEngine(model, proc, max_new_tokens=4, do_sample=False)
    assert eng._shared_split([COMMON + "one prompt"]) is None


def test_prewarm_shared_is_transparent(setup):
    """prewarm on a shared signature AOT-compiles the same program
    generate_ids dispatches to (outputs unchanged)."""
    _, model, proc = setup
    eng = TextGenEngine(model, proc, max_new_tokens=4, do_sample=False,
                        shared_prefix=True)
    prompts = [COMMON + "a red apple", COMMON + "two dogs"]
    ref = eng.generate_ids(prompts, seed=0)
    eng2 = TextGenEngine(model, proc, max_new_tokens=4, do_sample=False,
                         shared_prefix=True)
    n = eng2.prewarm([eng2.signature_for(prompts)])
    assert n == 1
    np.testing.assert_array_equal(eng2.generate_ids(prompts, seed=0), ref)


def test_shared_prefix_sharded_matches_single_device(setup):
    """dp×tp mesh: the shared-prefix program (replicated prefix, tails
    sharded on 'data') produces the same tokens as single-device."""
    _, model, proc = setup
    eng = TextGenEngine(model, proc, max_new_tokens=6, do_sample=False,
                        shared_prefix=True)
    prompts = [COMMON + f"object number {i}" for i in range(4)]
    ref = eng.generate_ids(prompts, seed=0)

    mesh = mesh_lib.create_mesh(n_devices=8, model_parallel=2)
    sh_params = mesh_lib.shard_janus_params(model.params, mesh)
    sh_model = janus.JanusModel(cfg=model.cfg, params=sh_params)
    eng_sh = TextGenEngine(sh_model, proc, max_new_tokens=6,
                           do_sample=False, shared_prefix=True, mesh=mesh)
    with mesh:
        out = eng_sh.generate_ids(prompts, seed=0)
    np.testing.assert_array_equal(out, ref)


def test_forward_prefix_kv_matches_materialized(setup):
    """llama-level invariant: forward(tail, prefix_kv=P) produces the
    same hidden states as one self-attention prefill over the
    materialized [prefix ++ tail] sequence (per-row), for B rows sharing
    the prefix."""
    from ospo_tpu.models import llama

    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(1))
    B, C, T = 3, 16, 5
    key = jax.random.PRNGKey(2)
    prefix_embeds = jax.random.normal(key, (1, C, cfg.hidden_size))
    tails = jax.random.normal(jax.random.fold_in(key, 1),
                              (B, T, cfg.hidden_size))

    # path A: plain prefill over [prefix ++ tail] per row
    full = jnp.concatenate([jnp.tile(prefix_embeds, (B, 1, 1)), tails], 1)
    mask_a = jnp.ones((B, C + T), jnp.int32)
    pos_a = llama.positions_from_mask(mask_a)
    hidden_a, _ = llama.forward(params, cfg, full, mask_a, pos_a)

    # path B: B=1 prefix prefill → batch-shared segment → tail forward
    pkv = llama.init_kv_cache(cfg, 1, C)
    pmask = jnp.ones((1, C), jnp.int32)
    _, pkv = llama.forward(params, cfg, prefix_embeds, pmask,
                           llama.positions_from_mask(pmask),
                           kv_cache=pkv, self_attn=True)
    prefix = {"k": pkv["k"][:, 0], "v": pkv["v"][:, 0], "mask": pmask}
    kv = llama.init_kv_cache(cfg, B, T)
    mask_b = jnp.ones((B, T), jnp.int32)
    pos_b = C + llama.positions_from_mask(mask_b)
    hidden_b, _ = llama.forward(params, cfg, tails, mask_b, pos_b,
                                kv_cache=kv, self_attn=True,
                                prefix_kv=prefix)
    np.testing.assert_allclose(np.asarray(hidden_b),
                               np.asarray(hidden_a[:, C:]),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("layout", ["bshd", "shbd", "bhsd"])
@pytest.mark.parametrize("quant", [False, "int8"])
def test_prefix_kv_layout_window_matrix(setup, layout, quant):
    """prefix_kv composes with every cache layout, int8 quantization and
    a truncated attention window — decode-step hidden states match the
    materialized full forward (generality pin for future engine users,
    e.g. a shared-prefix scoring prefill on the shbd cache)."""
    from ospo_tpu.models import llama

    cfg = llama.tiny_config()
    params = llama.init_params(cfg, jax.random.PRNGKey(1))
    B, C, T = 2, 8, 4
    key = jax.random.PRNGKey(2)
    pe = jax.random.normal(key, (1, C, cfg.hidden_size))
    tails = jax.random.normal(jax.random.fold_in(key, 1),
                              (B, T, cfg.hidden_size))
    step_tok = jax.random.normal(jax.random.fold_in(key, 2),
                                 (B, 1, cfg.hidden_size))

    full = jnp.concatenate([jnp.tile(pe, (B, 1, 1)), tails, step_tok], 1)
    m = jnp.ones((B, C + T + 1), jnp.int32)
    h_ref, _ = llama.forward(params, cfg, full, m,
                             llama.positions_from_mask(m))
    ref_last = np.asarray(h_ref[:, -1])

    for W in [None, T + 1]:
        pkv = llama.init_kv_cache(cfg, 1, C)
        pm = jnp.ones((1, C), jnp.int32)
        _, pkv = llama.forward(params, cfg, pe, pm,
                               llama.positions_from_mask(pm),
                               kv_cache=pkv, self_attn=True)
        prefix = {"k": pkv["k"][:, 0], "v": pkv["v"][:, 0], "mask": pm}
        kv = llama.init_kv_cache(cfg, B, T + 2, quantized=quant,
                                 layout=layout)
        tm = jnp.ones((B, T), jnp.int32)
        _, kv = llama.forward(params, cfg, tails, tm,
                              C + llama.positions_from_mask(tm),
                              kv_cache=kv, self_attn=True,
                              cache_layout=layout, prefix_kv=prefix)
        wm = jnp.ones((B, T + 2), jnp.int32)
        if W is not None:
            wm = wm[:, :W]  # window callers truncate the mask (image engine)
        pos = jnp.full((B, 1), C + T, jnp.int32)
        h, kv = llama.forward(params, cfg, step_tok, wm, pos, kv_cache=kv,
                              cache_layout=layout, prefix_kv=prefix,
                              attn_window=W)
        err = np.abs(np.asarray(h[:, -1]) - ref_last).max()
        assert err < (2e-4 if quant else 1e-5), (layout, quant, W, err)


def test_env_override_disables(setup, monkeypatch):
    monkeypatch.setenv("OSPO_SHARED_PREFIX", "0")
    _, model, proc = setup
    eng = TextGenEngine(model, proc, max_new_tokens=4)
    assert not eng.shared_prefix
    assert eng._shared_split([COMMON + "a", COMMON + "b"]) is None
