"""Engine tests on the tiny Janus model: shapes, determinism, EOS stop,
CFG math, processor roundtrips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ospo_tpu.engine.image_engine import ImageGenEngine
from ospo_tpu.engine.text_engine import TextGenEngine
from ospo_tpu.image_processing import ImageProcessor
from ospo_tpu.models import janus
from ospo_tpu.processing import Processor, t2i_prompt
from ospo_tpu.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = janus.tiny_janus_config()
    model = janus.JanusModel.init(cfg, seed=0)
    tok = ByteTokenizer(vocab_size=cfg.language.vocab_size)
    proc = Processor(tok, ImageProcessor(image_size=16), num_image_tokens=4)
    return cfg, model, proc


def test_text_engine_generates(setup):
    cfg, model, proc = setup
    eng = TextGenEngine(model, proc, max_new_tokens=8, temperature=1.0)
    outs = eng.generate_ids(["hello world", "a"], seed=0)
    assert outs.shape == (2, 8)
    assert outs.dtype == np.int32
    # determinism for a fixed seed
    outs2 = eng.generate_ids(["hello world", "a"], seed=0)
    np.testing.assert_array_equal(outs, outs2)
    outs3 = eng.generate_ids(["hello world", "a"], seed=1)
    assert not np.array_equal(outs, outs3)


def test_text_engine_greedy_matches_nocache_argmax(setup):
    """Greedy decode through the KV cache must equal step-by-step argmax
    through full forwards (cache-consistency end to end)."""
    cfg, model, proc = setup
    eng = TextGenEngine(model, proc, max_new_tokens=4, do_sample=False)
    prompts = ["abc", "hello"]
    out = eng.generate_ids(prompts, seed=0)

    from ospo_tpu.models import llama
    for bi, p in enumerate(prompts):
        ids = list(proc.tokenizer.encode(p))
        gen = []
        for _ in range(4):
            x = janus.embed_text(model.params, jnp.asarray([ids]))
            mask = jnp.ones((1, len(ids)), jnp.int32)
            pos = llama.positions_from_mask(mask)
            hidden, _ = janus.language_forward(model.params, cfg, x, mask, pos)
            logits = janus.lm_logits(model.params, hidden[:, -1:, :])[:, 0]
            nxt = int(jnp.argmax(logits, -1)[0])
            gen.append(nxt)
            if nxt == proc.tokenizer.eos_id:
                break
            ids.append(nxt)
        expect = gen + [proc.tokenizer.eos_id] * (4 - len(gen))
        np.testing.assert_array_equal(out[bi], expect)


def test_image_engine_token_shapes(setup):
    cfg, model, proc = setup
    eng = ImageGenEngine(model, proc, cfg_weight=5.0, temperature=1.0,
                         image_token_num=16, img_size=16, patch_size=4)
    prompts = [t2i_prompt(proc, "A black umbrella"),
               t2i_prompt(proc, "A red moon")]
    toks = eng.generate_tokens(prompts, seed=0)
    assert toks.shape == (2, 16)
    assert toks.max() < cfg.image_token_size
    # deterministic per seed
    np.testing.assert_array_equal(toks, eng.generate_tokens(prompts, seed=0))
    assert not np.array_equal(toks, eng.generate_tokens(prompts, seed=1))


def test_image_engine_segmented_decode_invariant(setup):
    """Token output must be identical regardless of decode segmentation
    (windows only truncate reads of unpopulated cache rows)."""
    cfg, model, proc = setup
    prompts = [t2i_prompt(proc, "A black umbrella")]
    outs = []
    for n_seg in (1, 4):
        eng = ImageGenEngine(model, proc, image_token_num=130, img_size=16,
                             patch_size=4, decode_segments=n_seg)
        outs.append(eng.generate_tokens(prompts, seed=3))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_image_engine_kv_quant_close(setup):
    """int8 KV decode must produce a valid token stream (distributional
    check only — quantization perturbs sampling)."""
    cfg, model, proc = setup
    prompts = [t2i_prompt(proc, "A black umbrella")]
    eng = ImageGenEngine(model, proc, image_token_num=16, img_size=16,
                         patch_size=4, kv_quant=True)
    toks = eng.generate_tokens(prompts, seed=0)
    assert toks.shape == (1, 16)
    assert int(toks.max()) < cfg.image_token_size


def test_image_engine_cfg_batch_masking(setup):
    """Uncond rows must keep BOS + final token, pad-mask the middle, and
    share the attention mask with cond rows (image_generation.py:135-141)."""
    _, model, proc = setup
    eng = ImageGenEngine(model, proc)
    prompt = t2i_prompt(proc, "A cat")
    tokens, mask = eng.build_cfg_batch([prompt])
    ids = proc.tokenizer.encode(prompt)
    t = tokens.shape[1]
    start = t - len(ids)
    np.testing.assert_array_equal(tokens[0, start:], ids)
    assert tokens[1, start] == ids[0]            # BOS kept
    assert tokens[1, t - 1] == ids[-1]           # <begin_of_image> kept
    assert (tokens[1, start + 1:t - 1] == proc.pad_id).all()
    np.testing.assert_array_equal(mask[0], mask[1])


def test_processor_image_expansion(setup):
    _, model, proc = setup
    out = proc.process_one(
        conversations=[
            {"role": "<|User|>", "content": "<image_placeholder>\nWhat?"},
            {"role": "<|Assistant|>", "content": ""},
        ],
        images=[],
    )
    ids = out.input_ids.tolist()
    assert ids.count(proc.image_id) == proc.num_image_tokens
    i0 = ids.index(proc.image_id)
    assert ids[i0 - 1] == proc.image_start_id
    assert ids[i0 + proc.num_image_tokens] == proc.image_end_id


def test_image_engine_kv_layout_invariant(setup):
    """Token output must be identical across KV-cache layouts (bshd /
    bhsd / shbd are pure memory-order choices; llama.init_kv_cache)."""
    cfg, model, proc = setup
    prompts = [t2i_prompt(proc, "A black umbrella"), t2i_prompt(proc, "dog")]
    for quant in (False, True):
        outs = []
        for layout in ("bshd", "bhsd", "shbd"):
            eng = ImageGenEngine(model, proc, image_token_num=8, img_size=16,
                                 patch_size=4, kv_quant=quant,
                                 kv_layout=layout)
            outs.append(eng.generate_tokens(prompts, seed=5))
        np.testing.assert_array_equal(outs[0], outs[1])
        np.testing.assert_array_equal(outs[0], outs[2])


def test_image_engine_fast_decode_parity(setup, monkeypatch):
    """The optional copy-free decode path (OSPO_FAST_DECODE=1: cache as
    scan xs + score-level self merge, llama.forward) must produce tokens
    identical to the default carry path, across layouts and KV quant."""
    cfg, model, proc = setup
    prompts = [t2i_prompt(proc, "A black umbrella"), t2i_prompt(proc, "dog")]
    for quant in (False, True):
        for layout in ("bshd", "shbd"):
            ref_eng = ImageGenEngine(model, proc, image_token_num=8,
                                     img_size=16, patch_size=4,
                                     kv_quant=quant, kv_layout=layout)
            ref = ref_eng.generate_tokens(prompts, seed=5)
            monkeypatch.setenv("OSPO_FAST_DECODE", "1")
            fast_eng = ImageGenEngine(model, proc, image_token_num=8,
                                      img_size=16, patch_size=4,
                                      kv_quant=quant, kv_layout=layout)
            out = fast_eng.generate_tokens(prompts, seed=5)
            monkeypatch.delenv("OSPO_FAST_DECODE")
            np.testing.assert_array_equal(ref, out)


def test_text_engine_prewarm_is_transparent(setup):
    """prewarm() AOT-compiles the (B, T) signatures ahead of the data loop
    (VERDICT #10); it must not change generation results."""
    from ospo_tpu.engine.text_engine import TextGenEngine

    cfg, model, proc = setup
    prompts = ["hello world", "a much longer prompt about umbrellas"]
    ref_eng = TextGenEngine(model, proc, max_new_tokens=8, do_sample=False)
    ref = ref_eng.generate_ids(prompts, seed=3)

    eng = TextGenEngine(model, proc, max_new_tokens=8, do_sample=False)
    n = eng.prewarm([eng.signature_for(prompts)])
    assert n == 1
    out = eng.generate_ids(prompts, seed=3)
    np.testing.assert_array_equal(ref, out)


def test_image_engine_kv_int4(setup):
    """int4 KV engine path: runs across layouts with identical tokens
    (memory-order invariance holds within a quantization mode)."""
    cfg, model, proc = setup
    prompts = [t2i_prompt(proc, "A black umbrella"), t2i_prompt(proc, "dog")]
    outs = []
    for layout in ("bshd", "shbd"):
        eng = ImageGenEngine(model, proc, image_token_num=8, img_size=16,
                             patch_size=4, kv_quant="int4", kv_layout=layout)
        outs.append(eng.generate_tokens(prompts, seed=5))
    assert outs[0].shape == (2, 8)
    np.testing.assert_array_equal(outs[0], outs[1])


def test_forced_cfg_logits_matches_full_forward(setup):
    """The teacher-forced cached-decode probe (forced_cfg_logits — the
    quantization-divergence harness) must reproduce (a) a no-cache full
    teacher-forced forward's fused CFG logits and (b) the engine's own
    sampled tokens when re-sampled with the same keys."""
    from ospo_tpu.models import llama

    cfg, model, proc = setup
    eng = ImageGenEngine(
        model, proc, image_token_num=cfg.num_gen_tokens,
        img_size=cfg.gen_image_size, patch_size=cfg.vq.downsample_factor,
        batch_bucketing=False)
    prompts = [t2i_prompt(proc, "a cat"), t2i_prompt(proc, "a dog")]
    toks = eng.generate_tokens(prompts, seed=4)            # [B, n_img]
    fused = eng.forced_cfg_logits(prompts, toks)           # [B, n_img, V]

    # (a) no-cache teacher-forced forward
    tokens, mask = eng.build_cfg_batch(prompts)
    b, t_prompt = len(prompts), tokens.shape[1]
    n_img = cfg.num_gen_tokens
    text_emb = janus.embed_text(model.params, jnp.asarray(tokens))
    both = jnp.concatenate([jnp.asarray(toks)] * 2, axis=0)
    img_emb = janus.prepare_gen_img_embeds(model.params, cfg, both)
    full_emb = jnp.concatenate([text_emb, img_emb], axis=1)
    full_mask = jnp.concatenate(
        [jnp.asarray(mask), jnp.ones((2 * b, n_img), jnp.int32)], axis=1)
    pos = llama.positions_from_mask(full_mask)
    hidden, _ = janus.language_forward(
        model.params, cfg, full_emb, full_mask, pos)
    logits = janus.gen_logits(
        model.params, hidden[:, t_prompt - 1 : t_prompt + n_img - 1, :])
    ref = (logits[b:] + eng.cfg_weight * (logits[:b] - logits[b:])).astype(
        jnp.float32)
    np.testing.assert_allclose(np.asarray(ref), fused, atol=2e-3, rtol=2e-3)

    # (b) resampling the forced logits with the engine's key schedule
    # reproduces the engine's sampled tokens
    keys = jax.random.split(jax.random.PRNGKey(4), n_img)
    for i in range(n_img):
        re = jax.random.categorical(keys[i], jnp.asarray(fused[:, i]))
        np.testing.assert_array_equal(np.asarray(re), toks[:, i])


def test_text_engine_splits_on_compile_helper_crash(setup):
    """The tunneled remote-compile service crashes deterministically on
    certain shapes (HTTP 500, a per-shape backend bug — e.g. step-2b's
    dense-phase (shared, 32, 128, 1536)).  The engine must split such a
    batch in half, remember the poisoned signature so later batches
    pre-split without a doomed attempt, and keep every other error loud."""
    cfg, model, proc = setup
    eng = TextGenEngine(model, proc, max_new_tokens=4, do_sample=False)
    prompts = [f"prompt number {i}" for i in range(4)]
    ref = eng.generate_ids(prompts, seed=0)
    bad_sig = eng.signature_for(prompts)

    calls = {"n": 0}
    orig_once = type(eng)._generate_ids_once

    def crash_on_full(self, ps, rng):
        calls["n"] += 1
        if len(ps) == len(prompts):
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: http://127.0.0.1:8093/remote_compile: HTTP 500: "
                "tpu_compile_helper subprocess exit code 1")
        return orig_once(self, ps, rng)

    eng2 = TextGenEngine(model, proc, max_new_tokens=4, do_sample=False)
    eng2._generate_ids_once = crash_on_full.__get__(eng2)
    out = eng2.generate_ids(prompts, seed=0)
    assert out.shape == ref.shape
    assert bad_sig in eng2._poisoned_sigs
    n_after_first = calls["n"]          # 1 doomed + 2 halves
    assert n_after_first == 3
    # second batch of the same shape pre-splits: no new doomed attempt
    out2 = eng2.generate_ids(prompts, seed=0)
    assert calls["n"] == n_after_first + 2
    np.testing.assert_array_equal(out, out2)  # split path is deterministic
    # greedy halves must agree row-for-row with the unsplit program
    np.testing.assert_array_equal(out, ref)

    # execution OOM also splits (half the rows = half the KV cache)
    calls2 = {"n": 0}

    def oom_on_full(self, ps, rng):
        calls2["n"] += 1
        if len(ps) == len(prompts):
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)")
        return orig_once(self, ps, rng)

    eng_oom = TextGenEngine(model, proc, max_new_tokens=4, do_sample=False)
    eng_oom._generate_ids_once = oom_on_full.__get__(eng_oom)
    np.testing.assert_array_equal(eng_oom.generate_ids(prompts, seed=0), ref)
    assert eng_oom._poisoned_sigs

    # anything else stays loud
    def crash_other(self, ps, rng):
        raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: bad operand")

    eng3 = TextGenEngine(model, proc, max_new_tokens=4, do_sample=False)
    eng3._generate_ids_once = crash_other.__get__(eng3)
    with pytest.raises(jax.errors.JaxRuntimeError):
        eng3.generate_ids(prompts, seed=0)
    assert not eng3._poisoned_sigs


def test_text_engine_prewarm_survives_helper_crash(setup):
    """A poisoned signature during prewarm must be recorded and skipped,
    not kill the warmup (and with it the pipeline stage)."""
    cfg, model, proc = setup
    eng = TextGenEngine(model, proc, max_new_tokens=4, do_sample=False)
    good = eng.signature_for(["hello", "hullo"])
    bad = ("plain", 4, 128)

    orig = TextGenEngine._generate

    class _Boom:
        def lower(self, *a, **k):
            ids = a[2]
            if tuple(ids.shape) == (4, 128):
                raise jax.errors.JaxRuntimeError(
                    "INTERNAL: remote_compile: HTTP 500: helper died")
            return orig.lower(*a, **k)

    TextGenEngine._generate = _Boom()
    try:
        n_ok = eng.prewarm([good, bad])
    finally:
        TextGenEngine._generate = orig
    assert n_ok == 1
    assert bad in eng._poisoned_sigs and good not in eng._poisoned_sigs
