"""ScoringEngine: record schema, score math, and pair-selection parity."""

import numpy as np
import pytest
from PIL import Image

from ospo_tpu.engine.scoring import ScoringEngine, compute_preference_strength
from ospo_tpu.image_processing import ImageProcessor
from ospo_tpu.models import janus
from ospo_tpu.processing import Processor
from ospo_tpu.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def engine_factory():
    cfg = janus.tiny_janus_config()
    model = janus.JanusModel.init(cfg, seed=0)
    tok = ByteTokenizer(vocab_size=cfg.language.vocab_size)
    proc = Processor(tok, ImageProcessor(image_size=32),
                     num_image_tokens=cfg.num_image_tokens)

    def make(**kwargs):
        return ScoringEngine(model, proc, **kwargs)

    return make


@pytest.fixture(scope="module")
def engine(engine_factory):
    return engine_factory()


def test_score_image_schema(engine):
    img = Image.fromarray(
        (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(np.uint8))
    questions = ["Is there a cat?", "Is it black?",
                 "Does this image accurately represent the prompt?"]
    out = engine.score_image(img, questions)
    assert set(out) == {"local_score", "global_score", "answer_metadata"}
    assert len(out["answer_metadata"]) == 3
    for meta in out["answer_metadata"]:
        assert 0.0 <= meta["p_yes"] <= 1.0
        assert 0.0 <= meta["p_no"] <= 1.0
        assert meta["answer"] in ("yes", "no", "tie")
    # local = mean gap over the first Q-1 questions
    gaps = [m["p_yes"] - m["p_no"] for m in out["answer_metadata"]]
    np.testing.assert_allclose(out["local_score"], np.mean(gaps[:-1]), atol=1e-6)
    np.testing.assert_allclose(out["global_score"], gaps[-1], atol=1e-6)


def _img(local, global_, path):
    return {"path": path, "local_score": local, "global_score": global_,
            "answer_metadata": []}


def test_preference_strength_selects_expected_pair():
    base = {f"base_{i}": _img(l, g, f"b{i}.png")
            for i, (l, g) in enumerate([(0.9, 0.8), (0.5, 0.5), (0.2, 0.9)])}
    neg = {f"negative_{i}": _img(l, g, f"n{i}.png")
           for i, (l, g) in enumerate([(0.1, 0.7), (0.4, 0.4), (0.5, 0.2)])}
    # gaps: pair0 local 0.8 / global 0.1; pair1 0.1/0.1; pair2 -0.3/0.7 (filtered)
    chosen, rejected, meta = compute_preference_strength(base, neg)
    assert (chosen, rejected) == ("b0.png", "n0.png")
    assert meta["local_gap"] == pytest.approx(0.8)
    assert meta["global_gap"] == pytest.approx(0.1 + 0.8 - 0.8, abs=1e-9)


def test_preference_strength_filters_negative_gaps():
    base = {"base_0": _img(0.1, 0.1, "b.png")}
    neg = {"negative_0": _img(0.5, 0.5, "n.png")}
    assert compute_preference_strength(base, neg) is None


def test_preference_strength_empty():
    assert compute_preference_strength({}, {}) is None


def test_shared_prefix_scores_match_full_forward(engine):
    """The prefix-KV-shared scoring path must reproduce the single-forward
    path's scores (same tokens by construction — the split point is the
    common TOKEN prefix — so only fp reassociation differs)."""
    rng = np.random.default_rng(7)
    imgs = [Image.fromarray(
        rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8))
        for _ in range(2)]
    questions = ["Is there a dog?", "Is the sky blue?",
                 "Does this image fully match the prompt?"]
    full = engine.score_images(imgs, questions, share_prefix=False)
    shared = engine.score_images(imgs, questions, share_prefix=True)
    for f, s in zip(full, shared):
        assert abs(f["local_score"] - s["local_score"]) < 2e-4, (f, s)
        assert abs(f["global_score"] - s["global_score"]) < 2e-4, (f, s)
        for fa, sa in zip(f["answer_metadata"], s["answer_metadata"]):
            assert abs(fa["p_yes"] - sa["p_yes"]) < 2e-4
            assert abs(fa["p_no"] - sa["p_no"]) < 2e-4


def test_cross_item_multi_question_batching(engine):
    """score_images_multi with per-image question lists (cross-item
    batching, round-3 VERDICT #3) must equal scoring each image alone
    with its own questions — including uneven question counts (padded
    suffix slots must not leak into the scores)."""
    rng = np.random.default_rng(11)
    imgs = [Image.fromarray(
        rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8))
        for _ in range(3)]
    per_image = [
        ["Is there a dog?", "Is it red?", "Does it match the prompt?"],
        ["Is the sky blue?", "Does it match?"],           # fewer questions
        ["Is there a cat?", "Is it big?", "Is it outdoors?",
         "Does it match the prompt?"],                    # more questions
    ]
    batched = engine.score_images_multi(imgs, per_image)
    for i, (img, qs) in enumerate(zip(imgs, per_image)):
        solo = engine.score_images([img], qs)[0]
        assert abs(batched[i]["local_score"] - solo["local_score"]) < 2e-4
        assert abs(batched[i]["global_score"] - solo["global_score"]) < 2e-4
        assert len(batched[i]["answer_metadata"]) == len(qs)


def test_pre_image_segment_exact_vs_single_segment(engine_factory):
    """The pre-image prefix_kv split (chat header + system prompt stored
    once at B=1) must engage on ordinary conversations AND reproduce the
    single-segment program's scores exactly up to fp reassociation — the
    split moves tokens between phases, never changes them."""
    eng_pre = engine_factory(pre_image_prefix=True)
    eng_one = engine_factory(pre_image_prefix=False)
    rng = np.random.default_rng(17)
    imgs = [Image.fromarray(
        rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8))
        for _ in range(2)]
    per_image = [["Is there a dog?", "Does it match the prompt?"],
                 ["Is it blue?", "Is it big?", "Does it match?"]]
    # engagement pin: the split must actually be active on this input
    prep = eng_pre.prepare_shared_multi(imgs, per_image)
    assert prep.pre is not None and prep.pre[1].sum() >= 8
    assert eng_one.prepare_shared_multi(imgs, per_image).pre is None

    a = eng_pre.score_images_multi(imgs, per_image)
    b = eng_one.score_images_multi(imgs, per_image)
    for fa, fb in zip(a, b):
        assert abs(fa["local_score"] - fb["local_score"]) < 2e-4
        assert abs(fa["global_score"] - fb["global_score"]) < 2e-4
        for ma, mb in zip(fa["answer_metadata"], fb["answer_metadata"]):
            assert abs(ma["p_yes"] - mb["p_yes"]) < 2e-4
            assert abs(ma["p_no"] - mb["p_no"]) < 2e-4


def test_pre_image_env_kill_switch(engine_factory, monkeypatch):
    monkeypatch.setenv("OSPO_SCORE_PREIMG", "0")
    assert engine_factory().pre_image_prefix is False
    monkeypatch.delenv("OSPO_SCORE_PREIMG")
    assert engine_factory().pre_image_prefix is True


def test_int8_prefix_cache_close_to_bf16(engine_factory):
    """The int8 prefix-KV scoring option must stay close to the bf16
    scores (it's a serving-memory knob, not a different algorithm)."""
    eng8 = engine_factory(kv_quant=True)
    rng = np.random.default_rng(13)
    img = Image.fromarray(rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8))
    qs = ["Is there a dog?", "Does it match the prompt?"]
    ref = engine_factory(kv_quant=False).score_images([img], qs)[0]
    out = eng8.score_images([img], qs)[0]
    assert abs(out["local_score"] - ref["local_score"]) < 0.15
    assert abs(out["global_score"] - ref["global_score"]) < 0.15


def test_score_jobs_tolerates_corrupt_png(engine, tmp_path):
    """A truncated PNG (step-3 crash mid-write) costs ONE image, not the
    chunk or the stage (reference per-sample ethos,
    ospo/wrapper/image_generation.py:95-97)."""
    import numpy as np
    from ospo_tpu.pipeline.step4 import score_jobs

    good = tmp_path / "good.png"
    Image.fromarray(
        (np.random.default_rng(1).random((32, 32, 3)) * 255).astype(
            np.uint8)).save(good)
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\n corrupt")
    qs = ["Is there a cat?", "Global?"]
    jobs = [
        {"item_id": "a", "kind": "base", "img_idx": 0, "path": str(good),
         "questions": qs},
        {"item_id": "a", "kind": "base", "img_idx": 1, "path": str(bad),
         "questions": qs},
    ]
    results = score_jobs(engine, jobs)
    assert results[0] is not None and "local_score" in results[0]
    assert results[1] is None

    # all-corrupt chunk → all None, no raise
    jobs_bad = [dict(jobs[1]), dict(jobs[1])]
    assert score_jobs(engine, jobs_bad) == [None, None]


def test_fallback_path_batches_ragged_questions(engine):
    """The non-shared fallback (what a sticky OOM downgrades to) must
    score ragged per-image question lists in packed multi-image forwards
    and still match the shared-prefix path."""
    rng = np.random.default_rng(17)
    imgs = [Image.fromarray(
        rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8))
        for _ in range(3)]
    per_image = [
        ["Is there a dog?", "Is it red?"],
        ["Is the sky blue?", "Is it big?", "Does it match the prompt?"],
        ["Is there a cat?"],
    ]
    shared = engine.score_images_multi(imgs, per_image, share_prefix=True)
    fallback = engine.score_images_multi(imgs, per_image,
                                         share_prefix=False)
    for s, f, qs in zip(shared, fallback, per_image):
        assert len(f["answer_metadata"]) == len(qs)
        assert abs(s["local_score"] - f["local_score"]) < 2e-4
        assert abs(s["global_score"] - f["global_score"]) < 2e-4


def test_prepared_scoring_matches_direct(engine):
    """prepare_shared_multi + prep= (the prefetch-thread path in
    step4.run_scoring) must score identically to the direct call."""
    rng = np.random.default_rng(19)
    imgs = [Image.fromarray(
        rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8))
        for _ in range(2)]
    per_image = [["Is there a dog?", "Does it match the prompt?"],
                 ["Is it red?", "Is it big?", "Does it match?"]]
    prep = engine.prepare_shared_multi(imgs, per_image)
    direct = engine.score_images_multi(imgs, per_image)
    via_prep = engine.score_images_multi(imgs, per_image, prep=prep)
    for d, p in zip(direct, via_prep):
        assert d["local_score"] == p["local_score"]
        assert d["global_score"] == p["global_score"]


def test_scoring_falls_back_on_compile_helper_crash(engine_factory):
    """The tunneled remote-compile helper crashes deterministically on
    certain shared-program shapes (HTTP 500 — it killed the first 7B
    scoring-gate attempt at 24 shared images).  The engine must treat it
    like the OOM class: sticky-downgrade to the single-forward fallback
    instead of killing step 4b.  Other errors stay loud."""
    import jax

    rng = np.random.default_rng(23)
    imgs = [Image.fromarray(
        rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8))
        for _ in range(2)]
    per_image = [["Is there a dog?", "Does it match the prompt?"],
                 ["Is it red?", "Is it big?"]]

    ref_eng = engine_factory()
    ref = ref_eng.score_images_multi(imgs, per_image, share_prefix=False)

    eng = engine_factory()

    def boom(prep):
        raise jax.errors.JaxRuntimeError(
            "INTERNAL: http://127.0.0.1:8093/remote_compile: HTTP 500: "
            "tpu_compile_helper subprocess exit code 1")

    eng._execute_shared_multi = boom
    out = eng.score_images_multi(imgs, per_image)
    assert eng._shared_oom  # sticky downgrade recorded
    for o, r in zip(out, ref):
        assert abs(o["local_score"] - r["local_score"]) < 1e-6
        assert abs(o["global_score"] - r["global_score"]) < 1e-6

    # any other error must NOT downgrade
    eng2 = engine_factory()

    def boom2(prep):
        raise jax.errors.JaxRuntimeError("INTERNAL: something unrelated")

    eng2._execute_shared_multi = boom2
    try:
        eng2.score_images_multi(imgs, per_image)
        assert False, "expected the unrelated error to propagate"
    except jax.errors.JaxRuntimeError:
        pass
    assert not eng2._shared_oom
