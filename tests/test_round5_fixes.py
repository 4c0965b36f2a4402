"""Round-5 regression tests.

Pins the fixes VERDICT r4 mandated:
- scoring row-token budget slicing + in-shared-path OOM de-escalation
  (weak #2: the complex-category blackout and its fallback cascade);
- step-4b per-category failure gate (whole-category loss must be loud);
- template-pure batching for steps 2/4a (#3/#4: mixed-template batches
  collapsed the shared prefix and ran ~8x slower at production lengths);
- step-3 bounded in-flight fetch groups (#8: the backpressure fix that
  landed mid-round-4 without a test).
"""

import json
import threading
import time

import jax
import numpy as np
import pytest
from PIL import Image

from ospo_tpu.config import Config
from ospo_tpu.engine.scoring import ScoringEngine
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


def _images(n, seed=0):
    rng = np.random.default_rng(seed)
    return [Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8))
            for _ in range(n)]


# ---------------------------------------------------------------------------
# scoring: row-token budget
# ---------------------------------------------------------------------------


def test_fit_images_budget(engine_factory):
    engine = engine_factory()
    engine.row_token_budget = 12288
    # the calibration point: 768 row-tokens -> 16 images on 1 shard
    assert engine._fit_images(768, dp=1) == 16
    # complex-shaped chunks (880 row-tokens) fit fewer
    assert engine._fit_images(880, dp=1) == 13
    # dp multiples: 13 rounds DOWN to 12 on a 4-shard data axis
    assert engine._fit_images(880, dp=4) == 12
    # never below one image per shard
    assert engine._fit_images(10 ** 6, dp=4) == 4


def test_shared_multi_slices_to_budget(engine_factory, monkeypatch):
    engine = engine_factory()
    imgs = _images(7)
    qs = [["Is it red?", "Global?"]] * 7
    prep = engine.prepare_shared_multi(imgs, qs)
    assert prep.row_tokens > 0

    slices = []

    def fake_slice(operands, pre, q_counts):
        slices.append(operands[0].shape[0])
        return [{"local_score": 0.0, "global_score": 0.0,
                 "answer_metadata": []}] * len(q_counts)

    monkeypatch.setattr(engine, "_execute_shared_slice", fake_slice)
    # budget for 3 images per call -> 7 images slice as 3+3+3 (balanced
    # over ceil(7/3)=3 slices, final padded by repeats)
    engine.row_token_budget = prep.row_tokens * 3
    out = engine._execute_shared_multi(prep)
    assert len(out) == 7          # trimmed to n_real
    assert slices == [3, 3, 3]


def test_shared_oom_deescalates_within_shared_path(engine_factory,
                                                   monkeypatch):
    """An OOM on a big slice must halve the budget and RETRY the shared
    path (smaller slices), not abandon it for the unshared fallback."""
    engine = engine_factory()
    imgs = _images(4)
    qs = [["Is it red?", "Global?"]] * 4

    calls = []

    real_slice = engine._execute_shared_slice

    def flaky_slice(operands, pre, q_counts):
        calls.append(operands[0].shape[0])
        if operands[0].shape[0] > 2:
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: TPU backend error (fake)")
        return real_slice(operands, pre, q_counts)

    monkeypatch.setattr(engine, "_execute_shared_slice", flaky_slice)
    out = engine.score_images_multi(imgs, qs)
    assert len(out) == 4
    assert not engine._shared_oom          # shared path still alive
    assert calls[0] == 4                   # first attempt: whole chunk
    assert all(c <= 2 for c in calls[1:])  # retries: smaller slices
    # sticky: the halved budget pre-slices later chunks
    assert engine._fit_images(out and 1 or 1, dp=1) >= 1
    prep2 = engine.prepare_shared_multi(imgs, qs)
    assert engine._fit_images(prep2.row_tokens, dp=1) <= 2


def test_shared_floor_falls_back_unshared(engine_factory, monkeypatch):
    """Persistent OOM at the minimum slice size falls back to the
    unshared path (sticky) instead of looping forever."""
    engine = engine_factory()
    imgs = _images(2)
    qs = [["Is it red?", "Global?"]] * 2

    def always_oom(operands, pre, q_counts):
        raise jax.errors.JaxRuntimeError(
            "RESOURCE_EXHAUSTED: TPU backend error (fake)")

    monkeypatch.setattr(engine, "_execute_shared_slice", always_oom)
    out = engine.score_images_multi(imgs, qs)
    assert len(out) == 2
    assert engine._shared_oom
    for r in out:
        assert set(r) == {"local_score", "global_score", "answer_metadata"}


def test_non_splittable_error_stays_loud(engine_factory, monkeypatch):
    engine = engine_factory()
    imgs = _images(2)
    qs = [["Is it red?", "Global?"]] * 2

    def boom(operands, pre, q_counts):
        raise jax.errors.JaxRuntimeError("INTERNAL: something else broke")

    monkeypatch.setattr(engine, "_execute_shared_slice", boom)
    with pytest.raises(jax.errors.JaxRuntimeError, match="INTERNAL"):
        engine.score_images_multi(imgs, qs)


# ---------------------------------------------------------------------------
# step 4b: per-category failure gate
# ---------------------------------------------------------------------------


def _fake_tree(root, items):
    """Minimal step-3 PNG tree: 1 base + 1 negative image per item."""
    for it in items:
        for kind in ("base", "negative"):
            d = root / kind / it["category"] / it["item_id"]
            d.mkdir(parents=True, exist_ok=True)
            Image.new("RGB", (8, 8)).save(d / "00.png")


def _gate_setup(tmp_path, monkeypatch, fail_category):
    from ospo_tpu.pipeline import step4

    items = [
        {"item_id": "0000001", "category": "attribute",
         "sub_category": "attribute1_color", "prompt": "a red cat",
         "question": ["Is it red?", "Global?"]},
        {"item_id": "3000001", "category": "complex",
         "sub_category": "complex", "prompt": "a complex scene",
         "question": ["Q1?", "Q2?", "Global?"]},
    ]
    _fake_tree(tmp_path, items)

    monkeypatch.setattr(step4, "prepare_chunk",
                        lambda engine, jobs: {"jobs": jobs})

    def fake_score(engine, chunk):
        out = []
        for j in chunk["jobs"]:
            if j["category"] == fail_category:
                out.append(None)
            else:
                out.append({"local_score": 0.5, "global_score": 0.5,
                            "answer_metadata": []})
        return out

    monkeypatch.setattr(step4, "score_prepared_chunk", fake_score)
    return step4, items


def test_run_scoring_category_blackout_aborts(tmp_path, monkeypatch):
    step4, items = _gate_setup(tmp_path, monkeypatch, "complex")
    config = Config.from_nested({"image_path": str(tmp_path),
                                 "save_path": str(tmp_path / "out"),
                                 "score_rows": 2})
    with pytest.raises(RuntimeError, match="complex"):
        step4.run_scoring(config, engine=None, data=items)
    # the evidence is persisted before the abort
    with open(tmp_path / "out" / "score_summary.json") as f:
        summary = json.load(f)
    assert summary["complex"]["scored"] == 0
    assert summary["complex"]["failed"] == summary["complex"]["images"] == 2
    assert summary["attribute"]["scored"] == 2


def test_run_scoring_gate_optout(tmp_path, monkeypatch):
    step4, items = _gate_setup(tmp_path, monkeypatch, "complex")
    config = Config.from_nested({"image_path": str(tmp_path),
                                 "save_path": str(tmp_path / "out"),
                                 "score_rows": 2,
                                 "score_failure_gate": False})
    pairs, summary = step4.run_scoring(config, engine=None, data=items)
    assert summary["complex"]["failed"] == 2
    assert all(p["category"] != "complex" for p in pairs)


def test_run_scoring_partial_failures_pass(tmp_path, monkeypatch):
    # per-sample losses (no whole category, minority overall) stay tolerated
    step4, items = _gate_setup(tmp_path, monkeypatch, "<none>")
    config = Config.from_nested({"image_path": str(tmp_path),
                                 "save_path": str(tmp_path / "out"),
                                 "score_rows": 2})
    pairs, summary = step4.run_scoring(config, engine=None, data=items)
    assert {p["category"] for p in pairs} == {"attribute", "complex"}
    assert all(c["failed"] == 0 for c in summary.values())


# ---------------------------------------------------------------------------
# template-pure batching (steps 2 / 4a)
# ---------------------------------------------------------------------------


def test_batched_grouped_group_pure():
    from ospo_tpu.pipeline.datasets import batched_grouped

    items = ([{"k": "a", "i": i} for i in range(5)]
             + [{"k": "b", "i": i} for i in range(3)])
    batches = list(batched_grouped(items, 2, key=lambda s: s["k"]))
    # every batch pure; all items covered exactly once
    assert all(len({s["k"] for s in b}) == 1 for b in batches)
    assert [len(b) for b in batches] == [2, 2, 1, 2, 1]
    flat = [s["i"] for b in batches for s in b]
    assert flat == [0, 1, 2, 3, 4, 0, 1, 2]


def test_step2_template_batches_pure():
    from ospo_tpu.pipeline.step2 import _template_batches, _template_key

    data = []
    for i in range(7):
        data.append({"sub_category": "complex" if i % 2 else "layout1",
                     "perturbed_method": ["replace", "swap", "drop"],
                     "prompt": f"p{i}"})
    batches = _template_batches(data, 4)
    assert sum(len(b) for b in batches) == len(data)
    for b in batches:
        assert len({_template_key(s) for s in b}) == 1


def test_step4a_batches_category_pure(monkeypatch):
    from ospo_tpu.pipeline import step4

    data = [{"category": c, "prompt": f"p{i}", "item_id": f"{i:07d}",
             "sub_category": c}
            for i, c in enumerate(["complex", "layout"] * 5)]

    seen_batches = []

    class FakeEngine:
        def prewarm(self, sigs):
            return 0

        def signature_for(self, prompts):
            return ("plain", len(prompts), 64)

        def generate(self, prompts, rng=None):
            return ["Questions: Is it ok?"] * len(prompts)

    monkeypatch.setattr(step4, "build_question_prompts",
                        lambda batch: (seen_batches.append(
                            [s["category"] for s in batch])
                            or [s["prompt"] for s in batch]))
    config = Config.from_nested({"batch_size": 4, "seed": 1})
    out = step4.run_question_gen(config, FakeEngine(), data)
    assert len(out) == len(data)
    for cats in seen_batches:
        assert len(set(cats)) == 1
    assert all("question" in s for s in data)


# ---------------------------------------------------------------------------
# step 3: bounded in-flight fetch groups (VERDICT r4 #8)
# ---------------------------------------------------------------------------


def test_step3_backpressure_bounds_inflight_groups(tmp_path, monkeypatch):
    """With a slow writer, at most 3 device buffers may be pinned by
    un-fetched groups at any instant (ospo_tpu/pipeline/step3.py
    backpressure, commit 015e926 — the unbounded list OOMed the r4
    round's step 3 at 48/1200 PNGs)."""
    from ospo_tpu.pipeline import step3

    lock = threading.Lock()
    live = {"now": 0, "max": 0}

    class FakeDev:
        """Counts as 'in flight' from creation until fetched."""

        def __init__(self, n):
            self._n = n
            with lock:
                live["now"] += 1
                live["max"] = max(live["max"], live["now"])

        def __array__(self, dtype=None, copy=None):
            time.sleep(0.05)  # slow fetch+write
            with lock:
                live["now"] -= 1
            return np.zeros((self._n, 4, 4, 3), np.uint8)

    class FakeEngine:
        image_token_num = 16

        def signature_for(self, prompts):
            return (len(prompts), 16)

        def prewarm(self, sigs):
            return 0

        def generate_images_device(self, prompts, seed=0):
            return FakeDev(len(prompts))

    class FakeProc:
        image_start_tag = "<boi>"

    data = [{"item_id": f"{i:07d}", "category": "complex",
             "long_prompt": ["a", "b", "c"],
             "negative_long_prompt": ["d", "e", "f"]}
            for i in range(4)]
    config = Config.from_nested({"batch_size": 2, "seed_list": [0, 1, 2],
                                 "save_path": str(tmp_path / "step3")})
    step3.run_step3(config, FakeEngine(), FakeProc(), data)
    # 2 batches x 6 groups = 12 groups; bound must hold throughout
    assert live["max"] <= 3, f"in-flight groups peaked at {live['max']}"
    assert live["now"] == 0
    pngs = list((tmp_path / "step3").rglob("*.png"))
    assert len(pngs) == 4 * 6


# ---------------------------------------------------------------------------
# model_factory: tokenizer vocab guard (ADVICE r4)
# ---------------------------------------------------------------------------


def test_tokenizer_vocab_guard(monkeypatch, tmp_path):
    from ospo_tpu.pipeline import model_factory

    big_tok = ByteTokenizer(vocab_size=100_000)
    monkeypatch.setattr(model_factory, "load_tokenizer",
                        lambda *a, **k: big_tok)
    config = Config.from_nested({"model_preset": "tiny",
                                 "tokenizer_path": str(tmp_path / "tok.json")})
    with pytest.raises(ValueError, match="vocab"):
        model_factory.get_model(config)


# ---------------------------------------------------------------------------
# precision-mixed w8a8 readout (VERDICT r4 #6)
# ---------------------------------------------------------------------------


def test_w8a16_override_routes_w8a8_weights():
    """Inside quant.w8a16_override(), a {"q","sa"} matrix runs the
    weight-only path — bit-identical to weight-only int8 with the same
    payload — while outside it keeps the activation-quantized path."""
    import jax.numpy as jnp

    from ospo_tpu.models.llama import _maybe_lora
    from ospo_tpu.ops import quant

    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 3, 8)), jnp.float32)
    qw = quant.quantize_matrix_w8a8(np.asarray(w))

    y_w8a8 = _maybe_lora(x, qw, None, "q_proj", 1.0)
    with quant.w8a16_override():
        y_w8a16 = _maybe_lora(x, qw, None, "q_proj", 1.0)
    assert not quant.w8a16_active()

    # W8A16 == weight-only int8 on the same payload
    ref = jnp.einsum("btd,fd->btf", x, qw["q"].astype(x.dtype)) * qw["sa"]
    np.testing.assert_allclose(np.asarray(y_w8a16), np.asarray(ref),
                               rtol=1e-6)
    # and differs from the activation-quantized result (dynamic act quant
    # introduces its own rounding)
    assert not np.allclose(np.asarray(y_w8a8), np.asarray(y_w8a16))


def test_scoring_readout_w8a16_traces(engine_factory, monkeypatch):
    """A w8a8-quantized trunk scores successfully with the mixed readout
    enabled, and the flag is read at trace time (program differs)."""
    from ospo_tpu.models import janus as janus_lib

    cfg = janus_lib.tiny_janus_config()
    model = janus_lib.JanusModel.init(cfg, seed=0, quantize="w8a8")
    proc = Processor(ByteTokenizer(vocab_size=cfg.language.vocab_size),
                     ImageProcessor(image_size=32),
                     num_image_tokens=cfg.num_image_tokens)
    imgs = _images(2)
    qs = [["Is it red?", "Global?"]] * 2

    plain = ScoringEngine(model, proc)
    mixed = ScoringEngine(model, proc)
    mixed.readout_w8a16 = True
    out_plain = plain.score_images_multi(imgs, qs)
    out_mixed = mixed.score_images_multi(imgs, qs)
    for o in out_mixed:
        assert 0.0 <= o["answer_metadata"][0]["p_yes"] <= 1.0
    # different suffix precision → different (traced) programs → scores
    # generally differ on a random-weight model
    diffs = [abs(a["local_score"] - b["local_score"])
             for a, b in zip(out_plain, out_mixed)]
    assert any(d > 0 for d in diffs)
