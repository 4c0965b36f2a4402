"""Trainer: gradient accumulation (optax.MultiSteps) and exact resume."""

import numpy as np
import jax
import jax.numpy as jnp

from ospo_tpu.config import Config
from ospo_tpu.image_processing import ImageProcessor
from ospo_tpu.models import janus
from ospo_tpu.processing import Processor
from ospo_tpu.tokenizer import ByteTokenizer
from ospo_tpu.train.trainer import SimPOTrainer


def make_trainer(tmp_path, accum=1, exp_name="t"):
    cfg = janus.tiny_janus_config()
    model = janus.JanusModel.init(cfg, seed=0)
    tok = ByteTokenizer(vocab_size=cfg.language.vocab_size)
    proc = Processor(tok, ImageProcessor(image_size=cfg.gen_image_size),
                     num_image_tokens=cfg.num_image_tokens)
    config = Config.from_nested({
        "base": {"save_path": str(tmp_path), "exp_name": exp_name},
        "use_peft": True,
        "lora": {"lora_rank": 4, "lora_alpha": 8, "lora_dropout": 0.0},
        "optimizer": {"init_lr": 1e-3, "scheduler_type": "constant"},
        "experiment": {"seed": 0, "max_training_steps": 8, "log_steps": 100,
                       "gradient_checkpointing": False,
                       "gradient_accumulation_steps": accum},
        "algo": {"beta": 10, "gamma_beta_ratio": 0.5, "loss_type": "sigmoid"},
    })
    return SimPOTrainer(config, model, proc), model


def batch(cfg, b=2, seed=0):
    k = jax.random.PRNGKey(seed)
    s = cfg.gen_image_size
    return {
        "text_ids": jnp.ones((b, 32), jnp.int32),
        "text_mask": jnp.ones((b, 32), jnp.float32),
        "chosen_pixels": jax.random.uniform(k, (b, s, s, 3)) * 2 - 1,
        "rejected_pixels": jax.random.uniform(jax.random.fold_in(k, 1),
                                              (b, s, s, 3)) * 2 - 1,
    }


def test_grad_accumulation_defers_updates(tmp_path):
    trainer, model = make_trainer(tmp_path, accum=2)
    p0 = np.asarray(trainer.trainable["q_proj"]["b"]).copy()
    # first micro-step: accumulate only, params unchanged
    trainer.trainable, trainer.opt_state, _ = trainer._step(
        trainer.trainable, trainer.opt_state, **batch(model.cfg, seed=0))
    np.testing.assert_array_equal(
        p0, np.asarray(trainer.trainable["q_proj"]["b"]))
    # second micro-step: the update applies
    trainer.trainable, trainer.opt_state, _ = trainer._step(
        trainer.trainable, trainer.opt_state, **batch(model.cfg, seed=1))
    assert not np.array_equal(p0, np.asarray(trainer.trainable["q_proj"]["b"]))


def test_resume_reproduces_training(tmp_path):
    """checkpoint → resume must reproduce the exact trainable state of an
    uninterrupted run (adapter + optimizer state restored)."""
    t1, model = make_trainer(tmp_path / "a", exp_name="full")
    b1 = batch(model.cfg, seed=0)
    b2 = batch(model.cfg, seed=1)
    t1.trainable, t1.opt_state, _ = t1._step(t1.trainable, t1.opt_state, **b1)
    t1.global_step = 1
    ckpt = t1.save()
    t1.trainable, t1.opt_state, _ = t1._step(t1.trainable, t1.opt_state, **b2)
    ref = jax.tree.leaves(t1.trainable)

    t2, _ = make_trainer(tmp_path / "b", exp_name="resumed")
    t2.resume(ckpt)
    assert t2.global_step == 1
    t2.trainable, t2.opt_state, _ = t2._step(t2.trainable, t2.opt_state, **b2)
    out = jax.tree.leaves(t2.trainable)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_quantize_base_qlora_step(tmp_path):
    """QLoRA-style training (int8 frozen trunk): the step must run, produce
    a finite loss, and update the adapters; gradients flow through the
    dequantising matmuls to LoRA only."""
    cfg = janus.tiny_janus_config()
    model = janus.JanusModel.init(cfg, seed=0)
    tok = ByteTokenizer(vocab_size=cfg.language.vocab_size)
    proc = Processor(tok, ImageProcessor(image_size=cfg.gen_image_size),
                     num_image_tokens=cfg.num_image_tokens)
    config = Config.from_nested({
        "base": {"save_path": str(tmp_path), "exp_name": "qlora"},
        "use_peft": True,
        "lora": {"lora_rank": 4, "lora_alpha": 8, "lora_dropout": 0.0},
        "optimizer": {"init_lr": 1e-3, "scheduler_type": "constant"},
        "experiment": {"seed": 0, "max_training_steps": 2, "log_steps": 100,
                       "gradient_checkpointing": False,
                       "quantize_base": True},
        "algo": {"beta": 10, "gamma_beta_ratio": 0.5, "loss_type": "sigmoid"},
    })
    trainer = SimPOTrainer(config, model, proc)
    assert isinstance(model.params["language_model"]["layers"]["wq"], dict)

    b = batch(cfg, b=2)
    before = np.asarray(trainer.trainable["q_proj"]["b"]).copy()
    trainer.trainable, trainer.opt_state, m = trainer._step(
        trainer.trainable, trainer.opt_state, **b)
    assert np.isfinite(float(m["loss"]))
    after = np.asarray(trainer.trainable["q_proj"]["b"])
    assert not np.array_equal(before, after)


class _StubDataset:
    """Minimal iter_batches provider for fit()-level tests (no disk)."""

    def __init__(self, cfg, n):
        self.cfg, self.n = cfg, n

    def _item(self, j):
        s = self.cfg.gen_image_size
        rng = np.random.RandomState(j)
        return {
            "text_tokens": [1, 2, 3, 4],
            "chosen_pixels": (rng.rand(s, s, 3) * 2 - 1).astype(np.float32),
            "rejected_pixels": (rng.rand(s, s, 3) * 2 - 1).astype(np.float32),
        }

    def iter_batches(self, batch_size, shuffle=True, seed=0):
        for i in range(0, self.n, batch_size):
            yield [self._item(j) for j in range(i, min(i + batch_size, self.n))]


def test_fit_counts_optimizer_updates_not_micro_batches(tmp_path):
    """Lightning max_steps semantics: with gradient accumulation k, one
    global step = k micro-batches (optax.MultiSteps applies one update
    per k).  Counting micro-batches would run 1/k of the reference's
    updates and leave the LR schedule stuck near its start."""
    trainer, model = make_trainer(tmp_path, accum=2)
    trainer.max_steps = 2
    p0 = np.asarray(trainer.trainable["q_proj"]["b"]).copy()
    data = _StubDataset(model.cfg, 16)
    trainer.fit(data, batch_size=2, max_epochs=1)
    # 2 optimizer updates consumed 4 micro-batches of the 8 available
    assert trainer.global_step == 2
    assert not np.array_equal(p0, np.asarray(trainer.trainable["q_proj"]["b"]))


def test_quantize_base_w8a8_step(tmp_path):
    """W8A8 frozen trunk (experiment.quantize_base: 'w8a8' — int8
    activations for the MXU's 2× rate on the 2B concatenated forward):
    the step runs through the STE backward, the loss is finite and close
    to the W8A16 trunk's on the same batch, and the adapters update."""
    import pytest

    losses = {}
    for mode in ("int8", "w8a8"):
        cfg = janus.tiny_janus_config()
        model = janus.JanusModel.init(cfg, seed=0)
        tok = ByteTokenizer(vocab_size=cfg.language.vocab_size)
        proc = Processor(tok, ImageProcessor(image_size=cfg.gen_image_size),
                         num_image_tokens=cfg.num_image_tokens)
        config = Config.from_nested({
            "base": {"save_path": str(tmp_path), "exp_name": f"q_{mode}"},
            "use_peft": True,
            "lora": {"lora_rank": 4, "lora_alpha": 8, "lora_dropout": 0.0},
            "optimizer": {"init_lr": 1e-3, "scheduler_type": "constant"},
            "experiment": {"seed": 0, "max_training_steps": 2,
                           "log_steps": 100,
                           "gradient_checkpointing": False,
                           "quantize_base": mode},
            "algo": {"beta": 10, "gamma_beta_ratio": 0.5,
                     "loss_type": "sigmoid"},
        })
        trainer = SimPOTrainer(config, model, proc)
        wq = model.params["language_model"]["layers"]["wq"]
        assert isinstance(wq, dict)
        assert ("sa" in wq) == (mode == "w8a8")

        b = batch(cfg, b=2)
        before = np.asarray(trainer.trainable["q_proj"]["b"]).copy()
        trainer.trainable, trainer.opt_state, m = trainer._step(
            trainer.trainable, trainer.opt_state, **b)
        losses[mode] = float(m["loss"])
        assert np.isfinite(losses[mode])
        after = np.asarray(trainer.trainable["q_proj"]["b"])
        assert not np.array_equal(before, after), \
            f"adapters did not update under quantize_base={mode} " \
            "(zero gradients — STE backward broken?)"
    # both trunks quantize the same bf16 weights; the activation
    # quantization adds bounded noise, not a different objective
    assert losses["w8a8"] == pytest.approx(losses["int8"], rel=0.05)


def test_parse_quantize_base_rejects_unknown():
    import pytest

    from ospo_tpu.train.trainer import _parse_quantize_base

    assert _parse_quantize_base(None) is None
    assert _parse_quantize_base(True) == "int8"
    assert _parse_quantize_base("w8a8") == "w8a8"
    assert _parse_quantize_base("bf16") is None
    with pytest.raises(ValueError):
        _parse_quantize_base("int4")
    with pytest.raises(ValueError):
        _parse_quantize_base("in8")


def test_quantize_base_mode_mismatch_raises(tmp_path):
    """A trunk pre-quantized in a different mode than quantize_base asks
    for must raise — otherwise a w8a8-vs-int8 A/B silently measures the
    wrong trunk (or trains through the unoffered int4 gradient path)."""
    import pytest

    cfg = janus.tiny_janus_config()
    model = janus.JanusModel.init(cfg, seed=0, quantize="int8")
    tok = ByteTokenizer(vocab_size=cfg.language.vocab_size)
    proc = Processor(tok, ImageProcessor(image_size=cfg.gen_image_size),
                     num_image_tokens=cfg.num_image_tokens)
    config = Config.from_nested({
        "base": {"save_path": str(tmp_path), "exp_name": "mm"},
        "use_peft": True,
        "lora": {"lora_rank": 4, "lora_alpha": 8, "lora_dropout": 0.0},
        "optimizer": {"init_lr": 1e-3, "scheduler_type": "constant"},
        "experiment": {"seed": 0, "max_training_steps": 2, "log_steps": 100,
                       "quantize_base": "w8a8"},
        "algo": {"beta": 10, "gamma_beta_ratio": 0.5, "loss_type": "sigmoid"},
    })
    with pytest.raises(ValueError, match="already int8-quantized"):
        SimPOTrainer(config, model, proc)


class _VarLenDataset(_StubDataset):
    """Prompts of wildly varying token length — per-batch padding would
    dispatch several train-step shapes across a shuffled run."""

    LENGTHS = [3, 30, 60, 120, 180]

    def _item(self, j):
        it = super()._item(j)
        it["text_tokens"] = list(range(1, 1 + self.LENGTHS[j % 5]))
        return it

    def max_text_len(self):
        return max(self.LENGTHS)


def test_fit_pins_single_text_bucket(tmp_path):
    """Round-5 regression: fit() must pad every batch to ONE run-level
    text bucket (dataset.max_text_len) so the jitted train step compiles
    exactly once — per-batch buckets billed up to 6 mid-run XLA compiles
    to steady state in the integrated round (ROUND_r05.json step5:
    0.537 samples/s vs the single-shape 2.04 POINT)."""
    trainer, model = make_trainer(tmp_path)
    trainer.max_steps = 4
    shapes = []
    inner = trainer._step

    def spy(trainable, opt_state, text_ids, text_mask, *a, **kw):
        shapes.append(tuple(text_ids.shape))
        return inner(trainable, opt_state, text_ids, text_mask, *a, **kw)

    trainer._step = spy
    trainer.fit(_VarLenDataset(model.cfg, 8), batch_size=2, max_epochs=1)
    assert len(set(shapes)) == 1, f"multiple train-step shapes: {set(shapes)}"
    # the single bucket covers the dataset's longest prompt (180 → 192)
    assert shapes[0][1] == 192


def test_collate_without_fit_keeps_per_batch_bucket(tmp_path):
    """Standalone collate (no fit) keeps the old per-batch bucket — the
    bench path and tests that drive _step directly are unaffected."""
    trainer, model = make_trainer(tmp_path)
    ds = _VarLenDataset(model.cfg, 5)
    out = trainer.collate([ds._item(0)])        # len 3 → bucket 32
    assert out["text_ids"].shape[1] == 32
