"""Full-finetune (use_peft=False) mode: freeze matrix → trainable
submodules, codebook stays frozen, checkpoints merge back for generation."""

import numpy as np
import jax
import jax.numpy as jnp

from ospo_tpu.config import Config
from ospo_tpu.image_processing import ImageProcessor
from ospo_tpu.models import janus
from ospo_tpu.processing import Processor
from ospo_tpu.tokenizer import ByteTokenizer
from ospo_tpu.train.trainer import SimPOTrainer


def make_trainer(tmp_path, freeze_overrides=None):
    cfg = janus.tiny_janus_config()
    model = janus.JanusModel.init(cfg, seed=0)
    tok = ByteTokenizer(vocab_size=cfg.language.vocab_size)
    proc = Processor(tok, ImageProcessor(image_size=cfg.gen_image_size),
                     num_image_tokens=cfg.num_image_tokens)
    freeze = {
        "vision_model": True, "aligner": True, "gen_vision_model": True,
        "gen_aligner": True, "gen_head": True, "gen_embed": True,
        "language_model": False,
    }
    freeze.update(freeze_overrides or {})
    config = Config.from_nested({
        "base": {"save_path": str(tmp_path), "exp_name": "ft"},
        "use_peft": False,
        "optimizer": {"init_lr": 1e-3, "scheduler_type": "constant"},
        "experiment": {"seed": 0, "max_training_steps": 2, "log_steps": 1,
                       "gradient_checkpointing": False, "freeze": freeze},
        "algo": {"beta": 10, "gamma_beta_ratio": 0.5, "loss_type": "sigmoid"},
    })
    return SimPOTrainer(config, model, proc), model


def fake_batch(cfg, b=2):
    s = cfg.gen_image_size
    return {
        "text_ids": jnp.ones((b, 32), jnp.int32),
        "text_mask": jnp.ones((b, 32), jnp.float32),
        "chosen_pixels": jnp.zeros((b, s, s, 3), jnp.float32),
        "rejected_pixels": jnp.full((b, s, s, 3), 0.3, jnp.float32),
    }


def test_full_finetune_updates_language_model(tmp_path):
    trainer, model = make_trainer(tmp_path)
    assert trainer.trainable_keys == ["language_model"]
    before = np.asarray(trainer.trainable["language_model"]["layers"]["wq"]).copy()
    batch = fake_batch(model.cfg)
    trainer.trainable, trainer.opt_state, metrics = trainer._step(
        trainer.trainable, trainer.opt_state, **batch)
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(trainer.trainable["language_model"]["layers"]["wq"])
    assert not np.allclose(before, after)


def test_codebook_frozen_when_vq_trainable(tmp_path):
    trainer, model = make_trainer(
        tmp_path, {"gen_vision_model": False, "language_model": True})
    assert trainer.trainable_keys == ["gen_vision_model"]
    cb_before = np.asarray(trainer.trainable["gen_vision_model"]["codebook"]).copy()
    enc_before = np.asarray(
        trainer.trainable["gen_vision_model"]["encoder"]["conv_in"]["w"]).copy()
    batch = fake_batch(model.cfg)
    trainer.trainable, trainer.opt_state, _ = trainer._step(
        trainer.trainable, trainer.opt_state, **batch)
    np.testing.assert_array_equal(
        cb_before, np.asarray(trainer.trainable["gen_vision_model"]["codebook"]))
    # encoder grads flow only through the stop_gradient'd VQ encode → zero;
    # with weight decay 0 the conv weights also stay put — this documents
    # that image tokens are data, not a gradient path (reference parity)
    np.testing.assert_array_equal(
        enc_before,
        np.asarray(trainer.trainable["gen_vision_model"]["encoder"]["conv_in"]["w"]))


def test_full_checkpoint_merges(tmp_path):
    trainer, model = make_trainer(tmp_path)
    batch = fake_batch(model.cfg)
    trainer.trainable, trainer.opt_state, _ = trainer._step(
        trainer.trainable, trainer.opt_state, **batch)
    trainer.global_step = 1
    path = trainer.save()

    from ospo_tpu.train.checkpoint import checkpoint_mode, merge_lora_checkpoint

    assert checkpoint_mode(path) == "full"
    merged = merge_lora_checkpoint(model, path)
    np.testing.assert_allclose(
        np.asarray(merged.params["language_model"]["layers"]["wq"]),
        np.asarray(trainer.trainable["language_model"]["layers"]["wq"]),
        atol=1e-6,
    )
