"""uint8 pixel transfer: host resize-only + on-device normalize must be
numerically equivalent to the host-normalized float32 layout, and the
hot paths (trainer step, scoring shared chunk prep) must accept both.

Reference behavior being preserved: ``VLMImageProcessor``
(janus/models/image_processing_vlm.py:92-196) rescales 1/255 and
normalizes on the host; the rebuild moves that arithmetic inside the
jitted programs so image batches cross the host↔device link as uint8
(4x fewer bytes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from ospo_tpu.image_processing import ImageProcessor
from ospo_tpu.ops import pixels as pixels_ops


def _random_image(rng, w=100, h=80):
    return Image.fromarray(
        (rng.rand(h, w, 3) * 255).astype(np.uint8), "RGB")


def test_device_normalize_matches_host_float_path():
    rng = np.random.RandomState(0)
    ip = ImageProcessor(image_size=32)
    img = _random_image(rng)
    host = ip.process_one(img)                       # float32, normalized
    u8 = ip.process_one_u8(img)                      # uint8, resize only
    assert u8.dtype == np.uint8 and u8.shape == host.shape
    dev = np.asarray(pixels_ops.normalize_pixels(jnp.asarray(u8), ip))
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_device_normalize_respects_do_normalize_false():
    rng = np.random.RandomState(1)
    ip = ImageProcessor(image_size=32, do_normalize=False)
    img = _random_image(rng)
    host = ip.process_one(img)                       # rescale only
    dev = np.asarray(pixels_ops.normalize_pixels(
        jnp.asarray(ip.process_one_u8(img)), ip))
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_float_inputs_pass_through_unchanged():
    ip = ImageProcessor(image_size=32)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 8, 8, 3), jnp.float32)
    out = pixels_ops.normalize_pixels(x, ip)
    assert out is x  # trace-time no-op branch


def test_trainer_step_uint8_matches_float(tiny_trainer=None):
    """The jitted SimPO step must produce the same loss for a uint8 batch
    and its host-normalized float equivalent."""
    from ospo_tpu.config import Config
    from ospo_tpu.models import janus as janus_lib
    from ospo_tpu.processing import Processor
    from ospo_tpu.tokenizer import ByteTokenizer
    from ospo_tpu.train.trainer import SimPOTrainer

    cfg = janus_lib.tiny_janus_config()
    model = janus_lib.JanusModel.init(cfg, seed=0)
    ip = ImageProcessor(image_size=cfg.gen_image_size)
    proc = Processor(ByteTokenizer(vocab_size=cfg.language.vocab_size),
                     ip, num_image_tokens=cfg.num_image_tokens)
    config = Config.from_nested({
        "base": {"save_path": "/tmp/ospo_u8_test", "exp_name": "t"},
        "use_peft": True,
        "lora": {"lora_rank": 2, "lora_alpha": 4, "lora_dropout": 0.0},
        "optimizer": {"init_lr": 1e-4, "scheduler_type": "constant"},
        "experiment": {"seed": 0, "max_training_steps": 1,
                       "gradient_checkpointing": False, "log_steps": 100},
        "algo": {"beta": 1.0, "gamma_beta_ratio": 0.0,
                 "loss_type": "sigmoid"},
    })
    b, s = 2, cfg.gen_image_size
    rng = np.random.RandomState(3)
    u8_c = (rng.rand(b, s, s, 3) * 255).astype(np.uint8)
    u8_r = (rng.rand(b, s, s, 3) * 255).astype(np.uint8)

    def host_norm(u8):
        x = u8.astype(np.float32) * ip.rescale_factor
        return ((x - np.asarray(ip.image_mean, np.float32))
                / np.asarray(ip.image_std, np.float32))

    key = jax.random.PRNGKey(0)
    losses = []
    for c, r in (((u8_c, u8_r)), (host_norm(u8_c), host_norm(u8_r))):
        trainer = SimPOTrainer(config, model, proc)
        batch = {
            "text_ids": jnp.ones((b, 8), jnp.int32),
            "text_mask": jnp.ones((b, 8), jnp.float32),
            "chosen_pixels": jnp.asarray(c),
            "rejected_pixels": jnp.asarray(r),
        }
        _, _, m = trainer._step(trainer.trainable, trainer.opt_state,
                                **batch, rng=key)
        losses.append(float(m["loss"]))
    assert losses[0] == pytest.approx(losses[1], abs=1e-4)


def test_transfer_layout_knob(monkeypatch):
    """OSPO_U8_PIXELS=0 restores the host-normalized float32 layout on
    the shared transfer helper (A/B measurement knob + safety valve)."""
    rng = np.random.RandomState(4)
    ip = ImageProcessor(image_size=32)
    img = _random_image(rng)
    monkeypatch.delenv("OSPO_U8_PIXELS", raising=False)
    assert ip.process_one_transfer(img).dtype == np.uint8
    monkeypatch.setenv("OSPO_U8_PIXELS", "0")
    off = ip.process_one_transfer(img)
    assert off.dtype == np.float32
    np.testing.assert_allclose(off, ip.process_one(img))


def test_preference_dataset_emits_uint8(tmp_path):
    """PreferenceDataset.get_image returns the uint8 layout."""
    from ospo_tpu.pipeline.datasets import PreferenceDataset
    from ospo_tpu.processing import Processor
    from ospo_tpu.tokenizer import ByteTokenizer

    img_path = tmp_path / "a.png"
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(img_path)
    import json
    data = [{"item_id": "i0", "prompt": "p", "chosen": str(img_path),
             "rejected": str(img_path)}]
    data_path = tmp_path / "train.json"
    data_path.write_text(json.dumps(data))
    proc = Processor(ByteTokenizer(vocab_size=512),
                     ImageProcessor(image_size=16), num_image_tokens=4)
    ds = PreferenceDataset(0, str(data_path), proc)
    item = ds[0]
    assert item["chosen_pixels"].dtype == np.uint8
