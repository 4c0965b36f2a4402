"""Inference CLI: prompt list → PNG files; TP-sharded engine execution."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from ospo_tpu.config import Config


def test_inference_main(tmp_path):
    from ospo_tpu.pipeline import inference

    prompts = ["A red moon", "A white sky"]
    data_path = tmp_path / "prompts.json"
    json.dump(prompts, open(data_path, "w"))

    config = Config.from_nested({
        "seed": [0, 1],
        "batch_size": 2,
        "data_path": str(data_path),
        "save_path": str(tmp_path / "results"),
        "model_preset": "tiny",
        "generation_config": {"temperature": 1.0, "cfg_weight": 5.0},
    })
    inference.main(config)
    pngs = sorted(os.listdir(tmp_path / "results"))
    assert len(pngs) == 4  # 2 prompts × 2 seeds
    assert "A red moon_0.png" in pngs and "A white sky_1.png" in pngs


def test_image_engine_with_tp_sharded_params():
    """The CFG decode engine must run with tensor-parallel sharded weights
    (GSPMD infers the collectives from the param shardings)."""
    from ospo_tpu.engine.image_engine import ImageGenEngine
    from ospo_tpu.image_processing import ImageProcessor
    from ospo_tpu.models import janus
    from ospo_tpu.parallel import mesh as mesh_lib
    from ospo_tpu.processing import Processor, t2i_prompt
    from ospo_tpu.tokenizer import ByteTokenizer

    cfg = janus.tiny_janus_config()
    model = janus.JanusModel.init(cfg, seed=0)
    tok = ByteTokenizer(vocab_size=cfg.language.vocab_size)
    proc = Processor(tok, ImageProcessor(image_size=16), num_image_tokens=4)

    eng = ImageGenEngine(model, proc, image_token_num=16, img_size=16,
                         patch_size=4)
    prompts = [t2i_prompt(proc, "A cat"), t2i_prompt(proc, "A dog")]
    ref = eng.generate_tokens(prompts, seed=0)

    mesh = mesh_lib.create_mesh(n_devices=4, model_parallel=2)
    model.params = mesh_lib.shard_janus_params(model.params, mesh)
    sharded_eng = ImageGenEngine(model, proc, image_token_num=16, img_size=16,
                                 patch_size=4)
    out = sharded_eng.generate_tokens(prompts, seed=0)
    np.testing.assert_array_equal(ref, out)
