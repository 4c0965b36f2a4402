"""Fail-fast model resolution: a set ``model_path`` must never silently
degrade to a random-init model (reference behavior: from_pretrained raises,
ospo/utils/model.py:26-40), and random-init requires an explicit
``model_preset`` opt-in."""

import pytest

from ospo_tpu.config import Config
from ospo_tpu.pipeline import model_factory


def cfg(**kw):
    return Config.from_nested(kw)


def test_model_path_without_weights_raises(tmp_path):
    empty = tmp_path / "Janus-Pro-7B"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="no \\*\\.safetensors"):
        model_factory.build_model(cfg(model_path=str(empty)))


def test_typod_model_path_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        model_factory.build_model(
            cfg(model_path=str(tmp_path / "does-not-exist")))


def test_no_path_no_preset_raises():
    with pytest.raises(ValueError, match="model_preset"):
        model_factory.build_model(cfg(seed=0))


def test_unknown_preset_raises():
    with pytest.raises(ValueError, match="unknown model_preset"):
        model_factory.build_model(cfg(model_preset="7b-instruct"))


def test_explicit_tiny_preset_builds():
    model = model_factory.build_model(cfg(model_preset="tiny", seed=0))
    assert model.params is not None


def test_unknown_quantize_rejected_before_build():
    # the typo check must fire BEFORE the (expensive) model build
    with pytest.raises(ValueError, match="unrecognized quantize"):
        model_factory.get_model(
            Config.from_nested(dict(quantize="int16", model_preset="tiny")))


@pytest.mark.parametrize("mode", ["int8", "int4g"])
def test_random_init_quantize_fuses_into_init(mode, capsys):
    """Random-init + quantize must quantize INSIDE the init program (the
    post-build incremental pass peaks at full-bf16-model + pack temps,
    which OOMed the 7B int4g weight gate on a 16 GB chip) — and the
    values must equal quantize-after-init exactly."""
    import jax
    import numpy as np

    from ospo_tpu.models import janus as janus_lib
    from ospo_tpu.ops import quant

    model, _, _ = model_factory.get_model(
        cfg(model_preset="tiny", seed=0, quantize=mode))
    assert "fused into the init program" in capsys.readouterr().out
    key = "q4" if mode.startswith("int4") else "q"
    layers = model.params["language_model"]["layers"]
    assert all(key in layers[name] for name in quant.QUANTIZABLE)

    ref = janus_lib.JanusModel.init(model.cfg, seed=0)
    ref_q = quant.quantize_llama_params(ref.params["language_model"],
                                        mode=mode)
    for name in quant.QUANTIZABLE:
        for leaf in layers[name]:
            a = np.asarray(layers[name][leaf], dtype=np.float32)
            b = np.asarray(ref_q["layers"][name][leaf], dtype=np.float32)
            if leaf.startswith("q"):           # int codes: bit-exact
                np.testing.assert_array_equal(a, b)
            else:                              # f32 scales: the fused
                # program's reduce/divide rounds differently at ~1e-7 rel
                np.testing.assert_allclose(a, b, rtol=1e-5)
    # embeddings untouched and identical (the weight-gate fingerprint
    # relies on this)
    np.testing.assert_array_equal(
        np.asarray(model.params["language_model"]["embed"]),
        np.asarray(ref.params["language_model"]["embed"]))


def test_checkpoint_merge_path_still_quantizes_post_build(capsys):
    """ckpt_path (LoRA merge) needs the bf16 trunk first — fused init
    quantization must NOT trigger there."""
    cfg_ = cfg(model_preset="tiny", seed=0, quantize="int8",
               ckpt_path="/nonexistent-ckpt")
    with pytest.raises(Exception):
        model_factory.get_model(cfg_)  # merge fails on the fake path...
    out = capsys.readouterr().out
    assert "fused into the init program" not in out  # ...but BEFORE that,
    # the build must have stayed bf16 (merge folds into bf16 weights)
