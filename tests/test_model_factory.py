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
