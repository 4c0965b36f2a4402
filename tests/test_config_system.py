"""Config engine: ${...} interpolation semantics + Hydra-style compose.

OmegaConf/Hydra behaviors the pipeline relies on: chained references
resolve transitively, a missing reference raises (not None/'None'),
cycles are detected, and a defaults list's ``_self_`` position decides
whether group configs override the primary config.
"""

import os

import pytest
import yaml

from ospo_tpu.config import Config, _interpolate, build_config, compose_config


def test_interpolation_chain_resolves_transitively():
    out = _interpolate({"a": "${b}", "b": "${c}", "c": 5})
    assert out["a"] == 5 and out["b"] == 5


def test_interpolation_missing_key_raises():
    with pytest.raises(KeyError, match="precsion"):
        _interpolate({"precision": "${precsion}"})


def test_interpolation_cycle_raises():
    with pytest.raises(ValueError, match="circular"):
        _interpolate({"a": "${b}", "b": "${a}"})


def test_interpolation_embedded_and_nested():
    out = _interpolate({
        "root": "/data",
        "paths": {"save": "${root}/out", "alias": "${paths.save}"},
    })
    assert out["paths"]["save"] == "/data/out"
    assert out["paths"]["alias"] == "/data/out"


def _write(tmp_path, rel, data):
    p = tmp_path / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(yaml.safe_dump(data))
    return p


def test_compose_self_last_groups_then_primary_wins(tmp_path):
    _write(tmp_path, "model/janus.yaml", {"hidden": 1})
    _write(tmp_path, "main.yaml", {
        "defaults": [{"model": "janus"}, "_self_"],
        "model": {"hidden": 2},
    })
    cfg = compose_config(str(tmp_path), "main", overrides=())
    assert cfg.model.hidden == 2  # _self_ last → primary overrides group


def test_compose_self_first_lets_groups_override(tmp_path):
    _write(tmp_path, "model/janus.yaml", {"hidden": 1})
    _write(tmp_path, "main.yaml", {
        "defaults": ["_self_", {"model": "janus"}],
        "model": {"hidden": 2},
    })
    cfg = compose_config(str(tmp_path), "main", overrides=())
    assert cfg.model.hidden == 1  # groups listed after _self_ win (Hydra)


def test_compose_without_self_primary_merges_last(tmp_path):
    _write(tmp_path, "model/janus.yaml", {"hidden": 1, "layers": 3})
    _write(tmp_path, "main.yaml", {
        "defaults": [{"model": "janus"}],
        "model": {"hidden": 2},
    })
    cfg = compose_config(str(tmp_path), "main", overrides=())
    assert cfg.model.hidden == 2      # primary wins by default
    assert cfg.model.layers == 3      # group keys absent from primary kept


def test_build_config_roundtrip(tmp_path):
    p = _write(tmp_path, "c.yaml", {"a": {"b": 7}, "root": "/x",
                                    "out": "${root}/y"})
    cfg = build_config(str(p), use_cli=False)
    assert isinstance(cfg, Config)
    assert cfg.a.b == 7 and cfg.out == "/x/y"
    assert cfg.missing_key is None  # absent keys read as null


def test_cfg_path_base_merge(tmp_path):
    """A config may extend a BASE via its own ``cfg_path`` key: the base
    loads first, the pointing file's keys win (configs/quota_1h.yaml
    pattern)."""
    import yaml

    from ospo_tpu.config import build_config

    base = tmp_path / "base.yaml"
    base.write_text(yaml.safe_dump(
        {"batch_size": 64, "quota": {"a": 100, "b": 200}, "seed": 1}))
    spec = tmp_path / "spec.yaml"
    spec.write_text(yaml.safe_dump(
        {"cfg_path": str(base), "quota": {"a": 10, "b": 20}}))
    c = build_config(str(spec), use_cli=False)
    assert c.batch_size == 64          # inherited from the base
    assert dict(c.quota) == {"a": 10, "b": 20}  # specialization wins
    assert c.seed == 1
