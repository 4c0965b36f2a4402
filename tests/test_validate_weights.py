"""The real-weights quality gate (scripts/validate_weights.py) must run
end-to-end on a tiny synthetic checkpoint: port stats, module forwards, the
quantization-divergence harness, and sample generation + scoring — so the
day a real Janus-Pro checkpoint appears, validation is one command."""

import json
import os
import sys

import pytest

pytest.importorskip("safetensors.torch")
pytest.importorskip("torch")

from ospo_tpu.models import janus as janus_lib
from ospo_tpu.models import synthetic

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_validate_weights_on_synthetic_checkpoint(tmp_path):
    import validate_weights

    cfg = janus_lib.tiny_janus_config()
    ckpt = synthetic.write_synthetic_checkpoint(str(tmp_path / "ckpt"), cfg)

    report = validate_weights.main([
        "--model_path", ckpt,
        "--out", str(tmp_path / "val"),
        "--tokens", "32",
        "--batch", "2",
        "--quantize", "int8",
    ])

    assert report["port"]["ok"]
    assert report["modules"]["ok"]
    div = report["divergence"]
    assert "kv_int8_vs_bf16" in div and "kv_int4_vs_bf16" in div
    for key in ("kv_int8_vs_bf16", "kv_int4_vs_bf16"):
        assert 0.0 <= div[key]["top1_agree"] <= 1.0
        assert div[key]["kl_mean"] >= 0.0
        assert len(div[key]["by_quarter"]) == 4
    assert report["samples"]["ok"]
    assert len(report["samples"]["samples"]) == 3

    on_disk = json.load(open(tmp_path / "val" / "validation_report.json"))
    assert on_disk["model_path"] == ckpt
    for i in range(3):
        assert os.path.exists(tmp_path / "val" / f"sample_{i}.png")


def test_weight_divergence_mode(tmp_path):
    """--weight-divergence (bf16 vs int8 trunk) on the tiny model."""
    import validate_weights

    cfg = janus_lib.tiny_janus_config()
    ckpt = synthetic.write_synthetic_checkpoint(str(tmp_path / "ckpt"), cfg)
    report = validate_weights.main([
        "--model_path", ckpt,
        "--out", str(tmp_path / "val"),
        "--phases", "divergence",
        "--tokens", "16",
        "--batch", "2",
        "--quantize", "none",
        "--weight-divergence",
    ])
    for key in ("w_int8_vs_bf16", "w_int4_vs_bf16"):
        w = report["divergence"][key]
        assert w["kl_mean"] >= 0.0 and 0.0 <= w["top1_agree"] <= 1.0
