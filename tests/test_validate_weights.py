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


def test_two_process_weight_gate(tmp_path):
    """--export-reference / --compare-reference: the weight gate split
    across two model loads (how it runs on a 16GB chip where bf16 and
    quantized 7B trunks cannot co-reside).  Comparing an identically
    loaded bf16 model against the exported reference must be exact —
    this also proves checkpoint loads are bit-reproducible."""
    import validate_weights

    cfg = janus_lib.tiny_janus_config()
    ckpt = synthetic.write_synthetic_checkpoint(str(tmp_path / "ckpt"), cfg)
    ref = str(tmp_path / "ref")
    common = ["--model_path", ckpt, "--phases", "divergence",
              "--tokens", "16", "--batch", "2"]
    rep = validate_weights.main(
        common + ["--out", str(tmp_path / "v0"), "--quantize", "none",
                  "--export-reference", ref])
    assert rep["divergence"]["exported"] == ref
    assert os.path.exists(os.path.join(ref, "forced.npy"))

    # self-comparison (same bf16 weights, fresh load) → zero divergence
    rep = validate_weights.main(
        common + ["--out", str(tmp_path / "v1"), "--quantize", "none",
                  "--compare-reference", ref])
    w = rep["divergence"]["w_none_vs_none"]
    assert w["kl_mean"] < 1e-4 and w["top1_agree"] == 1.0

    # quantized comparison → finite, nonzero divergence reported
    rep = validate_weights.main(
        common + ["--out", str(tmp_path / "v2"), "--quantize", "int4",
                  "--compare-reference", ref])
    w = rep["divergence"]["w_int4_vs_none"]
    assert w["kl_mean"] >= 0.0 and 0.0 <= w["top1_agree"] <= 1.0
    assert len(w["by_quarter"]) == 4


def test_two_process_scoring_gate(tmp_path):
    """--phases scoring: the scoring-WORKLOAD gate (yes/no readout
    divergence + pair-selection agreement) split across two loads.
    Self-comparison of the same bf16 weights must be exact — readouts
    identical and every pair decision reproduced."""
    import validate_weights

    cfg = janus_lib.tiny_janus_config()
    ckpt = synthetic.write_synthetic_checkpoint(str(tmp_path / "ckpt"), cfg)
    ref = str(tmp_path / "ref")
    common = ["--model_path", ckpt, "--phases", "scoring"]
    # the bf16 reference process must NEVER touch the shared-prefix
    # program: on the chip a 14 GB bf16 trunk cannot hold a shared cache
    # (the first 7B gate attempt crashed the remote compile helper there
    # — main() maps --quantize none to the label "bf16", which an early
    # fix misclassified as quantized).  Poisoning the shared path pins
    # the branch choice, not just the numbers.
    from ospo_tpu.engine.scoring import ScoringEngine

    def _boom(self, *a, **k):
        raise AssertionError(
            "bf16 reference process entered the shared-prefix path")

    orig = ScoringEngine._execute_shared_multi
    ScoringEngine._execute_shared_multi = _boom
    try:
        rep = validate_weights.main(
            common + ["--out", str(tmp_path / "v0"), "--quantize", "none",
                      "--export-reference", ref])
    finally:
        ScoringEngine._execute_shared_multi = orig
    assert rep["scoring"]["exported"] == ref
    assert os.path.exists(os.path.join(ref, "scoring_ref.npz"))

    rep = validate_weights.main(
        common + ["--out", str(tmp_path / "v1"), "--quantize", "none",
                  "--compare-reference", ref])
    m = rep["scoring"]["scoring_bf16_vs_bf16"]
    assert m["max_abs_dp_yes"] < 1e-6
    assert m["answer_agree"] == 1.0 and m["pair_agree"] == 1.0

    rep = validate_weights.main(
        common + ["--out", str(tmp_path / "v2"), "--quantize", "int8",
                  "--compare-reference", ref])
    m = rep["scoring"]["scoring_int8_vs_bf16"]
    assert m["mean_abs_dp_yes"] >= 0.0
    assert 0.0 <= m["pair_agree"] <= 1.0
