"""scripts/reconcile_feasibility.py — the VERDICT r4 #3 corrector.

The quota model must be derivable from an integrated ROUND report:
compile cost counted once per stage, scalable work scaled by quota/items
and divided over chips, step 5's split taken from train_stats.
"""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "reconcile_feasibility.py")

spec = importlib.util.spec_from_file_location("reconcile_feasibility", SCRIPT)
rf = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rf)

REPORT = {
    "items": 200,
    "stages": {
        "step1": {"seconds": 1000.0, "ok": True, "compile_s_est": 900.0},
        "step2": {"seconds": 2000.0, "ok": True, "compile_s_est": 400.0},
        "step5": {"seconds": 500.0, "ok": True,
                  "train_stats": {"first_update_s": 100.0}},
    },
}


def test_projection_arithmetic():
    p = rf.project(REPORT, quota=1600, chips=8)
    rows = {r["stage"]: r for r in p["rows"]}
    # step1 is a fixed probe: no item scaling, no chip division
    assert rows["step1"]["warm_s"] == 100.0
    assert rows["step1"]["cold_s"] == 1000.0
    # step2 scales 8x over items, /8 chips -> scalable stays 1600s warm
    assert rows["step2"]["scale"] == 8.0
    assert rows["step2"]["warm_s"] == 1600.0
    assert rows["step2"]["cold_s"] == 2000.0
    # step5's compile comes from train_stats.first_update_s
    assert rows["step5"]["compile_s"] == 100.0
    assert rows["step5"]["warm_s"] == 400.0 * 8 / 8
    assert p["cold_total_s"] == 1000.0 + 2000.0 + 500.0
    assert p["warm_total_s"] == 100.0 + 1600.0 + 400.0


def test_stage_split_prefers_engine_stats_over_train_stats():
    c, s = rf.stage_split({"seconds": 100.0, "compile_s_est": 30.0,
                           "train_stats": {"first_update_s": 99.0}})
    assert (c, s) == (30.0, 70.0)


def test_cli_markdown(tmp_path):
    rp = tmp_path / "r.json"
    rp.write_text(json.dumps(REPORT))
    out = subprocess.run(
        [sys.executable, SCRIPT, str(rp), "--quotas", "1600", "--md"],
        capture_output=True, text=True, check=True)
    assert "quota 1600 on 8 chips" in out.stdout
    assert "step5" in out.stdout
    # no missing-split warning: every stage has one
    assert "WARNING" not in out.stderr


def test_stage_split_drops_anomaly_wall():
    """Chip-health anomaly wall (DispatchStats >4x-first windows) must not
    be scaled as steady-state — round 5's rerun carried ~1320 s of
    degraded-tunnel dispatches in one signature."""
    c, s = rf.stage_split({"seconds": 2611.2, "compile_s_est": 445.9,
                           "anomaly_s_est": 1320.8})
    assert c == 445.9
    assert abs(s - (2611.2 - 445.9 - 1320.8)) < 1e-6
