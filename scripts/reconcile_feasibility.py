"""Re-derive the quota feasibility arithmetic from an INTEGRATED round.

VERDICT r4 #3: the `quota_1h.yaml` model was stage-point arithmetic with
a +12% boundary tax, and the only integrated measurement (round-4 step 2:
16.1 s/item) contradicted it ~8x.  Round 5's stages dump per-signature
compile/steady splits (utils/profiling.DispatchStats), so the model can
now be corrected from the data the round itself produces.

Reads a ROUND report (ROUND_r05.json), splits each stage's wall into
  compile_s       — one-time per-signature (persistent-cache) cost,
  scalable_s      — everything else (device steady-state + host I/O +
                    model load; conservatively ALL scaled with items),
and projects two quotas on a v5e-8:
  cold  = compile_s (paid once, all 8 processes compile the same
          signatures in parallel wall) + scalable_s * scale / 8
  warm  = scalable_s * scale / 8      (persistent compile cache hit —
          the steady-state regime the reference's repeated rounds run in)

Scale factors per stage follow the work each stage actually does per
item (reference loop: /root/reference/scripts/run.sh:6-17):
  step1   fixed element-generation probe (quota repeats the program)
  step2   per item (3 seeds x negative+dense gen)
  step3   per item (6 images x 576 tokens)
  step4a  per item (question gen)
  step4b  per item (24-way scoring + pair selection)
  step5   per selected pair (pairs scale with items)

Usage:
    python scripts/reconcile_feasibility.py [ROUND_r05.json]
        [--quotas 2304,16000] [--chips 8] [--md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# stages whose work scales with the item count (step1's probe is a fixed
# small element-gen quota; its cost is carried as-is)
SCALED = ("step2", "step3", "step4a", "step4b", "step5")


def stage_split(s: dict) -> tuple:
    """(compile_s, scalable_s) for one stage record.

    Stages with engines report ``compile_s_est`` (DispatchStats); step 5
    reports ``train_stats.first_update_s`` instead — the first optimizer
    update bounds the train-step compile (conservative: it also contains
    one real update's execution)."""
    wall = float(s["seconds"])
    compile_s = float(s.get("compile_s_est") or 0.0)
    if not compile_s and isinstance(s.get("train_stats"), dict):
        compile_s = float(s["train_stats"].get("first_update_s") or 0.0)
    # chip-health anomaly wall (DispatchStats >4x-first windows) is
    # neither compile nor steady — drop it from the scalable share
    anomaly_s = float(s.get("anomaly_s_est") or 0.0)
    return compile_s, max(0.0, wall - compile_s - anomaly_s)


def project(report: dict, quota: int, chips: int) -> dict:
    items = int(report["items"])
    stages = report["stages"]
    rows, cold_total, warm_total = [], 0.0, 0.0
    for name, s in stages.items():
        compile_s, scal = stage_split(s)
        scale = (quota / items) if name in SCALED else 1.0
        warm = scal * scale / (chips if name in SCALED else 1)
        cold = compile_s + warm
        rows.append({
            "stage": name, "measured_wall_s": s["seconds"],
            "compile_s": round(compile_s, 1),
            "scalable_s": round(scal, 1),
            "scale": round(scale, 2),
            "cold_s": round(cold, 1), "warm_s": round(warm, 1),
        })
        cold_total += cold
        warm_total += warm
    return {"quota": quota, "chips": chips, "basis_items": items,
            "rows": rows,
            "cold_total_s": round(cold_total, 1),
            "cold_total_h": round(cold_total / 3600, 2),
            "warm_total_s": round(warm_total, 1),
            "warm_total_h": round(warm_total / 3600, 2)}


def to_markdown(p: dict) -> str:
    out = [f"### quota {p['quota']} on {p['chips']} chips "
           f"(basis: {p['basis_items']}-item integrated round)",
           "",
           "| Stage | measured wall | compile | scalable | xscale "
           "| cold | warm |",
           "|---|---|---|---|---|---|---|"]
    for r in p["rows"]:
        out.append(
            f"| {r['stage']} | {r['measured_wall_s']:.0f} s "
            f"| {r['compile_s']:.0f} s | {r['scalable_s']:.0f} s "
            f"| {r['scale']:.2f} | {r['cold_s']/60:.1f} min "
            f"| {r['warm_s']/60:.1f} min |")
    out.append(f"| **total** | | | | | **{p['cold_total_h']:.2f} h** "
               f"| **{p['warm_total_h']:.2f} h** |")
    return "\n".join(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("report", nargs="?",
                    default=os.path.join(REPO, "ROUND_r05.json"))
    ap.add_argument("--quotas", default="2304,16000")
    ap.add_argument("--chips", type=int, default=8)
    ap.add_argument("--md", action="store_true",
                    help="print markdown tables for BENCH_NOTES")
    args = ap.parse_args()

    with open(args.report) as f:
        report = json.load(f)
    missing = [n for n, s in report["stages"].items()
               if "compile_s_est" not in s
               and not isinstance(s.get("train_stats"), dict)]
    if missing:
        print(f"# WARNING: no compile/steady split for {missing} — "
              "their whole wall is treated as scalable (conservative)",
              file=sys.stderr)

    results = [project(report, int(q), args.chips)
               for q in args.quotas.split(",")]
    if args.md:
        print("\n\n".join(to_markdown(p) for p in results))
    else:
        print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
