"""Merge per-stage timed-round attempts into the final ROUND_r03.json.

The 200-item timed round ran in passes (per-stage subprocesses; failed
stages re-run after fixes — see BENCH_NOTES "Timed mini-round"): this
stitches the per-stage results from the successful passes into one
artifact with the budget-model comparison.
"""

import json
import sys

out = {"items": 200, "preset": "7b", "stages": {}, "notes": []}
for path in sys.argv[1:-1]:
    with open(path) as f:
        rep = json.load(f)
    for name, stage in rep.get("stages", {}).items():
        cur = out["stages"].get(name)
        # keep the latest OK run; fall back to the latest attempt
        if cur is None or (stage.get("ok") and not cur.get("ok")) \
                or (stage.get("ok") == cur.get("ok")):
            out["stages"][name] = {**stage, "source": path}
    if rep.get("budget_model") and not out.get("budget_model"):
        out["budget_model"] = rep["budget_model"]

out["total_seconds"] = round(
    sum(s["seconds"] for s in out["stages"].values()), 1)
out["all_ok"] = all(s.get("ok") for s in out["stages"].values())
with open(sys.argv[-1], "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out, indent=1))
