"""Summarize a measure_shared_prefix.sh sweep log into a compact table.

Each campaign POINT line is `POINT <tag> rc=<n> [<one-line JSON or text>]`;
bench JSON lines carry {"metric", "value", "unit", "vs_baseline", ...}.
Prints one row per point (rc, value, unit, vs_baseline, extras) so the
post-campaign BENCH_NOTES/config reconciliation starts from a table
instead of raw logs.

Usage: python scripts/campaign_summary.py [outputs-timed/shared_prefix_sweep.log]
"""

import json
import re
import sys


def parse_line(line: str):
    m = re.match(r"POINT (\S+) rc=(\d+)\s*(.*)", line.strip())
    if not m:
        return None
    tag, rc, rest = m.group(1), int(m.group(2)), m.group(3)
    row = {"tag": tag, "rc": rc}
    jstart = rest.find("{")
    if jstart >= 0:
        try:
            d = json.loads(rest[jstart:])
            row.update({k: d[k] for k in
                        ("value", "unit", "vs_baseline", "batch",
                         "tok_per_iter", "path", "rows")
                        if k in d})
        except json.JSONDecodeError:
            row["note"] = rest[:80]
    elif rest:
        row["note"] = rest[:80]
    return row


def main(path: str) -> None:
    rows = []
    with open(path) as f:
        for line in f:
            row = parse_line(line)
            if row:
                rows.append(row)
    if not rows:
        print(f"no POINT lines in {path}")
        return
    w = max(len(r["tag"]) for r in rows)
    for r in rows:
        extras = " ".join(f"{k}={r[k]}" for k in r
                          if k not in ("tag", "rc", "value", "unit"))
        val = (f"{r['value']:>10} {r.get('unit', ''):<8}"
               if "value" in r else " " * 19)
        flag = "" if r["rc"] == 0 else "  <-- FAILED"
        print(f"{r['tag']:<{w}}  rc={r['rc']}  {val} {extras}{flag}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "outputs-timed/shared_prefix_sweep.log")
