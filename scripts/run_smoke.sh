#!/usr/bin/env bash
# Full 5-stage self-improvement round on the tiny random model — exercises
# every CLI and the inter-stage JSON/PNG contracts in minutes (CPU ok:
# JAX_PLATFORMS=cpu bash scripts/run_smoke.sh).
set -e
export OSPO_PLATFORM=${OSPO_PLATFORM:-cpu}   # tiny smoke model: CPU is plenty
cd "$(dirname "$0")/.."
rm -rf outputs-smoke

for category in object color shape texture spatial non-spatial complex; do
  python -m ospo_tpu.pipeline.step1 --cfg_path configs/smoke/step1.yaml --category "$category"
done

# a random-init tiny model emits junk that the element filters reject —
# backfill placeholders so the combinatorics have material (smoke only)
python - <<'PY'
import json
fallback = {
    "object": ["dog", "cat", "car", "house"],
    "color": ["red", "blue"], "shape": ["round", "square"],
    "texture": ["soft", "rough"], "spatial": ["above", "below"],
    "non-spatial": ["A dog is running.", "A cat sits."],
    "complex": ["The red dog sat next to the blue cat."],
}
for name, words in fallback.items():
    p = f"outputs-smoke/step1/{name}_element.json"
    data = json.load(open(p))
    if len(data) < 2:
        data = sorted(set(data) | set(words))
        json.dump(data, open(p, "w"))
        print(f"# backfilled {name}: {len(data)} elements")
PY

# non-spatial/complex quotas must equal the generated element counts
NS=$(python -c "import json;print(len(json.load(open('outputs-smoke/step1/non-spatial_element.json'))))")
CX=$(python -c "import json;print(len(json.load(open('outputs-smoke/step1/complex_element.json'))))")
python - <<PY
from ospo_tpu.config import build_config
from ospo_tpu.pipeline.step1 import combine_prompt
from ospo_tpu.io import set_seed
cfg = build_config("configs/smoke/step1.yaml", use_cli=False)
cfg.category_num["non-spatial"] = $NS
cfg.category_num["complex"] = $CX
set_seed(int(cfg.seed))
combine_prompt(cfg)
PY

python -m ospo_tpu.pipeline.step2 --cfg_path configs/smoke/step2.yaml

# random-model junk may blank every long/negative prompt (the blanking rules
# of step 2 are data-dependent) — backfill from the base prompt so step 3
# has material and the round stays non-degenerate (smoke only)
python - <<'PY'
import json
p = "outputs-smoke/step2/long_prompt.json"
lp = json.load(open(p))
fixed = 0
for rec in lp:
    for i in range(len(rec["long_prompt"])):
        if not rec["long_prompt"][i]:
            rec["long_prompt"][i] = rec["prompt"]
            fixed += 1
        if not rec["negative_long_prompt"][i]:
            neg = rec.get("negative_prompt", [None] * 3)[i]
            rec["negative_long_prompt"][i] = neg or (rec["prompt"] + " (negative)")
            fixed += 1
if fixed:
    json.dump(lp, open(p, "w"), indent=4)
    print(f"# backfilled {fixed} blank long prompts")
PY

python -m ospo_tpu.pipeline.step3 --cfg_path configs/smoke/step3.yaml
python -m ospo_tpu.pipeline.step4 --cfg_path configs/smoke/step4.yaml

# a random model may reject every preference pair; synthesise a minimal
# train.json from the step-3 images so step 5 still runs
python - <<'PY'
import json, os, glob
p = "outputs-smoke/step4/train.json"
data = json.load(open(p)) if os.path.exists(p) else []
if not data:
    lp = json.load(open("outputs-smoke/step2/long_prompt.json"))
    for rec in lp:
        base = sorted(glob.glob(f"outputs-smoke/step3/base/{rec['category']}/{rec['item_id']}/*.png"))
        neg = sorted(glob.glob(f"outputs-smoke/step3/negative/{rec['category']}/{rec['item_id']}/*.png"))
        if base and neg:
            data.append({"item_id": rec["item_id"], "category": rec["category"],
                         "sub_category": rec["sub_category"], "question": ["?"],
                         "prompt": rec["prompt"], "chosen": base[0],
                         "rejected": neg[0], "metadata": {}})
    json.dump(data, open(p, "w"), indent=2)
    print(f"# synthesised {len(data)} fallback pairs")
PY

python -m ospo_tpu.pipeline.step5 --cfg_path configs/smoke/step5.yaml

# ---- non-degeneracy gate: a round that produced nothing must FAIL ----
python - <<'PY'
import glob, json, os, re, sys

errors = []

base = json.load(open("outputs-smoke/step1/base_prompt.json"))
if not base:
    errors.append("step1: base_prompt.json is empty")

lp = json.load(open("outputs-smoke/step2/long_prompt.json"))
if not lp:
    errors.append("step2: long_prompt.json is empty")

pngs = glob.glob("outputs-smoke/step3/*/*/*/*.png")
n_expected = sum(
    sum(1 for p in rec.get("long_prompt", []) if p)
    + sum(1 for p in rec.get("negative_long_prompt", []) if p)
    for rec in lp
)
if not pngs:
    errors.append("step3: zero PNGs generated")
elif n_expected and len(pngs) < max(1, n_expected // 2):
    errors.append(f"step3: only {len(pngs)} PNGs for {n_expected} prompts")

train = json.load(open("outputs-smoke/step4/train.json"))
if not train:
    errors.append("step4: train.json empty even after fallback synthesis")
for rec in train:
    if not (os.path.exists(rec["chosen"]) and os.path.exists(rec["rejected"])):
        errors.append(f"step4: missing image for item {rec['item_id']}")
        break

steps = []
for d in glob.glob("outputs-smoke/step5/*/step_*"):
    m = re.search(r"step_(\d+)$", d)
    if m and os.path.exists(os.path.join(d, "lora.npz")):
        steps.append(int(m.group(1)))
if not steps:
    errors.append("step5: no checkpoint written")
elif max(steps) < 1:
    errors.append(f"step5: trainer never advanced (max global_step {max(steps)})")

if errors:
    print("SMOKE RUN DEGENERATE:")
    for e in errors:
        print("  -", e)
    sys.exit(1)
print(f"# non-degeneracy: {len(base)} base prompts, {len(lp)} long-prompt "
      f"items, {len(pngs)} PNGs, {len(train)} train pairs, "
      f"final checkpoint step {max(steps)}")
PY

echo "SMOKE RUN COMPLETE"
find outputs-smoke -name "*.json" | sort
