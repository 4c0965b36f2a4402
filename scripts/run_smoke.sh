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
echo "SMOKE RUN COMPLETE"
find outputs-smoke -name "*.json" | sort
