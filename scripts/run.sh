#!/usr/bin/env bash
# Full self-improvement round: step1 ×7 categories, then steps 2-5.
# Equivalent of the reference scripts/run.sh.
set -e
cd "$(dirname "$0")/.."

for category in object color shape texture spatial non-spatial complex; do
  python -m ospo_tpu.pipeline.step1 --cfg_path configs/step1.yaml --category "$category" "$@"
done
python -m ospo_tpu.pipeline.step2 --cfg_path configs/step2.yaml "$@"
python -m ospo_tpu.pipeline.step3 --cfg_path configs/step3.yaml "$@"
python -m ospo_tpu.pipeline.step4 --cfg_path configs/step4.yaml "$@"
python -m ospo_tpu.pipeline.step5 --cfg_path configs/step5.yaml "$@"
