#!/usr/bin/env bash
set -e
cd "$(dirname "$0")/.."
python -m ospo_tpu.pipeline.inference --config_dir configs --config_name inference "$@"
