#!/usr/bin/env bash
# Multi-process pipeline launcher — the TPU-native equivalent of the
# reference's Lightning DDP spawn (ospo/utils/generate.py:5-15 wired
# through scripts/run.sh).  Every pipeline step CLI already handles the
# distributed runtime via ospo_tpu.platform.maybe_init_distributed():
# each process walks a strided shard of the work list
# (io.shard_for_process) and results merge through io.save_json_sharded
# (all-gather + host-0 dedup-by-item_id — the save_json_ddp semantics of
# ospo/utils/common.py:36-58).
#
# Single machine, N processes:
#   scripts/run_multihost.sh <nprocs> <python-module> [args...]
# e.g. a 2-process CPU run of step 2:
#   OSPO_PLATFORM=cpu scripts/run_multihost.sh 2 ospo_tpu.pipeline.step2 \
#       --cfg_path configs/step2.yaml
#
# Step 5 (training) also runs under this launcher: every process builds
# the identical seeded global batch and shards it over a GLOBAL
# (data, model) mesh (pass model.data_parallel=<total chips>); GSPMD
# all-reduces the gradients and process 0 writes checkpoints.
#
# Real multi-host TPU pods: run ONE process per host through your
# scheduler with the same variables set per host —
#   OSPO_COORDINATOR=<host0-addr>:12355 OSPO_NUM_PROCESSES=<hosts> \
#   OSPO_PROCESS_ID=<this-host> python -m ospo_tpu.pipeline.step3 ...
# (jax.distributed discovers the per-host TPU chips automatically).
set -euo pipefail

if [ $# -lt 2 ]; then
  echo "usage: $0 <nprocs> <python-module> [args...]" >&2
  exit 2
fi

NPROCS=$1; shift
PORT=${OSPO_COORD_PORT:-$((12000 + RANDOM % 20000))}
COORD=${OSPO_COORDINATOR:-localhost:$PORT}

pids=()
for i in $(seq 0 $((NPROCS - 1))); do
  OSPO_COORDINATOR=$COORD \
  OSPO_NUM_PROCESSES=$NPROCS \
  OSPO_PROCESS_ID=$i \
    python -m "$@" &
  pids+=($!)
done

rc=0
for p in "${pids[@]}"; do
  wait "$p" || rc=$?
done
exit $rc
