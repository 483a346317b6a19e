#!/bin/bash
# Round-5 takeover queue: runs after the in-flight 250M store job releases
# the chip. The 1B curve retry goes FIRST (VERDICT r4 missing #1): the
# original attempt OOMed HBM scanning a ~16.4M-row shard block
# (streamed.py _scan_row_limit docstring); every build stage artifact is
# cached, so the retry pays only the curve pass with the sliced scan.
# Then the remaining round-5 jobs in VERDICT value order.
#
# Same discipline as chip_queue_r5.sh: one job owns the chip at a time,
# absolute-epoch deadline admission, budgets >= 3600 s, jobs never killed
# early by hand, .done markers so re-runs are idempotent.
#
# Usage: WAIT_PID=<pid of current chip job> \
#        DEADLINE_EPOCH=$(date -d 'YYYY-mm-dd HH:MM UTC' +%s) \
#          bash exp_scripts/chip_queue_r5c.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p exp_outputs
Q=exp_outputs/chip_queue_r5.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (absolute epoch seconds)}

note() { echo "# [$(date -u +%H:%M:%S)] $*" | tee -a "$Q"; }

if [[ -n "${WAIT_PID:-}" ]]; then
  note "takeover queue waiting on pid ${WAIT_PID}"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  note "pid ${WAIT_PID} exited; chip free"
fi

run_job() { # name budget_s cmd...
  local name=$1 budget=$2; shift 2
  if [[ -e "exp_outputs/${name}.done" ]]; then
    note "skip $name: already done"
    return 0
  fi
  local now; now=$(date +%s)
  if (( now + budget > DEADLINE_EPOCH )); then
    note "skip $name: budget ${budget}s does not fit before deadline"
    return 0
  fi
  note "start $name (budget ${budget}s)"
  timeout "$budget" "$@" >> "exp_outputs/${name}.out" 2>> "exp_outputs/${name}.log"
  local rc=$?
  note "done $name rc=$rc"
  (( rc == 0 )) && touch "exp_outputs/${name}.done"
}

# 1. The 1B curve retry — stages cache-hit, only the (now sliced) curve runs.
run_job scale1b_r5_retry 7200 \
  python -m gpann_tpu.cli.scale_bench --n 1000000000 --d 64 --shards 64 \
    --dtype u8 --method gp --base virtual --layout shard-major \
    --isolate-stages --shard-chunk 8 --max-nprobes 16 \
    --out exp_outputs/scale1b.csv

# 2-6. Remaining round-5 jobs, VERDICT value order.
run_job serve_tail_profile 5400 python exp_scripts/serve_tail_profile.py
run_job gp_fidelity_8m 7200 python exp_scripts/gp_fidelity_8m.py
run_job scale250m_store_pruned 7200 \
  python -m gpann_tpu.cli.scale_bench --n 250000000 --d 96 --shards 96 \
    --dtype u8 --method gp --base virtual --layout shard-major \
    --isolate-stages --nq 64 --sub-nprobe 4 --sub-size 65536 \
    --max-nprobes 8 --out exp_outputs/scale250m_u8_gp_store_pruned_t4.csv
run_job mips_overlap_8m 7200 python exp_scripts/mips_overlap_8m.py
run_job qa_ogp_8m 7200 python exp_scripts/qa_ogp_8m.py

note "takeover queue complete"
