#!/bin/bash
# Round-5 FINAL tail queue: re-attempts whatever chip_queue_r5c.sh had to
# deadline-skip, with budgets at the advisor floor (3600 s) instead of the
# conservative 7200 s — the 7200 s budgets stop fitting after ~20:10 UTC
# even though the jobs' realistic costs are 25-60 min (gp_fidelity and
# mips_overlap reuse the cached 8M hard base + GT + subsample partition in
# ~/.cache/gpann_tpu/hardserve_*.npz; the pruned 250M pass reuses the
# shard-major store built by the scale250m_store job).
#
# Same discipline: one job owns the chip, absolute-epoch deadline admission
# (budget counted against the deadline), .done markers, never hand-killed.
#
# Usage: DEADLINE_EPOCH=... [WAIT_PID=...] bash exp_scripts/chip_queue_r5e.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p exp_outputs
Q=exp_outputs/chip_queue_r5.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (absolute epoch seconds)}

note() { echo "# [$(date -u +%H:%M:%S)] $*" | tee -a "$Q"; }

if [[ -n "${WAIT_PID:-}" ]]; then
  note "tail queue waiting on pid ${WAIT_PID}"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  note "pid ${WAIT_PID} exited; chip free"
fi

bash exp_scripts/queue_done_sync.sh

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

run_job serve_tail_profile 3600 python exp_scripts/serve_tail_profile.py
run_job gp_fidelity_8m 3600 python exp_scripts/gp_fidelity_8m.py
run_job scale250m_store_pruned 3600 \
  python -m gpann_tpu.cli.scale_bench --n 250000000 --d 96 --shards 96 \
    --dtype u8 --method gp --base virtual --layout shard-major \
    --isolate-stages --nq 64 --sub-nprobe 4 --sub-size 65536 \
    --max-nprobes 8 --out exp_outputs/scale250m_u8_gp_store_pruned_t4.csv
run_job mips_overlap_8m 3600 python exp_scripts/mips_overlap_8m.py
run_job qa_ogp_8m 3600 python exp_scripts/qa_ogp_8m.py

note "tail queue complete"
