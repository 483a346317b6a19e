#!/bin/bash
# Round-5 phase-2 chip queue: re-attempts whatever the main r5 queue had to
# skip for deadline, in VALUE order (serve-tail closes round-3 task 6;
# gp-fidelity settles the inverted 40k-smoke sign; then MIPS overlap, QA-OGP,
# and the pruned 250M store pass). Same admission discipline as
# chip_queue_r5.sh: absolute epoch deadline, budgets >= 3600 s (advisor r4),
# strictly serial, jobs never killed early by hand.
#
# Usage: DEADLINE_EPOCH=$(date -d 'YYYY-mm-dd HH:MM UTC' +%s) \
#          bash exp_scripts/chip_queue_r5_phase2.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p exp_outputs
Q=exp_outputs/chip_queue_r5.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (absolute epoch seconds)}

note() { echo "# [$(date -u +%H:%M:%S)] $*" | tee -a "$Q"; }

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

run_job serve_tail_profile 5400 python exp_scripts/serve_tail_profile.py
run_job gp_fidelity_8m 7200 python exp_scripts/gp_fidelity_8m.py
run_job mips_overlap_8m 7200 python exp_scripts/mips_overlap_8m.py
run_job qa_ogp_8m 7200 python exp_scripts/qa_ogp_8m.py
run_job scale250m_store_pruned 7200 \
  python -m gpann_tpu.cli.scale_bench --n 250000000 --d 96 --shards 96 \
    --dtype u8 --method gp --base virtual --layout shard-major \
    --isolate-stages --nq 64 --sub-nprobe 4 --sub-size 65536 \
    --max-nprobes 8 --out exp_outputs/scale250m_u8_gp_store_pruned_t4.csv

note "phase-2 queue complete"
