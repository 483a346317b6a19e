#!/bin/bash
# Serial chip-job queue, round 5. One job owns the chip at a time
# (CLAUDE.md: two processes touching the TPU correlates with hour-long
# tunnel wedges; never kill a blocked chip job early).
#
# Advisor r4 fixes baked in:
# - admission compares an ABSOLUTE epoch deadline against now + the job's
#   own budget (the r4 HHMM comparison broke across midnight and admitted
#   jobs that held the chip hours past the cutoff),
# - every budget >= 3600 s (heavy launches intermittently block 15-25 min
#   even with warm compile caches; docs/PERF.md).
#
# Usage: DEADLINE_EPOCH=$(date -d '+10 hours' +%s) bash exp_scripts/chip_queue_r5.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p exp_outputs
Q=exp_outputs/chip_queue_r5.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (absolute epoch seconds)}

note() { echo "# [$(date -u +%H:%M:%S)] $*" | tee -a "$Q"; }

run_job() { # name budget_s cmd...
  local name=$1 budget=$2; shift 2
  local now; now=$(date +%s)
  if (( now + budget > DEADLINE_EPOCH )); then
    note "skip $name: budget ${budget}s does not fit before deadline"
    return 0
  fi
  note "start $name (budget ${budget}s)"
  timeout "$budget" "$@" >> "exp_outputs/${name}.out" 2>> "exp_outputs/${name}.log"
  local rc=$?
  note "done $name rc=$rc"
}

# 1. THE 1B RUN (VERDICT r4 task 2): all stages + curve, shard-major store.
#    Round 4 measured build ~3.2 h before a host recycle killed it at the
#    router stage; budget generously.
run_job scale1b_r5 23400 \
  python -m gpann_tpu.cli.scale_bench --n 1000000000 --d 64 --shards 64 \
    --dtype u8 --method gp --base virtual --layout shard-major \
    --isolate-stages --shard-chunk 8 --max-nprobes 16 \
    --out exp_outputs/scale1b.csv

# 2. 250M store curve pass (VERDICT r4 task 3): same generator/seed/method
#    as the round-3 gather-bound record (2,695 s / 24 GB); the store path
#    should be upload/compute-bound.
run_job scale250m_store 12600 \
  python -m gpann_tpu.cli.scale_bench --n 250000000 --d 96 --shards 96 \
    --dtype u8 --method gp --base virtual --layout shard-major \
    --isolate-stages --shard-chunk 12 --max-nprobes 16 \
    --out exp_outputs/scale250m_u8_gp_store.csv

# 3. 250M pruned + contiguous (VERDICT r4 task 5): sub-cluster-major store,
#    small-batch scenario like the round-3 pruned runs (64 q, probe cap 8).
run_job scale250m_store_pruned 7200 \
  python -m gpann_tpu.cli.scale_bench --n 250000000 --d 96 --shards 96 \
    --dtype u8 --method gp --base virtual --layout shard-major \
    --isolate-stages --nq 64 --sub-nprobe 4 --sub-size 65536 \
    --max-nprobes 8 --out exp_outputs/scale250m_u8_gp_store_pruned_t4.csv

# 4-7. The four scale experiments the round-4 cutoff skipped (task 4).
run_job gp_fidelity_8m 7200 python exp_scripts/gp_fidelity_8m.py
run_job mips_overlap_8m 7200 python exp_scripts/mips_overlap_8m.py
run_job serve_tail_profile 5400 python exp_scripts/serve_tail_profile.py
run_job qa_ogp_8m 7200 python exp_scripts/qa_ogp_8m.py

note "queue complete"
