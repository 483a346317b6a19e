#!/bin/bash
# Round-5 FINAL chip queue (post fast-generator): the 1B run first, then
# the 250M store curve pass, then the skipped 8M experiments.
#
# Everything scale runs on --kind hard2 (eval/synth.py): the counter-based
# native generator measured 0.93 s per 1M x 64 chunk vs 8.9 s for numpy
# "hard" — the r4/r5 1B builds were generator-bound (README §1B), and with
# host restarts wiping every non-committed artifact, wall-clock IS the
# failure risk. Same distribution family, same difficulty regime.
#
# Discipline (CLAUDE.md + advisor r4): one job owns the chip; budgets
# >= 3600 s; absolute-epoch deadline admission counting the job's own
# budget; .done markers so a re-run resumes; never hand-kill a chip job.
#
# Usage: DEADLINE_EPOCH=$(date -d '+7 hours' +%s) [WAIT_PID=...] \
#          bash exp_scripts/chip_queue_r5f.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p exp_outputs
Q=exp_outputs/chip_queue_r5.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (absolute epoch seconds)}

note() { echo "# [$(date -u +%H:%M:%S)] $*" | tee -a "$Q"; }

if [[ -n "${WAIT_PID:-}" ]]; then
  note "r5f queue waiting on pid ${WAIT_PID}"
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

# 0. BENCH COMPILE-CACHE HARVEST (VERDICT r4 task 1, the #1 deliverable):
#    run bench.py with a FRESH persistent-cache dir so the tarball holds
#    exactly the bench programs, then pack it for bench.py's cold-start
#    seeding. Runs first: once the tarball is committed, a host restart
#    can no longer push the driver's bench past its ~1800 s budget.
run_job bench_harvest 4500 bash -c '
  rm -rf /tmp/bench_cache_harvest &&
  GPANN_TPU_COMPILE_CACHE_DIR=/tmp/bench_cache_harvest python bench.py &&
  tar czf exp_artifacts/bench_jax_cache.tar.gz -C /tmp/bench_cache_harvest .'

# 1. THE 1B RUN (VERDICT r4 task 2). With hard2 the generation passes drop
#    ~10x; expected ~2-2.5 h total (was ~4.5 h). Budget stays generous.
run_job scale1b_r5f 16200 \
  python -m gpann_tpu.cli.scale_bench --n 1000000000 --d 64 --shards 64 \
    --kind hard2 --dtype u8 --method gp --base virtual \
    --layout shard-major --isolate-stages --shard-chunk 8 \
    --max-nprobes 16 --out exp_outputs/scale1b.csv

# 2. 250M store curve pass (VERDICT r4 task 3): the store-vs-gather
#    comparison. Round-3 gather-bound record: 2,695 s; target <= 300 s.
run_job scale250m_store 9000 \
  python -m gpann_tpu.cli.scale_bench --n 250000000 --d 96 --shards 96 \
    --kind hard2 --dtype u8 --method gp --base virtual \
    --layout shard-major --isolate-stages --shard-chunk 12 \
    --max-nprobes 16 --out exp_outputs/scale250m_u8_gp_store.csv

# 3. 250M pruned + contiguous (VERDICT r4 task 5), reusing job 2's store.
run_job scale250m_store_pruned 5400 \
  python -m gpann_tpu.cli.scale_bench --n 250000000 --d 96 --shards 96 \
    --kind hard2 --dtype u8 --method gp --base virtual \
    --layout shard-major --isolate-stages --nq 64 --sub-nprobe 4 \
    --sub-size 65536 --max-nprobes 8 \
    --out exp_outputs/scale250m_u8_gp_store_pruned_t4.csv

# 4-7. The four skipped 8M experiments (VERDICT r4 task 4).
run_job gp_fidelity_8m 5400 python exp_scripts/gp_fidelity_8m.py
run_job mips_overlap_8m 5400 python exp_scripts/mips_overlap_8m.py
run_job serve_tail_profile 3600 python exp_scripts/serve_tail_profile.py
run_job qa_ogp_8m 5400 python exp_scripts/qa_ogp_8m.py

note "r5f queue complete"
