#!/bin/bash
# Round-5 tail queue: validate the driver's exact cold-bench path (compile
# cache SEEDED from the repo tarball, not warm from this boot), then
# re-attempt anything chip_queue_r5f.sh had to deadline-skip.
#
# The validation deliberately clears the default persistent cache dir: the
# bench_harvest job compiled into /tmp/bench_cache_harvest, so the default
# dir never held the bench programs anyway — the driver's end-of-round
# bench.py will live or die by _seed_compile_cache, and this run proves
# that path on the real chip. (It also leaves the default dir warm.)
#
# Usage: DEADLINE_EPOCH=... [WAIT_PID=...] bash exp_scripts/chip_queue_r5g.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p exp_outputs
Q=exp_outputs/chip_queue_r5.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (absolute epoch seconds)}

note() { echo "# [$(date -u +%H:%M:%S)] $*" | tee -a "$Q"; }

if [[ -n "${WAIT_PID:-}" ]]; then
  note "r5i queue waiting on pid ${WAIT_PID}"
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

# If the 1B job hit its 16200 s timeout mid-curve, every stage artifact
# (partition, GT, router, curve partials) is cached on this host: a resume
# run jumps straight to the remaining curve ranges. Skipped when the CSV
# already landed.
# Budget right-sized to the post-timeout window (01:58 kill -> 03:10
# deadline): stages are all cached, the resume only runs leftover curve
# ranges (~35 min). A 7200 s budget would be deadline-skipped outright.
if [[ ! -e exp_outputs/scale1b.csv ]]; then
  run_job scale1b_resume 3600 \
    python -m gpann_tpu.cli.scale_bench --n 1000000000 --d 64 --shards 64 \
      --kind hard2 --dtype u8 --method gp --base virtual \
      --layout shard-major --isolate-stages --shard-chunk 8 \
      --max-nprobes 16 --out exp_outputs/scale1b.csv
else
  note "skip scale1b_resume: scale1b.csv already exists"
fi

# Validation first (the round's #1 deliverable). The default cache dir is
# moved aside, not deleted: the seeded-cold path is what's under test, but
# programs the 1B run compiled stay available to later experiments.
# 1800 s: every artifact + compile is cached/seeded by now; measured
# seeded-cold path is ~20-25 min. Tight on purpose - it must still fit
# after a clipped-curve resume.
run_job bench_seeded_cold 1800 bash -c '
  J=~/.cache/gpann_tpu/jax_cache
  mv "$J" "${J}_aside" 2>/dev/null
  python bench.py; rc=$?
  mkdir -p "$J"
  if [ -d "${J}_aside" ]; then cp -n "${J}_aside"/* "$J"/ 2>/dev/null; fi
  rm -rf "${J}_aside"; exit $rc'

# Experiments next (unique results; each fits a late-night slot). The 250M
# store jobs come LAST: the 1B curve already proves the shard-major store
# at larger scale, so they are strictly bonus and are the right jobs for
# the deadline to shave.
run_job gp_fidelity_8m 5400 python exp_scripts/gp_fidelity_8m.py
run_job serve_tail_profile 3600 python exp_scripts/serve_tail_profile.py
run_job mips_overlap_8m 5400 python exp_scripts/mips_overlap_8m.py
run_job qa_ogp_8m 5400 python exp_scripts/qa_ogp_8m.py

run_job scale250m_store 9000 \
  python -m gpann_tpu.cli.scale_bench --n 250000000 --d 96 --shards 96 \
    --kind hard2 --dtype u8 --method gp --base virtual \
    --layout shard-major --isolate-stages --shard-chunk 12 \
    --max-nprobes 16 --out exp_outputs/scale250m_u8_gp_store.csv

run_job scale250m_store_pruned 5400 \
  python -m gpann_tpu.cli.scale_bench --n 250000000 --d 96 --shards 96 \
    --kind hard2 --dtype u8 --method gp --base virtual \
    --layout shard-major --isolate-stages --nq 64 --sub-nprobe 4 \
    --sub-size 65536 --max-nprobes 8 \
    --out exp_outputs/scale250m_u8_gp_store_pruned_t4.csv

note "r5i queue complete"
