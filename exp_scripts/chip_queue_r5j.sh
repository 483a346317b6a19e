#!/bin/bash
# Round-5 tail queue, revision j. Same plan as r5i with one fix: the 1B
# resume is only attempted when it can actually succeed. The GT stage
# (eval/recall.py streaming_topk_neighbors) has no intra-stage checkpoint —
# if the 1B job's 16200 s timeout lands MID-GT, a "resume" redoes the whole
# ~100 min GT scan, which cannot fit the post-timeout window (01:58 ->
# 03:10). r5i would have burned its full 3600 s budget on that doomed redo
# and then deadline-skipped the bench validation AND every experiment.
# r5j checks for the GT npz: present -> kill landed mid-router/curve, the
# resume jumps straight to leftover work (~35 min, worth 3600 s); absent ->
# skip the resume, log why, and give the window to the bench validation +
# experiments, which produce committed results either way.
#
# Usage: DEADLINE_EPOCH=... [WAIT_PID=...] bash exp_scripts/chip_queue_r5j.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p exp_outputs
Q=exp_outputs/chip_queue_r5.log
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (absolute epoch seconds)}

note() { echo "# [$(date -u +%H:%M:%S)] $*" | tee -a "$Q"; }

if [[ -n "${WAIT_PID:-}" ]]; then
  note "r5j queue waiting on pid ${WAIT_PID}"
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

GT_NPZ=~/.cache/gpann_tpu/scale_hard2_555_1000000000_64_64_u8_gt.npz
if [[ -e exp_outputs/scale1b.csv ]]; then
  note "skip scale1b_resume: scale1b.csv already exists"
elif [[ -e "$GT_NPZ" ]]; then
  run_job scale1b_resume 3600 \
    python -m gpann_tpu.cli.scale_bench --n 1000000000 --d 64 --shards 64 \
      --kind hard2 --dtype u8 --method gp --base virtual \
      --layout shard-major --isolate-stages --shard-chunk 8 \
      --max-nprobes 16 --out exp_outputs/scale1b.csv
else
  note "skip scale1b_resume: GT npz absent (timeout landed mid-GT; a full GT redo cannot fit before the deadline)"
fi

# Validation of the driver's exact cold-bench path: compile cache SEEDED
# from the repo tarball, not warm from this boot. Default cache dir moved
# aside, not deleted.
run_job bench_seeded_cold 1800 bash -c '
  J=~/.cache/gpann_tpu/jax_cache
  mv "$J" "${J}_aside" 2>/dev/null
  python bench.py; rc=$?
  mkdir -p "$J"
  if [ -d "${J}_aside" ]; then cp -n "${J}_aside"/* "$J"/ 2>/dev/null; fi
  rm -rf "${J}_aside"; exit $rc'

# Experiments next (unique results; each fits a late-night slot). The 250M
# store jobs come LAST: strictly bonus, the right jobs for the deadline to
# shave.
run_job serve_tail_profile 3600 python exp_scripts/serve_tail_profile.py
run_job gp_fidelity_8m 5400 python exp_scripts/gp_fidelity_8m.py
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

note "r5j queue complete"
