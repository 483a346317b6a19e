#!/bin/bash
# HISTORICAL (round 4). Superseded by chip_queue_r5.sh, which fixes the
# advisor findings against this script: epoch-deadline admission (the HHMM
# comparison below breaks across midnight) and >=3600 s chip-job budgets
# (2400 s timeouts here can kill a blocked-but-healthy chip job mid-transfer).
# Round-4 (session b) serial chip queue. ONE chip job at a time
# (docs/PERF.md: two processes touching the TPU at once correlates with
# hour-long tunnel wedges). The machine restarted mid-round, so every
# cache is cold: job 1 (bench.py, launched separately) re-warms the data/
# artifact/compile caches that the driver's end-of-round bench.py needs.
#
# This queue runs AFTER that warm run exits:
#   1. bench A/B: scan_phase2=approx, voting=binned (warm caches -> each is
#      a few minutes + 1-2 compiles); picks the measured-best default.
#   2. hard_serve_bench: the real 8M/32 hard-mixture QPS@0.95 (VERDICT r3
#      missing #4) — the committed artifact so far is a smoke run.
#   3. serve_tail_profile, gp_fidelity, mips_overlap: real 8M runs.
# Heavy jobs check a cutoff so the chip is free when the round driver runs
# bench.py at end-of-round.
set -u
cd "$(dirname "$0")/.."

CUTOFF_H=${CUTOFF_H:-1010}   # HHMM UTC: no new heavy job after this

if [ -n "${WAIT_PID:-}" ]; then
    echo "# waiting for pid $WAIT_PID to exit..." >&2
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
    echo "# pid $WAIT_PID gone; queue starts $(date -u +%H:%M:%S)" >&2
fi

run_job () {  # $1 tag, $2 timeout_s, $3 cutoff_hhmm, rest = command
    local tag=$1 tmo=$2 cut=$3; shift 3
    if [ "$(date -u +%H%M)" -ge "$cut" ]; then
        echo "# skip $tag: past cutoff $cut" >&2
        return 0
    fi
    echo "# job[$tag] start $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" > "exp_outputs/${tag}.out" \
        2> "exp_outputs/${tag}.log"
    echo "# job[$tag] rc=$? $(date -u +%H:%M:%S)" >&2
}

run_job bench_ab_approx_approx 2400 "$CUTOFF_H" \
    env GPANN_BENCH_PHASE2=approx python bench.py
run_job bench_ab_binned_approx 2400 "$CUTOFF_H" \
    env GPANN_BENCH_VOTING=binned GPANN_BENCH_PHASE2=approx python bench.py
run_job hard_serve   5400 "$CUTOFF_H" python exp_scripts/hard_serve_bench.py
run_job serve_tail   3000 "$CUTOFF_H" python exp_scripts/serve_tail_profile.py
run_job gp_fidelity  6000 "$CUTOFF_H" python exp_scripts/gp_fidelity_8m.py
run_job mips_overlap 6000 "$CUTOFF_H" python exp_scripts/mips_overlap_8m.py
echo "# queue complete $(date -u +%H:%M:%S)" >&2
