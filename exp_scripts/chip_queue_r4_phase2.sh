#!/bin/bash
# Round-4 chip queue, phase 2: the VERDICT-task experiment drivers, run
# strictly serially after phase 1 (bench A/B) finishes. Each job checks a
# wall-clock cutoff before starting so the chip is guaranteed free when the
# round driver runs bench.py at end-of-round (chip jobs must never overlap;
# docs/PERF.md).
set -u
cd "$(dirname "$0")/.."

CUTOFF_H=${CUTOFF_H:-0930}   # HHMM UTC: no new heavy job after this

if [ -n "${WAIT_PID:-}" ]; then
    echo "# phase2 waiting for pid $WAIT_PID..." >&2
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "# phase2 starts $(date -u +%H:%M:%S)" >&2
fi

run_job () {  # $1 tag, $2 timeout_s, rest = command
    local tag=$1 tmo=$2; shift 2
    if [ "$(date -u +%H%M)" -ge "$CUTOFF_H" ]; then
        echo "# skip $tag: past cutoff $CUTOFF_H" >&2
        return 0
    fi
    echo "# job[$tag] start $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" 2> "exp_outputs/${tag}.log"
    echo "# job[$tag] rc=$? $(date -u +%H:%M:%S)" >&2
}

run_job hard_serve   5400 python exp_scripts/hard_serve_bench.py
run_job gp_fidelity  6000 python exp_scripts/gp_fidelity_8m.py
run_job mips_overlap 6000 python exp_scripts/mips_overlap_8m.py
run_job serve_tail   3000 python exp_scripts/serve_tail_profile.py
run_job qa_ogp       5400 python exp_scripts/qa_ogp_8m.py
echo "# phase2 complete $(date -u +%H:%M:%S)" >&2
