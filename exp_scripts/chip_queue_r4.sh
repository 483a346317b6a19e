#!/bin/bash
# Round-4 serial chip queue. ONE chip job at a time (docs/PERF.md: two
# processes touching the TPU at once correlates with hour-long tunnel
# wedges). Waits for any PID in $WAIT_PID to exit first, then runs the
# bench A/B grid (voting_impl x scan_phase2) so BENCH_r04's default can be
# the measured-best config. Each run's stderr goes to exp_outputs/.
set -u
cd "$(dirname "$0")/.."

if [ -n "${WAIT_PID:-}" ]; then
    echo "# waiting for pid $WAIT_PID to exit..." >&2
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    echo "# pid $WAIT_PID gone; queue starts" >&2
fi

run_bench () {  # $1 = tag, rest = env pairs
    local tag=$1; shift
    echo "# bench[$tag] start $(date -u +%H:%M:%S)" >&2
    env "$@" timeout 5400 python bench.py \
        > "exp_outputs/bench_ab_${tag}.json" \
        2> "exp_outputs/bench_ab_${tag}.log"
    echo "# bench[$tag] rc=$? $(date -u +%H:%M:%S)" >&2
    cat "exp_outputs/bench_ab_${tag}.json" >&2
}

# default first: warms/recompiles the pallas cache after this round's
# pallas_scan.py edit and re-establishes the r03 baseline config number
run_bench approx_exact
run_bench approx_approx GPANN_BENCH_PHASE2=approx
run_bench binned_approx GPANN_BENCH_VOTING=binned GPANN_BENCH_PHASE2=approx
echo "# bench A/B complete $(date -u +%H:%M:%S)" >&2
