#!/bin/bash
# Sync exp_outputs/<job>.done markers from the chip-queue log.
#
# The round-5 main queue (chip_queue_r5.sh) logs "done <name> rc=<rc>" but
# writes no marker files; the phase-2 queue (chip_queue_r5_phase2.sh) skips
# a job only if exp_outputs/<name>.done exists. Run this between the two so
# phase-2 does not re-run jobs the main queue already completed (chip time
# is the scarcest resource in the round; CLAUDE.md serialization rules).
#
# Usage: bash exp_scripts/queue_done_sync.sh
set -u
cd "$(dirname "$0")/.."
Q=exp_outputs/chip_queue_r5.log
[[ -r "$Q" ]] || { echo "no $Q"; exit 0; }
while read -r name; do
  if [[ ! -e "exp_outputs/${name}.done" ]]; then
    touch "exp_outputs/${name}.done"
    echo "marked done: $name"
  fi
done < <(sed -n 's/^# \[[0-9:]*\] done \([a-z0-9_]*\) rc=0$/\1/p' "$Q" | sort -u)
