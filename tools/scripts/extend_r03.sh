#!/bin/bash
# Round-3 quality-run extension: resume run_32 past its 12k-step cosine
# horizon with a fresh 24k-step cosine (warm restart: the restored
# state_step=12000 lands mid-schedule at lr~5e-5, decaying to 0 at 24k).
# best_pq (34.08) is restored from the checkpoint, so best_model is only
# ever overwritten by a strictly better eval.
#
# A hard wall-clock cap (MAX_S, default 3.5h) guarantees the TPU is free
# for end-of-round measurements regardless of training progress; the
# supervised trainer checkpoints every 250 steps so a timeout loses <=250
# steps and leaves an exactly-resumable run.
#
# Usage: extend_r03.sh [total_steps] [max_seconds]
set -u
STEPS=${1-24000}
MAX_S=${2-12600}
cd /root/repo
timeout "$MAX_S" bash tools/scripts/quality_r03.sh ldm "$STEPS"
rc=$?
echo "=== extend_r03: quality_r03.sh exited rc=$rc (124 = deadline cap) ==="
exit 0
