#!/bin/bash
# Round-4 endgame: stop the quality run cleanly, then produce every
# remaining round-4 measurement in dependency order on the freed TPU.
#   1. paired-seed PQ gate matrix (tools/scripts/pq_gates_r04.sh)
#   2. postprocess calibration sweep (inside pq_gates_r04.sh)
#   3. bench-matrix subset (micro-lever rows; ROWS env trims for time)
#   4. survivable-weights artifact (tools/protect_weights.py pack)
# Usage: crunch_r04.sh <run_dir> [ckpt=best_model]
set -u
RUN=${1:?usage: crunch_r04.sh <run_dir> [ckpt]}
CKPT=${2-best_model}
cd /root/repo

echo "=== stopping quality run (supervisor tree, by pid parentage) ==="
# /tmp/quality_ldm.pid holds the outer quality_r04.sh supervisor; kill its
# whole descendant tree (inner script, watchdog subshell, python trainer)
# bottom-up by walking -P parent links — never by name pattern.
kill_tree() {
    # parent FIRST so the supervise loop dies before it can relaunch the
    # trainer, then descend into surviving children
    kids=$(pgrep -P "$1" 2>/dev/null)
    kill "$1" 2>/dev/null
    for c in $kids; do kill_tree "$c"; done
}
if [ -f /tmp/quality_ldm.pid ]; then
    kill_tree "$(cat /tmp/quality_ldm.pid)"
    echo "killed supervisor tree rooted at $(cat /tmp/quality_ldm.pid)"
fi
sleep 10

mkdir -p artifacts/bench_r04 artifacts/weights
echo "=== weights artifact pack in background (CPU; TPU stays free) ==="
nice -n 19 python tools/protect_weights.py --cpu pack "$RUN" --ckpt "$CKPT" \
    --out artifacts/weights/run42_${CKPT}.npz \
    > artifacts/bench_r04/protect_weights.log 2>&1 &
PACK_PID=$!

echo "=== 1+2. PQ gates + calibration ($(date -u +%H:%M)) ==="
bash tools/scripts/pq_gates_r04.sh "$RUN" "$CKPT"

echo "=== 3. bench matrix subset ($(date -u +%H:%M)) ==="
ROWS="${BENCH_ROWS-fused512_d128 fused512_carrybf16 fused512_sliced dpmpp25}" \
    bash tools/scripts/bench_matrix_r04.sh

echo "=== 4. weights artifact: waiting for pack ($(date -u +%H:%M)) ==="
wait "$PACK_PID" || true
cat artifacts/bench_r04/protect_weights.log
python tools/protect_weights.py --cpu verify artifacts/weights/run42_${CKPT}.npz

echo "=== crunch complete ($(date -u +%H:%M)) ==="
