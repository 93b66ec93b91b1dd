#!/bin/bash
# Round-5 endgame: stop the quality run cleanly, then produce every
# remaining round-5 measurement in dependency order on the freed TPU.
#   1. paired-seed PQ gate matrix + temperature-calibrated release cell
#      (tools/scripts/pq_gates_r05.sh)
#   2. postprocess calibration sweep + train-split temperature fit
#      (inside pq_gates_r05.sh)
#   3. bench-matrix subset (ROWS env trims for time)
#   4. survivable-weights artifact (tools/protect_weights.py pack)
# Usage: crunch_r05.sh <run_dir> [ckpt=best_model]
set -u
RUN=${1:?usage: crunch_r05.sh <run_dir> [ckpt]}
CKPT=${2-best_model}
cd /root/repo

echo "=== stopping quality run (supervisor tree, by pid parentage) ==="
# /tmp/quality_ldm.pid holds the outer quality script supervisor; collect
# the whole descendant tree FIRST, kill parent-first (so the supervise
# loop can't relaunch), then wait for every pid to actually exit before
# touching checkpoints (ADVICE r4 #3 — a 10s sleep could race an async
# orbax save still flushing through the dying trainer).
collect_tree() {
    echo "$1"
    for c in $(pgrep -P "$1" 2>/dev/null); do collect_tree "$c"; done
}
if [ -f /tmp/quality_ldm.pid ] && kill -0 "$(cat /tmp/quality_ldm.pid)" 2>/dev/null; then
    PIDS=$(collect_tree "$(cat /tmp/quality_ldm.pid)")
    for p in $PIDS; do kill "$p" 2>/dev/null; done
    echo "killed tree: $PIDS"
    for i in $(seq 1 60); do   # up to 10 min for orbax finalize/atexit
        alive=""
        for p in $PIDS; do kill -0 "$p" 2>/dev/null && alive="$alive $p"; done
        [ -z "$alive" ] && break
        [ "$i" = 30 ] && { echo "escalating to -9:$alive"; for p in $alive; do kill -9 "$p" 2>/dev/null; done; }
        sleep 10
    done
    [ -z "$alive" ] && echo "all pids exited" || echo "WARNING: still alive:$alive"
else
    echo "no live quality run"
fi

mkdir -p artifacts/bench_r05 artifacts/weights
echo "=== weights artifact pack in background (CPU; TPU stays free) ==="
# protect_weights itself refuses to pack over a fresh in-flight tmp dir
nice -n 19 python tools/protect_weights.py --cpu pack "$RUN" --ckpt "$CKPT" \
    --out artifacts/weights/run42_${CKPT}.npz \
    > artifacts/bench_r05/protect_weights.log 2>&1 &
PACK_PID=$!

echo "=== 1+2. PQ gates + temperature calibration ($(date -u +%H:%M)) ==="
bash tools/scripts/pq_gates_r05.sh "$RUN" "$CKPT"

echo "=== 3. bench matrix subset ($(date -u +%H:%M)) ==="
ROWS="${BENCH_ROWS-fused512_d128 dpmpp25}" \
    bash tools/scripts/bench_matrix_r05.sh

echo "=== 4. weights artifact: waiting for pack ($(date -u +%H:%M)) ==="
wait "$PACK_PID" || true
cat artifacts/bench_r05/protect_weights.log
python tools/protect_weights.py --cpu verify artifacts/weights/run42_${CKPT}.npz

echo "=== crunch complete ($(date -u +%H:%M)) ==="
