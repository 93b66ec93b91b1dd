#!/bin/bash
# Round-3 end-of-round measurements (runs after followup_r03.sh — which
# ends with the capped 24k-step quality extension — frees the TPU; pass
# its pid as $1):
#   1. PQ gates on the extended best_model: multi-seed ddim@50 (noise
#      error bar + the headline quality number) and dpm++@25 (the
#      matched-quality serving mode), appended to pq_gates.jsonl with
#      cell names suffixed _24k
#   2. batch-size sweep of the headline bench (8 is the historical
#      default; 16 may amortize dispatch + fill the MXU better)
#   3. a final default bench.py run to leave the compile cache warm for
#      the driver's BENCH_r03 measurement
set -u
WAIT_PID=${1-}
RUN=/root/repo/artifacts/runs/simple_diffusion/examples/run_32
ART=/root/repo/artifacts/bench_r03
cd /root/repo

if [ -n "$WAIT_PID" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 120; done
    sleep 15
fi

gate() {
    name=$1; shift
    echo "=== gate: $name ==="
    log="$ART/pq_${name}.log"
    if timeout 9000 "$@" > "$log" 2>&1; then
        grep -E '^\{"' "$log" | while read -r line; do
            echo "{\"cell\": \"$name\", ${line#\{}" >> "$ART/pq_gates.jsonl"
        done
        grep -E '^\{"' "$log" | tail -2
    else
        echo "{\"cell\": \"$name\", \"error\": \"rc=$?\"}" >> "$ART/pq_gates.jsonl"
        tail -3 "$log"
    fi
}

gate ddim50_24k_seeds python tools/eval_run.py "$RUN" --ckpt best_model \
    --sampler ddim --steps 50 --seeds 0,42,123
gate dpmpp25_24k python tools/eval_run.py "$RUN" --ckpt best_model \
    --sampler dpm++ --steps 25 --seed 42

echo "=== batch sweep ==="
for B in 16 4; do
    log="$ART/bench_fused512_b${B}.log"
    if timeout 3600 env BENCH_BATCH=$B python bench.py > "$log" 2>&1; then
        line=$(grep -E '^\{"metric"' "$log" | tail -1)
        echo "{\"row\": \"fused512_b${B}\", ${line#\{}" >> "$ART/bench_matrix.jsonl"
        echo "$line"
    else
        echo "{\"row\": \"fused512_b${B}\", \"error\": \"rc=$?\"}" >> "$ART/bench_matrix.jsonl"
        tail -3 "$log"
    fi
done

echo "=== final default bench (cache warm for the driver) ==="
timeout 3600 python bench.py > "$ART/bench_final_default.log" 2>&1
grep -E '^\{"metric"' "$ART/bench_final_default.log" | tail -1

echo "=== final_r03 complete ==="
