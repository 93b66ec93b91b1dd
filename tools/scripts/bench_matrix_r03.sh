#!/bin/bash
# Round-3 per-round bench matrix (VERDICT r2 "Next round" #9): regenerate
# every tracked configuration so regressions stay visible. One JSON line per
# row -> artifacts/bench_r03/bench_matrix.jsonl. Run on the real TPU when it
# is otherwise idle (each row compiles ~minutes through the tunnel).
#
# Rows: fused 512^2 sampling (the headline, d=128 default), the same with
# the SD-v1 8-head split (regression guard for converted checkpoints),
# inpainting variant, 256^2 sampling, train-step at 256^2 and 512^2.
set -u
OUT=/root/repo/artifacts/bench_r03/bench_matrix.jsonl
mkdir -p "$(dirname "$OUT")"
: > "$OUT"

row() {
    name=$1; shift
    echo "=== $name ==="
    log=/root/repo/artifacts/bench_r03/bench_${name}.log
    if timeout 3600 env "$@" > "$log" 2>&1; then
        line=$(grep -E '^\{"metric"' "$log" | tail -1)
        echo "{\"row\": \"$name\", ${line#\{}" >> "$OUT"
        echo "$line"
    else
        echo "{\"row\": \"$name\", \"error\": \"rc=$?\"}" >> "$OUT"
        tail -3 "$log"
    fi
}

row fused512_d128      python bench.py
row fused512_sd8head   BENCH_HEAD_DIM=0 python bench.py
row fused512_inpaint   BENCH_INPAINT=0.5 python bench.py
row sample256          BENCH_IMAGE_SIZE=256 python bench.py
row train256           BENCH_IMAGE_SIZE=256 python tools/bench_train.py
row train512           BENCH_IMAGE_SIZE=512 python tools/bench_train.py

echo "=== matrix complete ==="
cat "$OUT"
