#!/bin/bash
# Round-3 perf measurement session (VERDICT.md next-round items #2 and #4):
#   1. baseline fused 512^2 bench (sanity after the sharding-constraint work)
#   2. BENCH_HEAD_DIM=128 / 160 — the TPU-native head-repartition A/B
#      (2x160 / 5x128 / 10x128 heads vs SD's 8x d=40/80/160 split)
#   3. tools/bench_int8_micro.py — int8-vs-bf16 attribution at hot shapes
# One at a time (single chip + single host core). Raw outputs land in
# artifacts/bench_r03/ so every BENCHMARKS.md number has an artifact.
set -u
OUT=/root/repo/artifacts/bench_r03
mkdir -p "$OUT"
cd /root/repo

run() {
    name=$1; shift
    echo "=== $name: $* ==="
    ( "$@" ) > "$OUT/$name.txt" 2>&1
    echo "rc=$? -> $OUT/$name.txt"
    tail -2 "$OUT/$name.txt"
}

run bench_bf16_base     env BENCH_ITERS=3 python bench.py
run bench_head128       env BENCH_HEAD_DIM=128 BENCH_ITERS=3 python bench.py
run bench_head160       env BENCH_HEAD_DIM=160 BENCH_ITERS=3 python bench.py
run int8_micro          python tools/bench_int8_micro.py
echo "=== session done ==="
