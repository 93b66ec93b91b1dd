#!/bin/bash
# Round-5 per-round bench matrix. Regenerates every tracked configuration
# (regression guard vs the round-4 numbers in BENCHMARKS.md) and adds the
# round-5 re-measurement at the converged checkpoint (VERDICT r4 next #3):
#   - dpm++@25: the effective-serving mode (PQ-gated against ddim@50 by the
#     paired-seed matrix, tools/scripts/pq_gates_r05.sh)
#   - LDMSEG_SAMPLE_CARRY=bf16: latents/self-cond carried in bf16 across
#     the sampling scan (micro-lever A/B; update itself stays fp32)
# One JSON line per row -> artifacts/bench_r05/bench_matrix.jsonl.
# Run on the real TPU when it is otherwise idle (compiles ~minutes through
# the tunnel; rows share the on-disk compile cache).
set -u
OUT=/root/repo/artifacts/bench_r05/bench_matrix.jsonl
mkdir -p "$(dirname "$OUT")"

# ROWS="a b c" runs only the named rows (time-boxed sessions) and APPENDS;
# a full run (no ROWS) regenerates the matrix from scratch
ROWS=${ROWS-}
[ -z "$ROWS" ] && : > "$OUT"

row() {
    name=$1; shift
    if [ -n "$ROWS" ] && ! grep -qw "$name" <<< "$ROWS"; then return; fi
    echo "=== $name ==="
    log=/root/repo/artifacts/bench_r05/bench_${name}.log
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
row fused512_carrybf16 LDMSEG_SAMPLE_CARRY=bf16 python bench.py
# sliced flash layout: BlockSpec picks each head's 128-lane window out of
# [B,S,H*D] — no [B,S,H,D]->[BH,S,D] fold transposes (the ~5% copy cost
# seen in the round-3 profile; only lowerable at d%128==0)
row fused512_sliced    LDMSEG_FLASH_LAYOUT=sliced python bench.py
row fused512_sliced_carrybf16 LDMSEG_FLASH_LAYOUT=sliced LDMSEG_SAMPLE_CARRY=bf16 python bench.py
row ddim25             BENCH_STEPS=25 python bench.py
row dpmpp25            BENCH_SAMPLER=dpm++ BENCH_STEPS=25 python bench.py
row dpmpp25_carrybf16  BENCH_SAMPLER=dpm++ BENCH_STEPS=25 LDMSEG_SAMPLE_CARRY=bf16 python bench.py
row fused512_sd8head   BENCH_HEAD_DIM=0 python bench.py
row fused512_inpaint   BENCH_INPAINT=0.5 python bench.py
row sample256          BENCH_IMAGE_SIZE=256 python bench.py
row train256           BENCH_IMAGE_SIZE=256 python tools/bench_train.py
row train512           BENCH_IMAGE_SIZE=512 python tools/bench_train.py

echo "=== matrix complete ==="
cat "$OUT"
