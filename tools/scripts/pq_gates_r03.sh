#!/bin/bash
# Round-3 PQ gate matrix (VERDICT r2 "Next round" #1): replay the quality
# checkpoint through every serving configuration that shipped ungated and
# record PQ for each. One row per cell -> artifacts/bench_r03/pq_gates.jsonl.
#
# Cells: ddim@50 (training default), ddim@25, dpm++@25, dpm++@15
#        (the DPM-Solver++ matched-quality-at-fewer-steps claim),
#        int8 weights (LDMSEG_INT8=unet, ddim@50),
#        int8 weights+row activations (LDMSEG_INT8_ACT=row, ddim@50).
# Reference anchor for the eval loop: trainers_ldm_cond.py:1045-1170 and
# the published eval workflow tools/scripts/eval.sh:8-19.
#
# Usage: pq_gates_r03.sh <run_dir> [ckpt]
set -u
RUN=${1:?usage: pq_gates_r03.sh <run_dir> [ckpt]}
CKPT=${2-best_model}
OUT=/root/repo/artifacts/bench_r03/pq_gates.jsonl
mkdir -p "$(dirname "$OUT")"

cell() {
    name=$1; shift
    echo "=== cell: $name ==="
    log=/root/repo/artifacts/bench_r03/pq_${name}.log
    if timeout 5400 "$@" "$RUN" --ckpt "$CKPT" > "$log" 2>&1; then
        # eval_run's final line is the JSON summary
        line=$(grep -E '^\{"results"' "$log" | tail -1)
        echo "{\"cell\": \"$name\", ${line#\{}" >> "$OUT"
        echo "$line"
    else
        echo "{\"cell\": \"$name\", \"error\": \"rc=$? (see $log)\"}" >> "$OUT"
        tail -3 "$log"
    fi
}

cell ddim50            python tools/eval_run.py --sampler ddim --steps 50
cell ddim25            python tools/eval_run.py --sampler ddim --steps 25
cell dpmpp25           python tools/eval_run.py --sampler dpm++ --steps 25
cell dpmpp15           python tools/eval_run.py --sampler dpm++ --steps 15
cell int8_unet_ddim50  env LDMSEG_INT8=unet python tools/eval_run.py --sampler ddim --steps 50
cell int8_act_ddim50   env LDMSEG_INT8=unet LDMSEG_INT8_ACT=row python tools/eval_run.py --sampler ddim --steps 50

echo "=== gate matrix complete ==="
cat "$OUT"
