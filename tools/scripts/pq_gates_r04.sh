#!/bin/bash
# Round-4 PQ gate matrix on a trained run — the statistically honest
# version of pq_gates_r03.sh per VERDICT r3 Missing #2: every cell runs
# the SAME >=3 noise seeds (paired design), so each serving-mode delta can
# be judged against the measured seed std instead of riding one draw.
# The val set is the HELD-OUT 4-image split when the run trained with
# datasets.holdout=4 (VERDICT r3 Missing #1).
#
# Cells:
#   ddim@50 (parity headline)   ddim@25   dpm++@25   dpm++@15
#   int8-unet ddim@50 (serving quantization gate)
#   ddim@50 on the FULL 16 images (continuity with round-3 train-set PQ)
#   class-aware ddim@50 (synthetic 3-bucket categories; VERDICT r3 weak #6)
#   calibration sweep mask_th 0.5..0.95 paired with overlap_th (Missing #3)
#
# Usage: pq_gates_r04.sh <run_dir> [ckpt=best_model] [out=artifacts/bench_r04]
set -u
RUN=${1:?usage: pq_gates_r04.sh <run_dir> [ckpt] [out_dir]}
CKPT=${2-best_model}
OUT=${3-/root/repo/artifacts/bench_r04}
SEEDS=0,42,123
mkdir -p "$OUT"
cd /root/repo

run() { # run <logname> <extra args...>
    log="$OUT/$1.log"; shift
    echo "=== $log: eval_run $* ==="
    python tools/eval_run.py "$RUN" --ckpt "$CKPT" --seeds "$SEEDS" "$@" \
        2>&1 | tee "$log" | grep -E '^\{"(results|pq_mean)' || true
    grep -h '^{"pq_mean' "$log" >> "$OUT/pq_gates.jsonl" 2>/dev/null || true
}

# the four sampler/steps cells share ONE process/model-load/compile cache
echo "=== sampler cells (gate_matrix, one process) ==="
python tools/gate_matrix.py "$RUN" --ckpt "$CKPT" --seeds "$SEEDS" \
    --cells ddim:50,ddim:25,dpm++:25,dpm++:15 --out "$OUT/pq_gates.jsonl" \
    2>&1 | tee "$OUT/gate_matrix.log" | grep '^{' || true

# subshell: `VAR=x fn` would leak the var past the function call in bash
( export LDMSEG_INT8=unet; run pq_int8_unet_ddim50 --steps 50 )
run pq_ddim50_full16     --steps 50 --holdout 0
run pq_ddim50_classaware --steps 50 --synthetic-categories 3 --class-aware

echo "=== calibration sweep (samples once per seed, sweeps thresholds) ==="
python tools/calibrate_postprocess.py "$RUN" --ckpt "$CKPT" --steps 50 \
    --seeds "$SEEDS" --grid 0.5,0.6,0.7,0.8,0.9,0.95 \
    2>&1 | tee "$OUT/calibration_sweep.log" | grep '^{' || true

echo "=== done; summary ==="
cat "$OUT/pq_gates.jsonl" 2>/dev/null
