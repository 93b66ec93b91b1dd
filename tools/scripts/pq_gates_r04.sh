#!/bin/bash
# Round-4 PQ gate matrix on a trained run — the statistically honest
# version of pq_gates_r03.sh per VERDICT r3 Missing #2: every cell runs
# the SAME >=3 noise seeds (paired design), so each serving-mode delta can
# be judged against the measured seed std instead of riding one draw.
# The val set is the HELD-OUT 4-image split when the run trained with
# datasets.holdout=4 (VERDICT r3 Missing #1).
#
# Cells (all but int8 share one process — see gate_matrix.py):
#   ddim@50 (parity headline)   ddim@25   dpm++@25   dpm++@15
#   ddim@50 on the FULL 16 images (continuity with round-3 train-set PQ)
#   class-aware ddim@50 (synthetic 3-bucket categories; VERDICT r3 weak #6)
#   calibration sweep mask_th 0.5..0.95 paired with overlap_th (Missing #3)
#   GATE_INT8=1 adds the int8-unet ddim@50 cell (own process; default off —
#   round 3 measured int8 as a loss at UNet shapes)
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

# every non-int8 cell shares ONE process/model-load/compile cache —
# sampler cells first, then the dataset-variant cells (full-16 continuity,
# class-aware synthetic categories) via an in-process ds_val swap
echo "=== sampler + variant cells (gate_matrix, one process) ==="
python tools/gate_matrix.py "$RUN" --ckpt "$CKPT" --seeds "$SEEDS" \
    --cells ddim:50,ddim:25,dpm++:25,dpm++:15 \
    --variant-cells full16:ddim:50,classaware3:ddim:50 \
    --out "$OUT/pq_gates.jsonl" \
    2>&1 | tee "$OUT/gate_matrix.log" | grep '^{' || true

# int8 needs its own process (quantization is decided at trace time).
# Off by default: round 3 measured int8 as a serving loss at UNet shapes
# (BENCHMARKS.md) and VERDICT r3 weak #7 says don't spend more time on it.
if [ "${GATE_INT8-0}" = "1" ]; then
    ( export LDMSEG_INT8=unet; run pq_int8_unet_ddim50 --steps 50 )
fi

echo "=== calibration sweep (samples once per seed, sweeps thresholds) ==="
python tools/calibrate_postprocess.py "$RUN" --ckpt "$CKPT" --steps 50 \
    --seeds "$SEEDS" --grid 0.5,0.6,0.7,0.8,0.9,0.95 \
    2>&1 | tee "$OUT/calibration_sweep.log" | grep '^{' || true

echo "=== done; summary ==="
cat "$OUT/pq_gates.jsonl" 2>/dev/null
