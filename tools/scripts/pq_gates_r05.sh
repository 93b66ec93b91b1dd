#!/bin/bash
# Round-5 PQ gate matrix — pq_gates_r04.sh plus the VERDICT r4 items:
#   * every gate row now carries per-seed observability columns
#     (pred_segments / conf_mass / seg_mean_area — next #7), so 0.00-PQ
#     cells self-explain;
#   * the calibration sweep FITS a postprocess temperature on the train
#     split (next #4) and re-runs the val sweep calibrated;
#   * a release-config cell (mask_th=overlap_th=0.9) runs at the fitted
#     T* — the measured answer to "do the reference's release thresholds
#     become usable on a scratch model with temperature calibration?"
#
# Cells (all but int8/release share one process — see gate_matrix.py):
#   ddim@50 (parity headline)   ddim@25   dpm++@25   dpm++@15
#   ddim@50 on the FULL 16 images (continuity with round-3 train-set PQ)
#   class-aware ddim@50 (synthetic 3-bucket categories)
#   calibration sweep + temperature fit + calibrated val sweep
#   release-config cell at fitted T* (own process: mask_th/temperature
#   live in eval_kwargs read at trainer build)
#   GATE_INT8=1 adds the int8-unet ddim@50 cell (own process; default off)
#
# Usage: pq_gates_r05.sh <run_dir> [ckpt=best_model] [out=artifacts/bench_r05]
set -u
RUN=${1:?usage: pq_gates_r05.sh <run_dir> [ckpt] [out_dir]}
CKPT=${2-best_model}
OUT=${3-/root/repo/artifacts/bench_r05}
# 5 paired seeds by default (r4 used {0,42,123}; kept as a subset for
# continuity — VERDICT r4 weak #4 wants error bars re-measured at the
# checkpoint they describe, and 2 more seeds tighten the std ~25%)
SEEDS=${SEEDS-0,42,123,7,9}
mkdir -p "$OUT"
cd /root/repo

run() { # run <logname> <extra args...>
    log="$OUT/$1.log"; shift
    echo "=== $log: eval_run $* ==="
    python tools/eval_run.py "$RUN" --ckpt "$CKPT" --seeds "$SEEDS" "$@" \
        2>&1 | tee "$log" | grep -E '^\{"(results|pq_mean)' || true
    grep -h '^{"pq_mean' "$log" >> "$OUT/pq_gates.jsonl" 2>/dev/null || true
}

echo "=== sampler + variant cells (gate_matrix, one process) ==="
python tools/gate_matrix.py "$RUN" --ckpt "$CKPT" --seeds "$SEEDS" \
    --cells ddim:50,ddim:25,dpm++:25,dpm++:15 \
    --variant-cells full16:ddim:50,classaware3:ddim:50 \
    --out "$OUT/pq_gates.jsonl" \
    2>&1 | tee "$OUT/gate_matrix.log" | grep '^{' || true

if [ "${GATE_INT8-0}" = "1" ]; then
    ( export LDMSEG_INT8=unet; run pq_int8_unet_ddim50 --steps 50 )
fi

echo "=== calibration sweep + train-split temperature fit ==="
python tools/calibrate_postprocess.py "$RUN" --ckpt "$CKPT" --steps 50 \
    --seeds "$SEEDS" --grid 0.5,0.6,0.7,0.8,0.9,0.95 \
    --fit-temperature 0.1,0.15,0.2,0.3,0.5,0.7,1.0 --release-th 0.9 \
    2>&1 | tee "$OUT/calibration_sweep.log" | grep '^{' || true

TSTAR=$(python - "$OUT/calibration_sweep.log" <<'EOF'
import json, sys
t = None
for line in open(sys.argv[1]):
    line = line.strip()
    if line.startswith('{"fit"'):
        t = json.loads(line)["t_star"]
print(t if t is not None else "")
EOF
)
if [ -n "$TSTAR" ]; then
    echo "=== release-config cell at fitted temperature T*=$TSTAR ==="
    python tools/gate_matrix.py "$RUN" --ckpt "$CKPT" --seeds "$SEEDS" \
        --cells ddim:50 --temperature "$TSTAR" \
        --mask-th 0.9 --overlap-th 0.9 \
        --out "$OUT/pq_gates.jsonl" \
        2>&1 | tee "$OUT/gate_release_calibrated.log" | grep '^{' || true
else
    echo "=== no T* parsed from calibration log; skipping release cell ==="
fi

echo "=== done; summary ==="
cat "$OUT/pq_gates.jsonl" 2>/dev/null
