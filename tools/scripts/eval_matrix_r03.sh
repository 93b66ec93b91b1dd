#!/bin/bash
# Round-3 PQ quality-gate matrix (VERDICT.md next-round item #1): replay the
# generative PQ eval on the quality-run best_model across every deferred
# serving configuration, in one session. Reference anchor: the published
# eval workflow /root/reference/tools/scripts/eval.sh:8-19.
#
#   samplers:  ddim@50 (parity default), ddim@25, dpm++@25, dpm++@15
#   numerics:  bf16 (default), LDMSEG_INT8=unet, LDMSEG_INT8_ACT=row
#
# Raw eval outputs land in artifacts/eval_r03/ so every PQ cell in
# BENCHMARKS.md has an artifact.
set -u
RUN=${1-/root/repo/artifacts/runs/simple_diffusion/examples/run_32}
CKPT=${2-best_model}
OUT=/root/repo/artifacts/eval_r03
mkdir -p "$OUT"
cd /root/repo
export MALLOC_ARENA_MAX=2

run() {
    name=$1; shift
    echo "=== $name ==="
    ( "$@" "$RUN" --ckpt "$CKPT" ) > "$OUT/$name.txt" 2>&1
    echo "rc=$? -> $OUT/$name.txt"
    grep -E "PQ|SQ|RQ" "$OUT/$name.txt" | tail -3
}

run ddim50            python tools/eval_run.py --steps 50
run ddim25            python tools/eval_run.py --steps 25
run dpm25             python tools/eval_run.py --steps 25 --sampler dpm++
run dpm15             python tools/eval_run.py --steps 15 --sampler dpm++
run int8_ddim50       env LDMSEG_INT8=unet python tools/eval_run.py --steps 50
run int8row_ddim50    env LDMSEG_INT8=unet LDMSEG_INT8_ACT=row \
                      python tools/eval_run.py --steps 50
echo "=== matrix done ==="
