#!/bin/bash
# Round-3 follow-up TPU queue (runs after bench_matrix_r03.sh frees the
# chip; pass its pid as $1 to wait for it first):
#   1. re-measure the inpainting bench row with the hardened timing loop
#      (the first reading was a physically impossible 3806 img/s — the
#      tunnel resolved the final handle before earlier executions ran)
#   2. multi-seed ddim@50 replay of best_model (seeds 0,42,123): closes
#      the 34.08-vs-24.93 question — trainer eval seeds noise with 0,
#      eval_run defaulted to 42; quantifies noise-seed PQ variance on the
#      16-image val set
#   3. retry the int8_unet_ddim50 gate cell (transient backend rc=1)
#   4. reference "release eval config" cell: mask_th 0.9 / overlap_th 0.9
#      (/root/reference/tools/scripts/eval.sh:8-19) on ddim@50
#   5. launch the capped 24k-step quality extension (extend_r03.sh)
set -u
WAIT_PID=${1-}
RUN=/root/repo/artifacts/runs/simple_diffusion/examples/run_32
ART=/root/repo/artifacts/bench_r03
cd /root/repo

if [ -n "$WAIT_PID" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    sleep 15
fi

echo "=== 1. inpaint bench re-measure (hardened loop) ==="
timeout 3600 env BENCH_INPAINT=0.5 python bench.py \
    > "$ART/bench_fused512_inpaint_v2.log" 2>&1
grep -E '^\{"metric"' "$ART/bench_fused512_inpaint_v2.log" | tail -1

echo "=== 2. multi-seed ddim50 replay ==="
timeout 7200 python tools/eval_run.py "$RUN" --ckpt best_model \
    --sampler ddim --steps 50 --seeds 0,42,123 \
    > "$ART/pq_ddim50_seeds.log" 2>&1
grep -E '^\{"' "$ART/pq_ddim50_seeds.log" | tail -4

echo "=== 3. int8_unet_ddim50 retry ==="
if timeout 5400 env LDMSEG_INT8=unet python tools/eval_run.py "$RUN" \
        --ckpt best_model --sampler ddim --steps 50 \
        > "$ART/pq_int8_unet_ddim50_v2.log" 2>&1; then
    line=$(grep -E '^\{"results"' "$ART/pq_int8_unet_ddim50_v2.log" | tail -1)
    echo "{\"cell\": \"int8_unet_ddim50_retry\", ${line#\{}" >> "$ART/pq_gates.jsonl"
    echo "$line"
else
    echo "{\"cell\": \"int8_unet_ddim50_retry\", \"error\": \"rc=$?\"}" >> "$ART/pq_gates.jsonl"
    tail -3 "$ART/pq_int8_unet_ddim50_v2.log"
fi

echo "=== 4. release-eval-config cell (mask_th .9, overlap_th .9) ==="
if timeout 5400 python tools/eval_run.py "$RUN" --ckpt best_model \
        --sampler ddim --steps 50 --mask-th 0.9 --overlap-th 0.9 \
        > "$ART/pq_ddim50_release_cfg.log" 2>&1; then
    line=$(grep -E '^\{"results"' "$ART/pq_ddim50_release_cfg.log" | tail -1)
    echo "{\"cell\": \"ddim50_release_cfg\", ${line#\{}" >> "$ART/pq_gates.jsonl"
    echo "$line"
else
    echo "{\"cell\": \"ddim50_release_cfg\", \"error\": \"rc=$?\"}" >> "$ART/pq_gates.jsonl"
    tail -3 "$ART/pq_ddim50_release_cfg.log"
fi

echo "=== 5. quality extension to 24k (capped) ==="
bash tools/scripts/extend_r03.sh 24000 "${EXTEND_MAX_S-15000}"
echo "=== followup_r03 complete ==="
