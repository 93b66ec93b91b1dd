#!/bin/bash
# Round-5 quality run: same honest recipe as quality_r04.sh (12-train /
# 4-held-out split, 3-seed-mean best-model selection) but with the
# measured round-4 wall-clock thieves fixed (VERDICT r4 weak #1 / next #2:
# pure train step 0.64s vs 8.3s effective — 80-90% of the round went to
# 3-seed 50-step evals every 300 steps and ~300s tunnel checkpoint
# device_gets every 250 steps):
#   - eval_kwargs.full_eval_every=1500 -> the full protocol eval (3 seeds
#     x 50 steps, drives best-model selection) runs every 1500 steps
#   - the intermediate eval_every=300 evals become cheap trend evals
#     (1 seed x 25 steps, logged under val_quick/, never select best)
#   - save_every=1000 (the blocking part of a save is the ~10GB
#     device_get over the tunnel, not the disk write)
#   - train_num_steps default 12000 -> train into the round-3 plateau
#     region (VERDICT r4 next #1). NOTE on resume: the cosine LR schedule
#     is rebuilt for the new horizon, so resuming a 9000-step run at step
#     ~5800 bumps LR from 2.7e-5 back to 5.6e-5 and re-anneals to 0 at
#     12000 — intended (more mid-LR training before the final anneal).
#
# Usage: quality_r05.sh ae | ldm [LDM_STEPS]
set -u
export MALLOC_ARENA_MAX=2

DATA=/tmp/ldmseg_data/examples
RUNS=/root/repo/artifacts/runs
STALL_S=${STALL_S-3600}
mkdir -p "$(dirname "$DATA")" "$RUNS"
[ -d "$DATA" ] || cp -r /root/reference/data/examples/coco "$DATA"

STAGE=${1:?usage: quality_r05.sh ae|ldm [steps]}

# supervise <run_dir> <cmd...>: run cmd; kill it if the run's metrics.jsonl
# stops advancing for STALL_S seconds; relaunch (auto-resume) on any
# abnormal exit, up to 12 attempts. (History: quality_r03.sh.)
supervise() {
    run_dir=$1; shift
    for attempt in $(seq 1 12); do
        "$@" &
        pid=$!
        start_ts=$(date +%s)
        (
            while kill -0 "$pid" 2>/dev/null; do
                sleep 60
                m="$run_dir/metrics.jsonl"
                if [ -f "$m" ]; then
                    last=$(stat -c %Y "$m")
                    ref=$(( last > start_ts ? last : start_ts ))
                    age=$(( $(date +%s) - ref ))
                    if [ "$age" -gt "$STALL_S" ]; then
                        echo "=== watchdog: no metrics progress for ${age}s; killing $pid ==="
                        kill "$pid" 2>/dev/null
                        sleep 20
                        kill -9 "$pid" 2>/dev/null
                        break
                    fi
                fi
            done
        ) &
        dog=$!
        wait "$pid"; rc=$?
        kill "$dog" 2>/dev/null
        [ $rc -eq 0 ] && return 0
        echo "=== trainer exited rc=$rc (attempt $attempt); relaunch+resume ==="
        sleep 30
    done
    return 1
}

if [ "$STAGE" = ae ]; then
    exec bash tools/scripts/quality_r04.sh ae
fi

if [ "$STAGE" = ldm ]; then
    STEPS=${2-12000}
    AE_CKPT="$RUNS/simple_diffusion/examples/run_41/model"
    [ -d "$AE_CKPT" ] || { echo "stage-1 checkpoint missing: $AE_CKPT"; exit 2; }
    supervise "$RUNS/simple_diffusion/examples/run_42" \
    python tools/main_ldm.py datasets=examples \
        env.data_dir="$DATA" env.root_dir="$RUNS" run_idx=42 \
        base.wandb=False \
        datasets.holdout=4 \
        "base.eval_kwargs.eval_seeds=[0,1,2]" \
        base.train_kwargs.batch_size=8 \
        base.train_kwargs.train_num_steps="$STEPS" \
        base.train_kwargs.num_workers=2 \
        base.eval_kwargs.num_workers=0 \
        base.eval_kwargs.batch_size=8 \
        base.eval_kwargs.eval_every=300 \
        base.eval_kwargs.full_eval_every=1500 \
        base.eval_kwargs.quick_eval_steps=25 \
        "base.eval_kwargs.quick_eval_seeds=[0]" \
        base.eval_kwargs.initial_eval_iters=1 \
        base.train_kwargs.save_every=1000 \
        base.transformation_kwargs.size=256 \
        base.train_kwargs.weight_dtype=bfloat16 \
        base.vae_model_kwargs.pretrained_path="$AE_CKPT" \
        base.vae_model_kwargs.parametrization=gaussian \
        base.vae_model_kwargs.num_upscalers=2 \
        base.vae_model_kwargs.num_mid_blocks=0 \
        base.vae_model_kwargs.scaling_factor=0.18215 \
        base.noise_scheduler_kwargs.prediction_type=epsilon \
        base.noise_scheduler_kwargs.weight=max_clamp_snr \
        base.noise_scheduler_kwargs.max_snr=2.0 \
        base.train_kwargs.ohem_ratio=1.0 \
        base.optimizer_name=adamw \
        base.optimizer_kwargs.lr=1.0e-4 \
        base.optimizer_kwargs.weight_decay=0.05 \
        base.train_kwargs.clip_grad=1.0 \
        "base.train_kwargs.freeze_layers=[]" \
        base.sampling_kwargs.num_inference_steps=50 \
        base.train_kwargs.self_condition=True \
        base.model_kwargs.cond_channels=4 \
        base.model_kwargs.attention_head_dim=128 \
        base.lr_scheduler_name=cosine \
        base.optimizer_save_optim=True \
        base.train_kwargs.async_save=True
    exit $?
fi
