#!/bin/bash
# Round-4 quality run: the round-3 recipe (quality_r03.sh) made honest per
# VERDICT r3 "Next round" #1 — the round-3 checkpoints did NOT survive the
# environment reset (artifacts/runs/**/best_model is .gitignored and the
# host fs was wiped), so this retrains from scratch with:
#   - datasets.holdout=4      -> train on 12 images, eval on a HELD-OUT 4
#     (the honest equivalent of the reference's val2017 protocol,
#     reference coco.py:106 / README.md:136, on the only data available;
#     round 3's numbers were training-set PQ)
#   - eval_kwargs.eval_seeds=[0,1,2] -> in-training generative eval runs 3
#     noise seeds and best-model selection rides the MEAN (round-3 measured
#     single-seed std was +/-4.8 PQ — VERDICT r3 weak #2)
# Everything else matches quality_r03.sh (itself the round-2 run_12 recipe).
#
# Usage: quality_r04.sh ae | ldm [LDM_STEPS]
set -u
export MALLOC_ARENA_MAX=2

DATA=/tmp/ldmseg_data/examples
RUNS=/root/repo/artifacts/runs
STALL_S=${STALL_S-3600}
mkdir -p "$(dirname "$DATA")" "$RUNS"
[ -d "$DATA" ] || cp -r /root/reference/data/examples/coco "$DATA"

STAGE=${1:?usage: quality_r04.sh ae|ldm [steps]}

# supervise <run_dir> <cmd...>: run cmd; kill it if the run's metrics.jsonl
# stops advancing for STALL_S seconds; relaunch (auto-resume) on any
# abnormal exit, up to 12 attempts. (See quality_r03.sh for the history of
# the progress-reference logic.)
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
    supervise "$RUNS/simple_diffusion/examples/run_41" \
    python tools/main_ae.py datasets=examples \
        env.data_dir="$DATA" env.root_dir="$RUNS" run_idx=41 \
        base.wandb=False \
        datasets.holdout=4 \
        base.train_kwargs.batch_size=8 \
        base.train_kwargs.train_num_steps=2000 \
        base.train_kwargs.num_workers=2 \
        base.eval_kwargs.num_workers=0 \
        base.eval_kwargs.batch_size=8 \
        base.eval_kwargs.eval_every=250 \
        base.train_kwargs.save_every=100 \
        base.transformation_kwargs.size=256 \
        base.vae_model_kwargs.num_mid_blocks=0 \
        base.vae_model_kwargs.num_upscalers=2 \
        base.vae_model_kwargs.parametrization=gaussian \
        base.optimizer_name=adamw \
        base.optimizer_kwargs.lr=1e-4 \
        base.optimizer_kwargs.weight_decay=0.05 \
        base.eval_kwargs.mask_th=0.8 \
        base.train_kwargs.prob_inpainting=0.0 \
        base.optimizer_save_optim=True \
        base.train_kwargs.async_save=True
    exit $?
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
        base.eval_kwargs.initial_eval_iters=1 \
        base.train_kwargs.save_every=250 \
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
