#!/bin/bash
# Round-3 quality run on the bundled 16 examples — reconstruction of the
# round-2 "run_12" recipe (ROUND_NOTES_R2.md): stage-1 shallow AE, then a
# from-scratch 860M SD-topology LDM at 256^2 with self-conditioning, driven
# by the real CLIs (reference workflow: tools/scripts/train_{ae,diffusion}.sh
# + eval.sh in /root/reference).
#
# Differences from round 2, per VERDICT.md "Next round" #1/#5/#6:
#   - optimizer_save_optim=True + async_save=True (exact resume ON)
#   - MALLOC_ARENA_MAX=2 + malloc_trim after save/eval (host-RSS mitigation)
#   - run dir lives inside the repo tree so a driver reset can't erase it
#   - supervisor: crash OR stall (tunneled-TPU dispatch hangs: no
#     metrics.jsonl progress for STALL_S) kills and relaunches with exact
#     resume from the last checkpoint
#
# Usage: quality_r03.sh ae | ldm [LDM_STEPS]
set -u
export MALLOC_ARENA_MAX=2

DATA=/tmp/ldmseg_data/examples
RUNS=/root/repo/artifacts/runs
# must exceed worst-case import + checkpoint-load + tunnel compile to the
# first metrics write after a relaunch (~40 min observed)
STALL_S=${STALL_S-3600}
mkdir -p "$(dirname "$DATA")" "$RUNS"
[ -d "$DATA" ] || cp -r /root/reference/data/examples/coco "$DATA"

STAGE=${1:?usage: quality_r03.sh ae|ldm [steps]}

# supervise <run_dir> <cmd...>: run cmd; kill it if the run's metrics.jsonl
# stops advancing for STALL_S seconds; relaunch (auto-resume) on any
# abnormal exit, up to 12 attempts.
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
                    # progress reference = the LATER of last metrics write
                    # and THIS attempt's start: a fresh relaunch spends
                    # ~30-40 min in import/ckpt-load/compile before its
                    # first metrics write, and must not be judged by the
                    # previous process's last write (that bug serially
                    # killed 11 relaunches mid-compile)
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
    supervise "$RUNS/simple_diffusion/examples/run_31" \
    python tools/main_ae.py datasets=examples \
        env.data_dir="$DATA" env.root_dir="$RUNS" run_idx=31 \
        base.wandb=False \
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
    AE_CKPT="$RUNS/simple_diffusion/examples/run_31/model"
    [ -d "$AE_CKPT" ] || { echo "stage-1 checkpoint missing: $AE_CKPT"; exit 2; }
    supervise "$RUNS/simple_diffusion/examples/run_32" \
    python tools/main_ldm.py datasets=examples \
        env.data_dir="$DATA" env.root_dir="$RUNS" run_idx=32 \
        base.wandb=False \
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
