#!/bin/bash
# Verify a pretrained model: PQ on COCO val2017 (mirrors tools/scripts/eval.sh)
BS=${1-32}

python tools/main_ldm.py \
    datasets=coco \
    base.train_kwargs.batch_size=$BS \
    base.train_kwargs.weight_dtype=bfloat16 \
    base.vae_model_kwargs.scaling_factor=0.18215 \
    base.transformation_kwargs.size=512 \
    base.eval_kwargs.count_th=512 \
    base.sampling_kwargs.num_inference_steps=50 \
    base.train_kwargs.self_condition=True \
    base.model_kwargs.cond_channels=4 \
    base.load_path=pretrained/ldmseg.pt \
    base.eval_only=True
