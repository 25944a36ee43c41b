#!/bin/bash
# DualHyp (ASR+VSR dual hypotheses) LoRA finetune
# (ref: scripts/finetune_ger_dual.sh)
exp_name=dualhyp
train_path=/path/to/dataset/train.json
val_path=/path/to/dataset/val.json
llm=checkpoints/TinyLlama/TinyLlama-1.1B-Chat-v1.0

python -m dualhyp_tpu.cli.finetune_ger \
    --exp_name $exp_name \
    --train_path $train_path \
    --val_path $val_path \
    --llm_checkpoint $llm \
    --dual_hypotheses --prompts_format DualHyp \
    --audio_corruption_disabled --visual_corruption_disabled \
    --batch_size 32 --micro_batch_size 8 --lr 1e-4 --num_epochs 5 --wp 0.2
