#!/bin/bash
# GER (ASR-only) LoRA finetune — parity with the reference launcher
# (ref: scripts/finetune_ger.sh). Corruption disabled: the GER text path
# does not need waveforms/ROIs.
exp_name=ger_asr
train_path=/path/to/dataset/train.json
val_path=/path/to/dataset/val.json
llm=checkpoints/TinyLlama/TinyLlama-1.1B-Chat-v1.0

python -m dualhyp_tpu.cli.finetune_ger \
    --exp_name $exp_name \
    --train_path $train_path \
    --val_path $val_path \
    --llm_checkpoint $llm \
    --nhyps_key nhyps_asr \
    --prompts_format GER \
    --audio_corruption_disabled --visual_corruption_disabled \
    --batch_size 32 --micro_batch_size 8 --lr 1e-4 --num_epochs 5 --wp 0.2
