#!/bin/bash
# RelPrompt (reliability-guided) finetune (ref: scripts/finetune_relprompt.sh).
# Corruption stays ON: the classifiers train on corrupted-feature masks.
exp_name=relprompt
train_path=/path/to/dataset/train.json
val_path=/path/to/dataset/val.json
llm=checkpoints/TinyLlama/TinyLlama-1.1B-Chat-v1.0
features=/path/to/precomputed_features   # <uid>.npz with audio/visual arrays

python -m dualhyp_tpu.cli.finetune_relprompt \
    --exp_name $exp_name \
    --train_path $train_path \
    --val_path $val_path \
    --llm_checkpoint $llm \
    --dual_hypotheses --prompts_format RelPrompt \
    --feature_dir $features \
    --lr 2e-4 --classifier_lr 1e-4 --num_epochs 5 --wp 0.2
