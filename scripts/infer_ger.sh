#!/bin/bash
# GER/DualHyp inference + WER eval (ref: scripts/infer_ger.sh)
test_path=/path/to/dataset/test.json
model=runs/dualhyp/best_model.npz
llm=checkpoints/TinyLlama/TinyLlama-1.1B-Chat-v1.0

python -m dualhyp_tpu.cli.inference_ger \
    --test_path $test_path \
    --model_path $model \
    --llm_checkpoint $llm \
    --dual_hypotheses --prompts_format DualHyp
