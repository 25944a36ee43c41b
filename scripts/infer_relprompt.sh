#!/bin/bash
# RelPrompt inference: predicted masks -> prompt -> decode -> WER
# (ref: scripts/infer_relprompt.sh)
test_path=/path/to/dataset/test.json
model=runs/relprompt/best_model.npz
llm=checkpoints/TinyLlama/TinyLlama-1.1B-Chat-v1.0
features=/path/to/precomputed_features

python -m dualhyp_tpu.cli.inference_relprompt \
    --test_path $test_path \
    --model_path $model \
    --llm_checkpoint $llm \
    --dual_hypotheses --prompts_format RelPrompt \
    --feature_dir $features
