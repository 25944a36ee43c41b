#!/bin/bash
# DualHyp inference + WER eval across the released test-set JSONs
# (ref: scripts/infer_ger_dual.sh:19-26): corruption replay disabled at
# eval time (hypotheses in the JSONs already carry it), dual ASR+VSR
# hypothesis prompts.
exp_name=dualhyp_lrs2
llm=checkpoints/TinyLlama/TinyLlama-1.1B-Chat-v1.0
test_path=(
    /path/to/dataset/LipHyp-AVSR/LRS2_test_whisper-large_babble-whole_braven-large_coco-chunk50.json
    /path/to/dataset/LipHyp-AVSR/LRS2_test_whisper-large_music-whole_braven-large_coco-chunk50.json
    /path/to/dataset/LipHyp-AVSR/LRS2_test_whisper-large_noise-whole_braven-large_coco-chunk50.json
    /path/to/dataset/LipHyp-AVSR/LRS2_test_whisper-large_speech-whole_braven-large_coco-chunk50.json
)

for path in "${test_path[@]}"; do
    python -m dualhyp_tpu.cli.inference_ger \
        --test_path "$path" \
        --model_path "./runs/${exp_name}/best_model.npz" \
        --llm_checkpoint "$llm" \
        --audio_corruption_disabled \
        --visual_corruption_disabled \
        --dual_hypotheses \
        --prompts_format DualHyp
done
