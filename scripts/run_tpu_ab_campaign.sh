#!/usr/bin/env bash
# Round-4i TPU A/B campaign — run when the axon tunnel is back.
# (Built during the 2026-08-18 tunnel outage; every change below is
# parity-tested on CPU and flag-gated, see BENCH_NOTES "round 4i".)
# ONE job at a time (single chip); each step appends to $LOG.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/ab_campaign.log}
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${STEP_TIMEOUT:-1800}" "$@" 2>&1 | tee -a "$LOG"
  # $? after a pipeline is tee's status (always 0) — log the step's own
  echo "=== exit ${PIPESTATUS[0]} ===" | tee -a "$LOG"
}

# 0. headline sanity (the driver's round-end metric)
run python bench.py

# 1. CTC impl A/B on the VSR beam (seq = measured-good default; assoc =
#    matmul-psi + K=1 history). Also watch for a HIGHEST-gather
#    regression in seq vs the round-4 166-198 ms/utt e2e numbers.
run python scripts/bench_vsr_beam.py --ctc_impl seq
run python scripts/bench_vsr_beam.py --ctc_impl assoc
run python scripts/bench_make_json_vsr.py

# 2. whisper beam quantized-KV A/B at U=8
run python scripts/bench_whisper_beam.py --utterances 8
run python scripts/bench_whisper_beam.py --utterances 8 --cross_kv_quant int8
run python scripts/bench_whisper_beam.py --utterances 8 --self_kv_quant int8
run python scripts/bench_whisper_beam.py --utterances 8 --cross_kv_quant int8 --self_kv_quant int8

# 3. decode_batch=16 retry under full-int8 KV (the 4h-era OOM driver)
run python scripts/bench_whisper_beam.py --utterances 16 --cross_kv_quant int8 --self_kv_quant int8

# 3b. int8 decoder WEIGHTS on top (beam is decoder-weight-HBM-bound at
#     small decode batches — 2x the dominant stream; changes outputs,
#     so it stays an option: validate_quant_wer probes the WER cost)
run python scripts/bench_whisper_beam.py --utterances 8 --quantize int8
run python scripts/bench_whisper_beam.py --utterances 8 --quantize int8 --cross_kv_quant int8 --self_kv_quant int8

# 4. offline-stage e2e (refresh + quantized variant)
run python scripts/bench_make_json_asr.py
run python scripts/bench_make_json_asr.py --cross_kv_quant int8 --self_kv_quant int8 || true
run python scripts/bench_make_json_asr.py --quantize int8 --cross_kv_quant int8 --self_kv_quant int8 || true

# 5. AVSR stage attribution (encode vs fetch vs beam)
run python scripts/profile_avsr_stages.py
run python scripts/bench_make_json_avsr.py

# 6. VSR/AVSR encode dtype A/B (bf16 checkpoints now encode in bf16 by
#    default — raven.encode_dtype; float32 restores the old path)
run env DUALHYP_RAVEN_ENCODE_DTYPE=float32 python scripts/bench_make_json_vsr.py
run env DUALHYP_RAVEN_ENCODE_DTYPE=float32 python scripts/bench_make_json_avsr.py

echo "campaign done — update BENCH_NOTES/CLAUDE.md/PARITY with results, \
flip DUALHYP_CTC_IMPL / quant defaults only where the A/B wins" | tee -a "$LOG"
