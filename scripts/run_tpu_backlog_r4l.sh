#!/usr/bin/env bash
# Round-4l TPU measurement backlog — run when the axon tunnel is back
#
# STATUS (round 5): ALL items below were executed and recorded —
# bench sanity + long-form int8 A/Bs superseded by the round-5 fixed-work
# protocol (BENCH_NOTES round 5: 20.9x triple-int8), and the int8 beam
# profile ran (the round-5 flat-selection + shared-prefix work came out
# of it). Kept for the record only.
# (second outage of the round, 2026-08-20 ~01:00 UTC: probes hang at
# jax.devices(); the int8 long-form compile stalled mid-campaign with
# no compile-cache writes after 00:46).
# ONE job at a time (single chip); each step appends to $LOG.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/backlog_r4l.log}
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${STEP_TIMEOUT:-3600}" "$@" 2>&1 | tee -a "$LOG"
  echo "=== exit ${PIPESTATUS[0]} ===" | tee -a "$LOG"
}

# 0. tunnel probe + headline sanity
timeout 60 python -c "import jax; print(jax.devices())" || exit 1
run python bench.py

# 1. long-form int8 KV A/B (interrupted by the outage; compiles partially
#    cached). Baselines already measured at normal RTT this round:
#    budget 48: batched 8.3x vs sequential 6.2x; budget 224: 4.8x vs 2.8x.
run python scripts/bench_transcribe_longform.py --scheduler batched --max_new_tokens 224 --cross_kv_quant int8 --self_kv_quant int8
run python scripts/bench_transcribe_longform.py --scheduler batched --cross_kv_quant int8 --self_kv_quant int8

# 2. long-form int8 decoder WEIGHTS (new flag, round 4l): ~25 beam rows
#    per round is the weight-stream-bound regime where int8 weights paid
#    2x on GER decode; expect a real win unlike the U=8 beam-50 neutral.
run python scripts/bench_transcribe_longform.py --scheduler batched --max_new_tokens 224 --quantize int8
run python scripts/bench_transcribe_longform.py --scheduler batched --max_new_tokens 224 --quantize int8 --cross_kv_quant int8 --self_kv_quant int8

# 3. op-level profile of the recommended U=8 full-int8 beam config —
#    the next-lever hunt for the 149 ms/utt.
run python scripts/profile_whisper_beam.py --cross_kv_quant int8 --self_kv_quant int8
