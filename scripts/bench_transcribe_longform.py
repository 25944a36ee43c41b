"""Long-form transcription throughput on real hardware.

Times `infer.transcribe.transcribe` — the fork's `transcribe()` surface
(ref: data/whisper/transcribe.py:96-460): window seek loop, rolling
`condition_on_previous_text` prompts, n-best seek streams — at
whisper-large-v3 shapes over multi-minute audio, reporting the
realtime factor (audio seconds per wall second).

Random weights (throughput depends on shapes, not values), so the
bench pins the semantics that would otherwise be weight-dependent:
- one temperature (0.0) and thresholds None: no fallback re-decodes
  (a random model's compression/logprob stats would retrigger them
  unpredictably; the fallback machinery itself is exercised by
  tests/test_transcribe_longform.py)
- the tokenizer exposes no <|0.00|> token, so every window advances the
  full 30 s (a random model emits arbitrary timestamp pairs, which
  would make the seek advance — and therefore the amount of decoded
  audio — a function of the random seed)
- the EOT embedding row is scaled up so beams terminate at speech-like
  lengths instead of always running the full token budget

Run: python scripts/bench_transcribe_longform.py [--minutes 2]
CPU smoke: python scripts/bench_transcribe_longform.py --cpu --tiny
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

SR = 16000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=2.0)
    ap.add_argument("--beam", type=int, default=5,
                    help="beam width AND n-best seek-stream count (the "
                         "fork keeps every rank's stream)")
    ap.add_argument("--max_new_tokens", type=int, default=48,
                    help="tokens per 30 s window. A trained model emits "
                         "~30 tokens then EOT; random weights never "
                         "terminate reliably (even with --eos_bias), so "
                         "the speech-like bound stands in for the "
                         "early exit — pass 224 to time the production "
                         "budget as a worst case (~2.6x realtime)")
    ap.add_argument("--eos_bias", type=float, default=3.0)
    ap.add_argument("--scheduler", choices=["batched", "sequential"],
                    default="batched",
                    help="batched = one ragged-prefix lockstep beam per "
                         "scheduler round over all n-best streams (the "
                         "default, batch_streams=True); sequential = the "
                         "one-window-at-a-time reference sweep, the A/B "
                         "baseline")
    ap.add_argument("--cross_kv_quant", default=None, choices=("int8",))
    ap.add_argument("--self_kv_quant", default=None, choices=("int8",))
    ap.add_argument("--quantize", default=None, choices=("int8", "int4"),
                    help="int8/int4 decoder WEIGHTS (make_json_asr's "
                         "quantize option). Round-4m fixed-work verdict: "
                         "int8 weights LOSE here (4.2x vs 5.4x base at "
                         "eos_bias 0 / 224 budget) — ~25 beam rows is "
                         "already enough arithmetic that the dequant "
                         "overhead dominates; the apparent win in "
                         "free-termination runs was beam-termination "
                         "noise. The winning flags are the KV pair "
                         "(--cross_kv_quant/--self_kv_quant: 7.0x)")
    ap.add_argument("--reps", type=int, default=2,
                    help="warm repetitions; the MIN is the headline (the "
                         "tunnel RTT swings 24-300+ ms between periods and "
                         "a 224-budget run crosses host ~70 times, so "
                         "single warm runs have measured 2x apart)")
    ap.add_argument("--ab", default=None, metavar="K=V[,K=V...]",
                    help="A/B mode: run the flag-specified config (A) and "
                         "a variant (B) overriding the given keys (e.g. "
                         "--ab self_kv_quant=int8,cross_kv_quant=int8) in "
                         "one process. FORCES fixed work (--eos_bias 0: "
                         "free-termination A/Bs on random weights are "
                         "confounded by where near-tie beams hit EOT — "
                         "the round-4m lesson) and REFUSES the comparison "
                         "if decoded-token counts differ >1%")
    ap.add_argument("--trace", action="store_true",
                    help="capture a jax.profiler trace of one warm run "
                         "and print the device-plane op aggregation "
                         "(the round-5 long-form wall hunt)")
    ap.add_argument("--tiny", action="store_true", help="smoke shapes")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "pins jax_platforms)")
    args = ap.parse_args()
    if args.ab is not None and args.eos_bias != 0.0:
        print("A/B mode: forcing --eos_bias 0 (fixed work; free "
              "termination is for absolute xRT claims only)")
        args.eos_bias = 0.0
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dualhyp_tpu.infer.transcribe import transcribe
    from dualhyp_tpu.models import whisper as w
    from bench_make_json_asr import BenchTok

    if args.tiny:
        enc_cfg = w.WhisperEncoderConfig(n_mels=80, n_ctx=1500, n_state=64,
                                         n_head=4, n_layer=2)
        dec_cfg = w.WhisperDecoderConfig(n_vocab=1024, n_ctx=448, n_state=64,
                                         n_head=4, n_layer=2)
    else:
        enc_cfg = w.WHISPER_LARGE_V3
        dec_cfg = w.WhisperDecoderConfig()  # large-v3 decoder defaults

    # XLA:CPU lacks the bf16 x bf16 = f32 dot the TPU path uses
    dtype = jnp.float32 if args.cpu else jnp.bfloat16
    enc = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), w.init_encoder(enc_cfg, jax.random.key(0))
    )
    dec = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), w.init_decoder(dec_cfg, jax.random.key(1))
    )

    class NoTsTok(BenchTok):
        """BenchTok minus the timestamp block: deterministic full-window
        seek advance under random weights (see module docstring)."""

        def convert_tokens_to_ids(self, token):
            if token == "<|0.00|>":
                return -1
            return super().convert_tokens_to_ids(token)

    tok = NoTsTok(dec_cfg.n_vocab, tiny=args.tiny)
    if args.eos_bias:
        dec["token_embedding"] = (
            dec["token_embedding"].at[tok.eot].multiply(args.eos_bias)
        )

    seconds = args.minutes * 60.0
    rng = np.random.default_rng(0)
    audio = rng.normal(scale=0.05, size=int(seconds * SR)).astype(np.float32)

    def measure(label, scheduler, cross_kv_quant, self_kv_quant, quantize):
        dec_run = dec
        if quantize:
            # quantize AFTER the eos_bias embedding edit so the biased
            # row is what gets rounded (the embedding table itself stays
            # full precision — quantize_tree touches matmul weights only)
            from dualhyp_tpu.ops import quant

            dec_run = quant.quantize_tree(dec, quantize)

        def run():
            return transcribe(
                audio, (enc, enc_cfg), (dec_run, dec_cfg), tok,
                language="en", beam_size=args.beam,
                temperature=0.0,
                compression_ratio_threshold=None,
                logprob_threshold=None,
                no_speech_threshold=None,
                condition_on_previous_text=True,
                max_new_tokens=args.max_new_tokens,
                batch_streams=scheduler == "batched",
                cross_kv_quant=cross_kv_quant,
                self_kv_quant=self_kv_quant,
            )

        print(f"[{label}] compiling + warm run ({args.minutes:g} min "
              f"audio, beam {args.beam}, "
              f"{'tiny' if args.tiny else 'large-v3'})...", flush=True)
        t0 = time.perf_counter()
        results = run()
        t_cold = time.perf_counter() - t0
        n_segs = len(results[0]["segments"])
        print(f"  cold (incl. compile): {t_cold:.1f} s, "
              f"{len(results)} hypothesis streams, {n_segs} segments",
              flush=True)

        # tunnel probes: a 224-budget run syncs host<->device ~70 times
        # (RTT-sensitive) and fetches a ~134 KB ys pack per round
        # (download-BW-sensitive), so BOTH must be on the record — the
        # 2026-08-20 degradation dropped download to 0.4 MB/s while RTT
        # looked normal (CLAUDE.md), which inflates fetch-heavy benches
        # only
        x = jnp.zeros(()) + 1.0
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for _ in range(10):
            float(jnp.asarray(x) + 1.0)
        rtt_ms = (time.perf_counter() - t0) / 10 * 1e3
        big = jax.block_until_ready(jnp.zeros((1024, 1024)))  # 4 MB
        t0 = time.perf_counter()
        np.asarray(big)
        down = 4.0 / max(time.perf_counter() - t0, 1e-9)
        print(f"  tunnel sync RTT: {rtt_ms:.1f} ms, "
              f"download {down:.0f} MB/s", flush=True)

        times = []
        for _ in range(max(args.reps, 1)):
            t0 = time.perf_counter()
            results = run()
            times.append(time.perf_counter() - t0)
        t_warm = min(times)
        if args.trace:
            import tempfile

            trace_dir = tempfile.mkdtemp(prefix="dualhyp_longform_trace_")
            with jax.profiler.trace(trace_dir):
                run()
            print("trace:", trace_dir, flush=True)
            from profile_train_trace import analyze

            analyze(trace_dir, steps=1)
        if len(times) > 1:
            print("  warm reps: " + ", ".join(f"{t:.2f}s" for t in times),
                  flush=True)
        xrt = seconds / t_warm
        # Decoded-token count: quantization noise shifts logits, which
        # under --eos_bias moves WHERE beams terminate — configs that
        # look slower may simply have decoded more tokens (random-weight
        # artifact, not a systems regression). Print it so A/Bs are
        # interpretable.
        n_tok = sum(len(s.get("tokens", ())) for r in results
                    for s in r["segments"])
        print(f"  decoded tokens across streams: {n_tok} "
              f"({n_tok / max(len(results), 1):.0f}/stream)", flush=True)
        # window decodes: the first window is decoded once and consumed
        # by every stream; afterwards each of the beam_size n-best
        # streams decodes its own windows (full-30s advance, NoTsTok)
        n_windows = -(-int(seconds) // 30)
        n_decodes = 1 + args.beam * max(n_windows - 1, 0)
        print(
            f"[{label}] long-form transcribe: {seconds:.0f} s audio in "
            f"{t_warm:.2f} s wall = {xrt:.1f}x realtime "
            f"({t_warm / n_decodes * 1e3:.0f} ms per stream-window, "
            f"{n_decodes} stream-windows across {len(results)} n-best "
            f"streams, {scheduler} scheduler)", flush=True,
        )
        return t_warm, xrt, n_tok

    base = dict(scheduler=args.scheduler,
                cross_kv_quant=args.cross_kv_quant,
                self_kv_quant=args.self_kv_quant,
                quantize=args.quantize)
    if args.ab is None:
        measure("A", **base)
        return

    # A/B mode: fixed work enforced above (eos_bias 0); B overrides keys
    variant = dict(base)
    for kv in args.ab.split(","):
        k, _, v = kv.partition("=")
        k = k.strip()
        if k not in variant:
            ap.error(f"--ab key {k!r} not one of {sorted(variant)} "
                     "(work-changing knobs like max_new_tokens must be "
                     "held fixed across an A/B)")
        variant[k] = None if v in ("", "none", "None") else v.strip()
    t_a, xrt_a, tok_a = measure("A " + str(base), **base)
    t_b, xrt_b, tok_b = measure("B " + str(variant), **variant)
    drift = abs(tok_a - tok_b) / max(tok_a, 1)
    if drift > 0.01:
        print(f"A/B REFUSED: decoded-token counts differ {drift:.1%} "
              f"({tok_a} vs {tok_b}) — the configs did different work, "
              "so the wall-clock ratio is not a systems comparison "
              "(round-4m confound). Investigate termination first.")
        sys.exit(2)
    print(f"A/B verdict (fixed work, {tok_a} vs {tok_b} tokens): "
          f"A {xrt_a:.1f}x vs B {xrt_b:.1f}x realtime "
          f"({(t_a / t_b - 1) * 100:+.1f}% wall for B)")


if __name__ == "__main__":
    main()
