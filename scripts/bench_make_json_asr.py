"""End-to-end offline ASR hypothesis-generation bench (L2, real TPU).

One driver-readable number for the reference's most expensive offline
stage (ref: data/make_json_asr.py:17-128): the FULL `make_json` pipeline
— wav load -> noise mix at sampled SNR -> pad/trim -> log-mel -> whisper
encode -> beam-50 batched device beam -> normalizer -> n-best dedupe ->
JSON dump — in utterances/sec at decode_batch=16.

Random weights at the real whisper-large-v3 shape (throughput depends on
shapes, not values; no network egress for the 3 GB checkpoint), bf16,
driven through the PRODUCTION `cli.make_json_asr.make_json` entry with a
manifest of synthesized wavs: only `load_whisper` is substituted (the
safetensors ingest is covered by tests/test_whisper_hf_parity.py).

Run: python scripts/bench_make_json_asr.py [--utterances 32] [--tiny]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

SR = 16000


class BenchTok:
    """Whisper-large-v3-shaped tokenizer stand-in: realistic special-token
    ids and timestamp region so the logit-rule masks carry production
    sizes; text round-trips as space-joined token ids."""

    def __init__(self, n_vocab=51866, tiny=False):
        # eot sits before the specials + timestamp block (1501 timestamps
        # at large-v3 shape; a 32-entry block for --tiny smoke shapes)
        self.eot = n_vocab - (46 if tiny else 1515)
        self.sot = self.eot + 1
        self.specials = {
            "<|endoftext|>": self.eot,
            "<|startoftranscript|>": self.sot,
            "<|en|>": self.sot + 1,
            "<|transcribe|>": self.sot + 6,
            "<|translate|>": self.sot + 7,
            "<|startoflm|>": self.sot + 8,
            "<|startofprev|>": self.sot + 9,
            "<|nospeech|>": self.sot + 10,
            "<|notimestamps|>": self.sot + 11,
            "<|0.00|>": self.sot + 12,
        }
        self.n_vocab = n_vocab

    def convert_tokens_to_ids(self, token):
        return self.specials.get(token, -1)

    def encode(self, text, add_special_tokens=False):
        # deterministic 1-2 token "BPE" into the text-token range
        ids = [(abs(hash(("tok", text))) % (self.eot - 40)) + 40]
        if len(text) > 2:
            ids.append((abs(hash(("tok2", text))) % (self.eot - 40)) + 40)
        return ids

    def decode(self, ids, skip_special_tokens=True):
        # letters-only words: digits would be exploded by the pipeline's
        # digits->words normalizer, inflating word counts 3-5x
        return " ".join(
            "w" + "".join("abcdefghij"[int(c)] for c in str(int(t)))
            for t in ids if t < self.eot - 40
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utterances", type=int, default=32)
    ap.add_argument("--decode_batch", type=int, default=8,
                    help="16 OOMs at large-v3 beam 50 on v5e-1 (23G > 15.75G)")
    ap.add_argument("--beam", type=int, default=50)
    ap.add_argument("--max_new_tokens", type=int, default=32,
                    help="typical LRS2 utterance length; random weights "
                         "rarely sample EOT so this bounds the beam")
    ap.add_argument("--eos_bias", type=float, default=0.0,
                    help="scale the random decoder's EOT embedding row so "
                         "beams TERMINATE at speech-like lengths (0 = off; "
                         "decodes then run the full budget). Lets the bench "
                         "run the production --max_new_tokens 224 budget "
                         "with realistic early exit + bucketed cache growth")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke shapes")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "pins jax_platforms; use with --tiny)")
    ap.add_argument("--cross_kv_quant", default=None, choices=("int8",))
    ap.add_argument("--self_kv_quant", default=None, choices=("int8",))
    ap.add_argument("--quantize", default=None, choices=("int8", "int4"),
                    help="the make_json_asr `quantize` option (int8 decoder "
                         "weights — the beam is decoder-weight-HBM-bound at "
                         "small decode batches)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dualhyp_tpu.cli import make_json_asr
    from dualhyp_tpu.models import whisper as w

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
    tok = BenchTok(dec_cfg.n_vocab, tiny=args.tiny)
    if args.eos_bias:
        dec["token_embedding"] = (
            dec["token_embedding"].at[tok.eot].multiply(args.eos_bias)
        )

    tmp = Path(tempfile.mkdtemp(prefix="bench_makejson_"))
    rng = np.random.default_rng(0)

    def write_wav(path, wave):
        import wave as wavmod

        pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2")
        with wavmod.open(str(path), "wb") as fp:
            fp.setnchannels(1)
            fp.setsampwidth(2)
            fp.setframerate(SR)
            fp.writeframes(pcm.tobytes())

    n = args.utterances
    lines = []
    for i in range(n):
        dur = rng.uniform(3.0, 6.0)  # LRS2-ish utterance lengths
        wav = tmp / f"utt{i:04d}.wav"
        write_wav(wav, 0.1 * rng.standard_normal(int(dur * SR)))
        lines.append(f"utt{i:04d}\t{wav}\tsome spoken caption {i}")
    manifest = tmp / "manifest.tsv"
    manifest.write_text("\n".join(lines) + "\n")
    noise = tmp / "noise.wav"
    write_wav(noise, 0.1 * rng.standard_normal(30 * SR))

    # substitute ONLY the checkpoint load; everything downstream is the
    # production make_json pipeline
    make_json_asr.load_whisper = lambda *a, **k: (
        (enc, enc_cfg), (dec, dec_cfg), tok
    )

    cfg = {
        "model_checkpoint": "<in-memory random large-v3>",
        "manifest": str(manifest),
        "output_file": str(tmp / "out.json"),
        "noise_wav": str(noise),
        "dataset_name": "bench",
        "decode_batch": args.decode_batch,
        "beam_size": args.beam,
        "max_new_tokens": args.max_new_tokens,
        "dump_every": 10_000,
        "seed": 0,
        "cross_kv_quant": args.cross_kv_quant,
        "self_kv_quant": args.self_kv_quant,
        "quantize": args.quantize,
    }

    print("warmup (compile) pass...", flush=True)
    warm = dict(cfg, manifest=str(manifest), output_file=str(tmp / "warm.json"))
    # warm on the first decode_batch utterances only: same shapes, so the
    # timed pass hits the jit cache
    warm_manifest = tmp / "warm.tsv"
    warm_manifest.write_text("\n".join(lines[: args.decode_batch]) + "\n")
    warm["manifest"] = str(warm_manifest)
    t0 = time.perf_counter()
    make_json_asr.make_json(warm)
    print(f"warmup done in {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    make_json_asr.make_json(cfg)
    dt = time.perf_counter() - t0

    out = json.load(open(tmp / "out.json"))
    assert len(out) == n, (len(out), n)
    assert all(len(r["nhyps"]["hyps"]) == 5 for r in out)
    lens = [len(r["nhyps"]["hyps"][0].split()) for r in out]
    print(f"  decoded length (best hyp): mean {np.mean(lens):.1f} tokens, "
          f"max {max(lens)} (budget {args.max_new_tokens})")
    ups = n / dt
    print(
        f"make_json_asr end-to-end: {n} utterances, beam {args.beam}, "
        f"decode_batch {args.decode_batch}, {args.max_new_tokens} tokens max: "
        f"{dt:.2f}s total -> {ups:.2f} utt/s ({1e3/ups:.0f} ms/utt)"
    )
    print(json.dumps({
        "metric": "make_json_asr_beam50_utterances_per_sec",
        "value": round(ups, 3), "unit": "utt/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
