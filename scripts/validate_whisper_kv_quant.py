"""Whisper KV-quantization quality probe on a PEAKED model.

The round-4i campaign measured int8 KV speed on a random-weight
large-v3 (near-tie beams by construction — the worst case for output
stability: full-int8-KV kept top-1 on only 15/32 records there). This
probe supplies the missing *peaked-model* evidence: train a small but
real whisper encoder+decoder (same `models/whisper.py` modules the
production beam runs) to memorize a synthetic corpus, then decode it
with the production device beam under every quantization variant and
report WER / exact-match / top-1 agreement with the base beam.

A memorized model's per-step distributions are sharply peaked — the
regime a real checkpoint decodes in (the reference generates its
hypotheses with a *trained* whisper-large-v3, ref:
data/make_json_asr.py:185-186) — so int8 rounding noise must overcome
an O(1) logit margin rather than an O(epsilon) tie to flip a token.

Run (real TPU, ~3 min): python scripts/validate_whisper_kv_quant.py
CPU smoke:               python scripts/validate_whisper_kv_quant.py --cpu --steps 200
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

# the probe DIFFERENTIATES through the encoder (memorization training);
# the flash encoder kernel is inference-only (no JVP rule), so pin the
# XLA attention path — the quantization under test lives in the beam's
# decoder, not the encoder impl
os.environ["DUALHYP_WHISPER_ATTN"] = "xla"

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")

import jax.numpy as jnp
import numpy as np


def build_corpus(rng, n_utts, vocab_lo, vocab_hi, min_len, max_len):
    """Random word-token transcripts + a fixed random mel per utterance."""
    transcripts = []
    for _ in range(n_utts):
        n = int(rng.integers(min_len, max_len + 1))
        transcripts.append(rng.integers(vocab_lo, vocab_hi, size=n).tolist())
    return transcripts


def text(ids):
    return " ".join(f"w{i}" for i in ids)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "pins jax_platforms; this is the offline smoke "
                         "path — production numerics are the TPU bf16 run)")
    ap.add_argument("--utterances", type=int, default=32)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--beam", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--sweep", action="store_true",
                    help="decision curve: snapshot the model at several "
                         "training depths between random (near-tie) and "
                         "memorized (peaked), and report top-1-kept / "
                         "WER-delta of full-int8 KV against the measured "
                         "top-1 logit margin at each point — the "
                         "boundary behind the 'recommended when peaked' "
                         "guidance instead of two endpoint anecdotes")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import optax

    from dualhyp_tpu.infer.whisper_device_beam import device_beam_search_batch
    from dualhyp_tpu.infer.evaluate import word_error_rate
    from dualhyp_tpu.models import whisper as w
    from dualhyp_tpu.ops import quant

    # small but real whisper: the same encode/decode_logits/
    # decode_step_cached modules as large-v3, at probe scale
    n_vocab = 512
    enc_cfg = w.WhisperEncoderConfig(n_mels=80, n_ctx=128, n_state=256,
                                     n_head=4, n_layer=4)
    dec_cfg = w.WhisperDecoderConfig(n_vocab=n_vocab, n_ctx=128, n_state=256,
                                     n_head=4, n_layer=4)
    sot = n_vocab - 8
    eot = sot - 1
    prefix = [sot, sot + 1, sot + 2]

    rng = np.random.default_rng(0)
    # word ids in [24, 200): clear of the suppressed low range and of the
    # special/timestamp region at the top of the vocab
    transcripts = build_corpus(rng, args.utterances, 24, 200, 8, 14)
    refs = [text(t) for t in transcripts]

    mels = jnp.asarray(
        rng.normal(size=(args.utterances, enc_cfg.n_mels, enc_cfg.n_ctx * 2)),
        jnp.float32,
    )

    # teacher-forcing batch: [sot seq] + transcript + [eot], padded w/ eot,
    # loss masked to the transcript + first eot
    max_len = max(len(t) for t in transcripts) + len(prefix) + 1
    toks = np.full((args.utterances, max_len), eot, np.int32)
    mask = np.zeros((args.utterances, max_len), np.float32)
    for i, t in enumerate(transcripts):
        seq = prefix + t + [eot]
        toks[i, : len(seq)] = seq
        mask[i, len(prefix) : len(seq)] = 1.0
    toks = jnp.asarray(toks)
    # predict positions 1..max_len-1 from 0..max_len-2
    tgt_mask = jnp.asarray(mask[:, 1:])

    params = {
        "enc": w.init_encoder(enc_cfg, jax.random.key(0)),
        "dec": w.init_decoder(dec_cfg, jax.random.key(1)),
    }

    def loss_fn(p):
        feats = w.encode(p["enc"], enc_cfg, mels)
        logits = w.decode_logits(p["dec"], dec_cfg, toks[:, :-1], feats)
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, toks[:, 1:, None], axis=-1)[..., 0]
        return (nll * tgt_mask).sum() / tgt_mask.sum()

    opt = optax.adamw(args.lr, weight_decay=0.0)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    # sweep mode snapshots the params ladder between random and
    # memorized; the default keeps only the end point
    snap_at = sorted({
        0, args.steps // 16, args.steps // 8, args.steps // 4,
        args.steps // 2, args.steps,
    }) if args.sweep else [args.steps]
    snapshots = []
    if 0 in snap_at:
        snapshots.append((0, jax.tree_util.tree_map(jnp.copy, params)))

    print("training the probe model to memorization...", flush=True)
    loss = None
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state)
        if i % 200 == 0:
            print(f"  step {i}: loss {float(loss):.4f}", flush=True)
        if (i + 1) in snap_at:
            snapshots.append((i + 1, jax.tree_util.tree_map(jnp.copy, params)))
    final_loss = float(loss)
    print(f"trained: final loss {final_loss:.4f}", flush=True)
    if final_loss > 0.05:
        print("WARNING: not memorized — increase --steps; results below "
              "measure a *soft* model, not the peaked regime", flush=True)

    # decode in the production configuration: bf16 decoder params + bf16
    # cache on TPU (XLA:CPU lacks the mixed bf16 dot, keep f32 there).
    # Features come from one f32 encode (the training path — the probe
    # measures DECODER KV quantization; a bf16 XLA-path encode also trips
    # a Mosaic bf16-lhs/fp32-precision lowering bug at probe shapes on
    # the axon compile server) and are cast for the beam.
    decode_dtype = jnp.float32 if args.cpu else jnp.bfloat16

    def prepare(p):
        dec_p = jax.tree_util.tree_map(
            lambda x: x.astype(decode_dtype), p["dec"]
        )
        f = jax.jit(lambda pe, m: w.encode(pe, enc_cfg, m))(p["enc"], mels)
        return dec_p, jax.block_until_ready(f).astype(decode_dtype)

    dec, feats = prepare(params)

    suppress = list(range(20)) + [sot, sot + 1, sot + 2]
    budget = max_len - len(prefix) + 4

    def decode_all(dec_params, feats_in, cross_kv_quant=None,
                   self_kv_quant=None):
        """Top-1 beam transcript per utterance, batched in groups of 8."""
        out = []
        for lo in range(0, args.utterances, 8):
            groups = device_beam_search_batch(
                dec_params, dec_cfg, feats_in[lo : lo + 8], prefix,
                beam_size=args.beam, eos_id=eot, max_new_tokens=budget,
                suppress_tokens=suppress, suppress_blank_ids=[eot],
                timestamp_rules=None, cache_dtype=decode_dtype,
                cross_kv_quant=cross_kv_quant, self_kv_quant=self_kv_quant,
            )
            for hyps in groups:
                best = max(hyps, key=lambda h: h.score / max(h.n_sampled, 1))
                out.append(best.tokens[best.sample_begin:])
        return out

    @jax.jit
    def margin_of(p):
        """Mean teacher-forced top-1 log-prob margin over transcript
        positions — the peakedness axis of the decision curve. Random
        weights sit near 0 (near-tie); a memorized model is O(1+)."""
        f = w.encode(p["enc"], enc_cfg, mels)
        logits = w.decode_logits(p["dec"], dec_cfg, toks[:, :-1], f)
        lp = jax.nn.log_softmax(logits, axis=-1)
        top2, _ = jax.lax.top_k(lp, 2)
        marg = top2[..., 0] - top2[..., 1]
        return (marg * tgt_mask).sum() / tgt_mask.sum()

    if args.sweep:
        print(f"\nint8-KV decision curve ({args.utterances} utterances, "
              f"beam {args.beam}, {decode_dtype.__name__} compute):")
        print(f"  {'step':>6} {'loss':>8} {'margin':>8} "
              f"{'top1-kept':>10} {'WER(base)':>10} {'WER(int8)':>10}")
        for step_i, p in snapshots:
            dec_s, feats_s = prepare(p)
            m = float(margin_of(p))
            base_o = [text(o) for o in decode_all(dec_s, feats_s)]
            q_o = [text(o) for o in decode_all(dec_s, feats_s,
                                               "int8", "int8")]
            kept = sum(h == b for h, b in zip(q_o, base_o))
            l = float(loss_fn(p))
            print(f"  {step_i:>6} {l:>8.4f} {m:>8.3f} "
                  f"{kept:>7}/{args.utterances} "
                  f"{word_error_rate(base_o, refs):>10.4f} "
                  f"{word_error_rate(q_o, refs):>10.4f}", flush=True)
        print("\ncurve read: int8 KV is safe where top1-kept ~= N and the "
              "WER columns match; the boundary margin is where they "
              "diverge (BENCH_NOTES round 5).")
        return

    variants = [
        ("base", dec, None, None),
        ("self_kv int8", dec, None, "int8"),
        ("cross_kv int8", dec, "int8", None),
        ("cross+self int8", dec, "int8", "int8"),
        ("weights int8 + cross+self int8",
         quant.quantize_tree(dec, "int8"), "int8", "int8"),
    ]
    base_out = None
    print(f"\ndecoding {args.utterances} utterances, beam {args.beam}, "
          f"{decode_dtype.__name__} compute:", flush=True)
    rows = []
    for name, p, ckq, skq in variants:
        outs = decode_all(p, feats, cross_kv_quant=ckq, self_kv_quant=skq)
        hyps_text = [text(o) for o in outs]
        wer = word_error_rate(hyps_text, refs)
        exact = sum(h == r for h, r in zip(hyps_text, refs))
        if base_out is None:
            base_out = hyps_text
            agree = len(hyps_text)
        else:
            agree = sum(h == b for h, b in zip(hyps_text, base_out))
        rows.append((name, wer, exact, agree))
        print(f"  {name:32s} WER {wer:.4f}  exact {exact}/{len(refs)}  "
              f"top-1 == base {agree}/{len(refs)}", flush=True)

    print("\nsummary: peaked-model output stability of the int8 KV flags "
          "(cf. the random-weight worst case in BENCH_NOTES round 4i)")


if __name__ == "__main__":
    main()
