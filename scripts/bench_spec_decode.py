"""Speculative (prompt-lookup) decode benchmark — run on the real TPU.

Three honest measurements (no rigged acceptance):

A. Correction regime, trained model: train the memorization probe
   (synthetic GER corpus, fixed prompts — same recipe as
   scripts/validate_e2e.py), then decode with `generate` vs
   `generate_lookup` and report tokens/step (true acceptance), wall
   time, and token-identity of the outputs.

B. Flagship 1.1B mechanics: random weights (acceptance ~ 0 — worst
   case) at batch 1 and 16, reporting the overhead of the chunked
   verify step vs plain greedy, plus the verified tokens/step.

C. Implied flagship p50: batch-1/16 p50 at Part A's measured
   tokens/step, derived from Part B's measured per-step times
   (prefill + steps x step-time) — labeled as derived, not measured.
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")

import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.config import GPTConfig
from dualhyp_tpu.data import collate, hypotheses, synthetic
from dualhyp_tpu.infer.decode import generate, generate_lookup
from dualhyp_tpu.models import gpt
from dualhyp_tpu.registry import config_from_name
from dualhyp_tpu.train import TrainConfig, Trainer


def make_tokenizer():
    from tokenizers import Tokenizer as HFTok
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import WhitespaceSplit

    words = synthetic.word_vocabulary()
    vocab = {"<unk>": 0, "</s>": 1}
    for w in words:
        vocab[w] = len(vocab)

    class Tok:
        eos_token = "</s>"
        eos_token_id = 1

        def __init__(self):
            t = HFTok(WordLevel(vocab, unk_token="<unk>"))
            t.pre_tokenizer = WhitespaceSplit()
            t.add_special_tokens(["</s>"])
            self.t = t

        def encode(self, s):
            return self.t.encode(s).ids

        def decode(self, ids):
            return self.t.decode([int(i) for i in ids])

    return Tok(), len(vocab)


def part_a():
    print("== A. trained correction model (synthetic GER corpus) ==", flush=True)
    tok, vocab_size = make_tokenizer()
    tmp = Path(tempfile.mkdtemp())
    synthetic.write_json(
        tmp / "train.json",
        synthetic.make_records(n_uids=64, variants_per_uid=1, seed=1),
    )
    cfg = GPTConfig(
        name="specbench", block_size=768, vocab_size=vocab_size,
        padding_multiple=8, n_layer=4, n_head=8, n_query_groups=2,
        n_embd=128, rotary_percentage=1.0, parallel_residual=False,
        bias=False, norm_class="RMSNorm", mlp_class="LLaMAMLP",
        intermediate_size=256, lora_r=0,
    )
    ds = hypotheses.DualHypothesesDataset(
        "train", str(tmp / "train.json"), tok, prompts_format="DualHyp",
        seed=3, random_sample_nhyps=False,
    )
    params = gpt.init(cfg, jax.random.key(0))
    tcfg = TrainConfig(
        learning_rate=1e-3, batch_size=16, micro_batch_size=16,
        compute_dtype="bfloat16", lm_head_chunk_size=0, mode="full",
    )
    trainer = Trainer(cfg, tcfg, params)
    rng = jax.random.key(7)
    for epoch in range(80):
        for batch in collate.epoch_batches(
            ds, 16, shuffle=True, seed=0, epoch=epoch, buckets=(512,)
        ):
            rng, k = jax.random.split(rng)
            loss, _ = trainer.train_step(
                batch, max_iters=2000, warmup_steps=20, rng=k
            )
    print(f"  trained: final loss {float(loss):.4f}", flush=True)
    params = trainer.params

    # pack all prompts at one bucket length
    examples = [ds[i] for i in range(len(ds))]
    max_new = 24
    target = 512
    b = len(examples)
    ids = np.zeros((b, target), np.int32)
    lengths = np.zeros((b,), np.int32)
    for i, ex in enumerate(examples):
        p = ex.input_ids_no_response[:target]
        ids[i, : len(p)] = p
        lengths[i] = len(p)
    ids, lengths = jnp.asarray(ids), jnp.asarray(lengths)

    def run_base():
        return generate(
            params, cfg, ids, lengths, max_new_tokens=max_new,
            temperature=0.2, top_k=1, eos_id=tok.eos_token_id,
        )

    def run_spec(draft_len):
        return generate_lookup(
            params, cfg, ids, lengths, max_new_tokens=max_new,
            eos_id=tok.eos_token_id, draft_len=draft_len, return_steps=True,
        )

    bt, bl = run_base()
    jax.block_until_ready(bt)
    t0 = time.perf_counter()
    bt, bl = run_base()
    jax.block_until_ready(bt)
    base_wall = time.perf_counter() - t0
    print(f"  greedy generate: {base_wall*1000:.0f} ms (batch {b})", flush=True)

    for draft_len in (4, 8, 12):
        st, sl, (steps, emitted) = run_spec(draft_len)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        st, sl, (steps, emitted) = run_spec(draft_len)
        jax.block_until_ready(st)
        wall = time.perf_counter() - t0
        # token identity
        ok = bool(np.array_equal(np.asarray(sl), np.asarray(bl)))
        if ok:
            for i in range(b):
                n = int(bl[i])
                if not np.array_equal(np.asarray(st)[i, :n], np.asarray(bt)[i, :n]):
                    ok = False
                    break
        tps = float(np.mean(np.asarray(emitted))) / max(int(steps), 1)
        print(
            f"  lookup draft={draft_len}: {wall*1000:.0f} ms, "
            f"{int(steps)} steps for mean {float(np.mean(np.asarray(emitted))):.1f} "
            f"tokens -> {tps:.2f} tokens/step (batch-lockstep), identical={ok}, "
            f"speedup x{base_wall/wall:.2f}",
            flush=True,
        )

    # true PER-ROW acceptance (batch=1, no lockstep gating), first 24 rows
    for ngram in (2, 3):
        row_tps = []
        for i in range(24):
            _, _, (steps, emitted) = generate_lookup(
                params, cfg, ids[i : i + 1], lengths[i : i + 1],
                max_new_tokens=max_new, eos_id=tok.eos_token_id,
                draft_len=8, ngram=ngram, return_steps=True,
            )
            e = int(np.asarray(emitted)[0])
            if e:
                row_tps.append(e / int(steps))
        row_tps = np.asarray(row_tps)
        print(
            f"  per-row acceptance (draft=8, ngram={ngram}): "
            f"mean {row_tps.mean():.2f} tokens/step, median "
            f"{np.median(row_tps):.2f}, min {row_tps.min():.2f}, "
            f"max {row_tps.max():.2f}",
            flush=True,
        )

    # hypothesis-anchored drafting: monotonic pointer over the best-ASR
    # span sitting verbatim in the prompt (infer/decode.generate_anchored)
    from dualhyp_tpu.infer.decode import (
        find_subsequence_span, generate_anchored,
    )

    span_start = np.zeros((b,), np.int32)
    span_len = np.zeros((b,), np.int32)
    for i, ex in enumerate(examples):
        best = ex.records[0]["nhyps_asr"]["hyps"][0]
        s, l = find_subsequence_span(
            list(np.asarray(ids[i])[: int(lengths[i])]), tok.encode(best)
        )
        span_start[i], span_len[i] = s, l
    n_spanned = int((span_len > 0).sum())
    print(f"  anchored spans located: {n_spanned}/{b}", flush=True)
    sps, spl = jnp.asarray(span_start), jnp.asarray(span_len)

    def run_anchored(draft_len):
        return generate_anchored(
            params, cfg, ids, lengths, sps, spl, max_new_tokens=max_new,
            eos_id=tok.eos_token_id, draft_len=draft_len, return_steps=True,
        )

    for draft_len in (8, 12):
        st, sl, (steps, emitted) = run_anchored(draft_len)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        st, sl, (steps, emitted) = run_anchored(draft_len)
        jax.block_until_ready(st)
        wall = time.perf_counter() - t0
        ok = bool(np.array_equal(np.asarray(sl), np.asarray(bl)))
        tps = float(np.mean(np.asarray(emitted))) / max(int(steps), 1)
        print(
            f"  anchored draft={draft_len}: {wall*1000:.0f} ms, "
            f"{int(steps)} steps for mean "
            f"{float(np.mean(np.asarray(emitted))):.1f} tokens -> "
            f"{tps:.2f} tokens/step (batch-lockstep), identical={ok}, "
            f"speedup x{base_wall/wall:.2f}",
            flush=True,
        )

    for draft_len in (8, 12):
        row_tps = []
        for i in range(24):
            _, _, (steps, emitted) = generate_anchored(
                params, cfg, ids[i : i + 1], lengths[i : i + 1],
                sps[i : i + 1], spl[i : i + 1], max_new_tokens=max_new,
                eos_id=tok.eos_token_id, draft_len=draft_len,
                return_steps=True,
            )
            e = int(np.asarray(emitted)[0])
            if e:
                row_tps.append(e / int(steps))
        row_tps = np.asarray(row_tps)
        print(
            f"  per-row ANCHORED acceptance (draft={draft_len}): "
            f"mean {row_tps.mean():.2f} tokens/step, median "
            f"{np.median(row_tps):.2f}, min {row_tps.min():.2f}, "
            f"max {row_tps.max():.2f}",
            flush=True,
        )


def part_b():
    print("== B. flagship 1.1B mechanics (random weights, worst case) ==", flush=True)
    cfg = config_from_name("tiny-llama-1.1b-chat")
    params = gpt.init(cfg, jax.random.key(0))
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    prompt_len, max_new = 512, 150
    results = {}
    for batch in (1, 16):
        ids = rng.integers(1, cfg.vocab_size, size=(batch, prompt_len)).astype(
            np.int32
        )
        lengths = jnp.full((batch,), prompt_len, jnp.int32)
        ids = jnp.asarray(ids)

        tb, _ = generate(
            params, cfg, ids, lengths, max_new_tokens=max_new,
            temperature=0.2, top_k=1,
        )
        jax.block_until_ready(tb)
        t0 = time.perf_counter()
        tb, _ = generate(
            params, cfg, ids, lengths, max_new_tokens=max_new,
            temperature=0.2, top_k=1,
        )
        jax.block_until_ready(tb)
        base = time.perf_counter() - t0

        # prefill estimate: a 2-token generate is prefill + ~1 decode step
        tp, _ = generate(
            params, cfg, ids, lengths, max_new_tokens=2,
            temperature=0.2, top_k=1,
        )
        jax.block_until_ready(tp)
        t0 = time.perf_counter()
        tp, _ = generate(
            params, cfg, ids, lengths, max_new_tokens=2,
            temperature=0.2, top_k=1,
        )
        jax.block_until_ready(tp)
        pre2 = time.perf_counter() - t0  # prefill + ~2 decode steps
        decode_step_t = max((base - pre2) / (max_new - 2), 1e-9)
        prefill = max(pre2 - 2 * decode_step_t, 0.0)

        ts, _, (steps, emitted) = generate_lookup(
            params, cfg, ids, lengths, max_new_tokens=max_new,
            draft_len=8, return_steps=True,
        )
        jax.block_until_ready(ts)
        t0 = time.perf_counter()
        ts, _, (steps, emitted) = generate_lookup(
            params, cfg, ids, lengths, max_new_tokens=max_new,
            draft_len=8, return_steps=True,
        )
        jax.block_until_ready(ts)
        spec = time.perf_counter() - t0
        steps = int(steps)
        tps = float(np.mean(np.asarray(emitted))) / max(steps, 1)
        verify_step_t = max((spec - prefill) / max(steps, 1), 1e-9)
        results[batch] = (base, spec, steps, prefill, verify_step_t)
        print(
            f"  batch={batch}: greedy {base*1000:.0f} ms "
            f"({base/batch*1000:.0f} ms/utt, prefill ~{prefill*1000:.0f} ms) | "
            f"lookup worst-case {spec*1000:.0f} ms in {steps} steps "
            f"({tps:.2f} tok/step, {verify_step_t*1000:.1f} ms/verify-step)",
            flush=True,
        )

        # int8 weights + speculative compose: quantization halves the
        # weight-streaming bytes, speculation cuts the number of streams
        from dualhyp_tpu.ops.quant import quantize_tree

        qparams = quantize_tree(params)
        tq, _, (qsteps, qemitted) = generate_lookup(
            qparams, cfg, ids, lengths, max_new_tokens=max_new,
            draft_len=8, return_steps=True,
        )
        jax.block_until_ready(tq)
        t0 = time.perf_counter()
        tq, _, (qsteps, qemitted) = generate_lookup(
            qparams, cfg, ids, lengths, max_new_tokens=max_new,
            draft_len=8, return_steps=True,
        )
        jax.block_until_ready(tq)
        qspec = time.perf_counter() - t0
        print(
            f"  batch={batch}: int8 + lookup worst-case {qspec*1000:.0f} ms "
            f"in {int(qsteps)} steps "
            f"({qspec/max(int(qsteps),1)*1000:.1f} ms/verify-step)",
            flush=True,
        )
        del qparams
    return results


def part_c(b_results, tokens_per_step=3.0):
    print(f"== C. implied 1.1B p50 at {tokens_per_step:.1f} tokens/step ==", flush=True)
    max_new = 150
    for batch, (base, spec, steps, prefill, verify_step_t) in b_results.items():
        implied = prefill + (max_new / tokens_per_step) * verify_step_t
        print(
            f"  batch={batch}: {implied*1000:.0f} ms wall "
            f"({implied/batch*1000:.0f} ms/utt) vs greedy {base*1000:.0f} ms "
            f"-> x{base/implied:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    b = part_b()
    part_a()
    part_c(b)
