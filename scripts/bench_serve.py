"""Continuous-batching vs lockstep serving benchmark (real TPU).

Workload: 64 requests at the flagship 1.1B shape, ragged prompts
(320-512 tokens) and per-request output budgets drawn from a
caption-like long-tail distribution (most corrections are 10-40 tokens,
some run to the 150 cap — the straggler regime continuous batching
exists for). Reports total wall, throughput, and per-request p50/p90
latency for:

  A. lockstep batched greedy (`generate`, the run_inference scheduler) —
     each batch runs to the max budget among its members (its best case)
  B. continuous batching + speculative decoding (infer/serve.py) with
     per-request budgets
  C. POISSON ARRIVALS (round 4, unsaturated): requests arrive at
     `--rate` req/s in real time; continuous batching admits each on
     the next poll, the lockstep comparator dynamically batches
     whatever queued while the previous batch decoded. End-to-end
     p50/p90 measured, not extrapolated.
  D. correction-corpus serve acceptance (round 4): a trained synthetic
     GER model served through ContinuousBatcher with
     draft_source=lookup vs anchored at chunk_steps=1, so per-request
     tokens/step is exact (finish poll - enter poll).

Run: python scripts/bench_serve.py [--rate 3.0] [--skip a b]
"""

import sys
import time

from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")

import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.infer.decode import generate
from dualhyp_tpu.infer.serve import ContinuousBatcher
from dualhyp_tpu.models import gpt
from dualhyp_tpu.registry import config_from_name

N_REQ, SLOTS, MAX_NEW = 64, 16, 150
rate = 3.0  # part C default; overridden by --rate


def main():
    cfg = config_from_name("tiny-llama-1.1b-chat")
    params = gpt.init(cfg, jax.random.key(0))
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)

    # caption-like long-tail output budgets: p50 ~25 tokens, some at cap
    budgets = np.minimum(
        np.maximum(rng.lognormal(3.2, 0.7, N_REQ).astype(int), 5), MAX_NEW
    )
    prompts = []
    for i in range(N_REQ):
        n = int(rng.integers(320, 513))
        prompts.append(
            (i, rng.integers(1, cfg.vocab_size, n).tolist(), int(budgets[i]))
        )
    print(
        f"output budgets: p50 {int(np.percentile(budgets,50))}, "
        f"mean {budgets.mean():.0f}, max {budgets.max()}"
    )

    # ---- A. lockstep batches of SLOTS (runs to the batch max budget) ----
    def lockstep():
        lat = []
        t_all = time.perf_counter()
        for start in range(0, N_REQ, SLOTS):
            chunk = prompts[start : start + SLOTS]
            t_max = max(len(p) for _, p, _ in chunk)
            cap = max(b for _, _, b in chunk)
            cap = int(np.ceil(cap / 25) * 25)  # bucket caps: few compiles
            ids = np.zeros((SLOTS, t_max), np.int32)
            lens = np.zeros((SLOTS,), np.int32)
            for i, (_, p, _) in enumerate(chunk):
                ids[i, : len(p)] = p
                lens[i] = len(p)
            t0 = time.perf_counter()
            toks, tls = generate(
                params, cfg, jnp.asarray(ids), jnp.asarray(lens),
                max_new_tokens=cap, temperature=0.2, top_k=1,
            )
            jax.block_until_ready(toks)
            now = time.perf_counter()
            # end-to-end latency: all requests arrive at t_all, so a
            # request completes when ITS batch does (incl. earlier
            # batches) — same submit->done accounting the continuous
            # batcher reports
            lat.extend([now - t_all] * len(chunk))
            dec.extend([now - t0] * len(chunk))
        return time.perf_counter() - t_all, lat, dec

    dec = []
    wall, lat, dec = lockstep()  # compile warmup
    dec = []
    wall, lat, dec = lockstep()
    print(
        f"A. lockstep batch={SLOTS} (batch cap = max member budget): "
        f"{wall:.2f}s total, {N_REQ/wall:.2f} utt/s, end-to-end p50 "
        f"{np.percentile(lat,50)*1e3:.0f} ms p90 "
        f"{np.percentile(lat,90)*1e3:.0f} ms, decode-only p50 "
        f"{np.percentile(dec,50)*1e3:.0f} ms"
    )

    # ---- B. continuous batching + speculation, per-request budgets ----
    batcher = ContinuousBatcher(
        params, cfg, slots=SLOTS, max_new_tokens=MAX_NEW, draft_len=8,
        chunk_steps=16,
    )
    recs = batcher.serve(prompts)  # compile warmup
    t0 = time.perf_counter()
    recs = batcher.serve(prompts)
    wall_c = time.perf_counter() - t0
    lat_c = [r["latency_s"] for r in recs]
    dec_c = [r["decode_s"] for r in recs]
    print(
        f"B. continuous slots={SLOTS} draft=8 chunk=16: {wall_c:.2f}s "
        f"total, {N_REQ/wall_c:.2f} utt/s, end-to-end p50 "
        f"{np.percentile(lat_c,50)*1e3:.0f} ms p90 "
        f"{np.percentile(lat_c,90)*1e3:.0f} ms, in-slot decode p50 "
        f"{np.percentile(dec_c,50)*1e3:.0f} ms | x{wall/wall_c:.2f} throughput"
    )

    part_c_arrivals(params, cfg, prompts, batcher, rate=rate)


def part_c_arrivals(params, cfg, prompts, batcher, *, rate):
    """Poisson arrivals in REAL TIME at `rate` req/s: the continuous
    batcher polls continuously and admits arrivals as slots free;
    the lockstep comparator dynamically batches whatever queued while
    the previous batch decoded (the best a batch scheduler can do
    under an arrival process)."""
    rng = np.random.default_rng(7)
    # exponential interarrivals; both schedulers replay the SAME trace
    gaps = rng.exponential(1.0 / rate, N_REQ)
    arrive = np.cumsum(gaps)

    def lockstep_dynamic():
        lat = []
        t_start = time.perf_counter()
        next_i = 0
        pending = []
        while next_i < N_REQ or pending:
            now = time.perf_counter() - t_start
            while next_i < N_REQ and arrive[next_i] <= now:
                pending.append(next_i)
                next_i += 1
            if not pending:
                time.sleep(min(arrive[next_i] - now, 0.01))
                continue
            chunk_idx = pending[:SLOTS]
            pending = pending[len(chunk_idx):]
            chunk = [prompts[i] for i in chunk_idx]
            real = len(chunk)
            while len(chunk) < SLOTS:
                chunk.append(chunk[-1])
            t_max = 512  # fixed width: dynamic group composition must
            # not trigger fresh compiles mid-measurement
            cap = max(b for _, _, b in chunk)
            cap = int(np.ceil(cap / 25) * 25)
            ids = np.zeros((SLOTS, t_max), np.int32)
            lens = np.zeros((SLOTS,), np.int32)
            for i, (_, p, _) in enumerate(chunk):
                ids[i, : len(p)] = p
                lens[i] = len(p)
            toks, _ = generate(
                params, cfg, jnp.asarray(ids), jnp.asarray(lens),
                max_new_tokens=cap, temperature=0.2, top_k=1,
            )
            jax.block_until_ready(toks)
            done_t = time.perf_counter() - t_start
            lat.extend(done_t - arrive[i] for i in chunk_idx[:real])
        return lat

    def continuous_arrivals():
        batcher.start()
        lat = {}
        t_start = time.perf_counter()
        next_i = 0
        while next_i < N_REQ or batcher.pending:
            now = time.perf_counter() - t_start
            while next_i < N_REQ and arrive[next_i] <= now:
                rid, p, cap = prompts[next_i]
                batcher.submit(rid, p, cap)
                # latency vs the TRACE arrival time, same as lockstep
                batcher._queue[-1] = batcher._queue[-1][:3] + (
                    t_start + arrive[next_i],
                ) + batcher._queue[-1][4:]
                next_i += 1
            if not batcher.pending:
                time.sleep(min(arrive[next_i] - now, 0.01))
                continue
            for rec in batcher.poll():
                lat[rec["id"]] = rec["latency_s"]
        return list(lat.values())

    for name, fn in (("lockstep-dynamic", lockstep_dynamic),
                     ("continuous", continuous_arrivals)):
        lat = fn()  # warmup replay (compiles already cached from A/B)
        lat = fn()
        print(
            f"C. poisson {rate:.1f} req/s {name}: end-to-end p50 "
            f"{np.percentile(lat,50)*1e3:.0f} ms p90 "
            f"{np.percentile(lat,90)*1e3:.0f} ms max "
            f"{np.max(lat)*1e3:.0f} ms ({len(lat)} reqs)"
        )


def part_d_acceptance():
    """Serve-level speculative acceptance on the correction corpus:
    trained synthetic GER model through ContinuousBatcher at
    chunk_steps=1 (one verify iteration per poll), so each request's
    tokens/step = emitted / (finish_poll - enter_poll) exactly."""
    import tempfile

    sys.path.insert(0, str(Path(__file__).parent))

    from dualhyp_tpu.config import GPTConfig
    from dualhyp_tpu.data import collate, hypotheses, synthetic
    from dualhyp_tpu.train import TrainConfig, Trainer
    from bench_spec_decode import make_tokenizer

    print("== D. correction-corpus serve acceptance ==", flush=True)
    tok, vocab_size = make_tokenizer()
    tmp = Path(tempfile.mkdtemp())
    synthetic.write_json(
        tmp / "train.json",
        synthetic.make_records(n_uids=64, variants_per_uid=1, seed=1),
    )
    cfg = GPTConfig(
        name="servebench", block_size=768, vocab_size=vocab_size,
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
    key = jax.random.key(7)
    for epoch in range(80):
        for batch in collate.epoch_batches(
            ds, 16, shuffle=True, seed=0, epoch=epoch, buckets=(512,)
        ):
            key, k = jax.random.split(key)
            loss, _ = trainer.train_step(
                batch, max_iters=2000, warmup_steps=20, rng=k
            )
    print(f"  trained: final loss {float(loss):.4f}", flush=True)
    params = trainer.params

    examples = [ds[i] for i in range(len(ds))]
    requests = []
    for i, ex in enumerate(examples):
        best = ex.records[0]["nhyps_asr"]["hyps"][0]
        requests.append(
            (i, list(ex.input_ids_no_response), 24, tok.encode(best))
        )

    for source in ("lookup", "anchored"):
        b = ContinuousBatcher(
            params, cfg, slots=16, max_new_tokens=24, draft_len=8,
            chunk_steps=1, eos_id=tok.eos_token_id,
            draft_source=source,
        )
        b.serve(requests)  # warm compiles
        b.start()
        for req in requests:
            b.submit(*req)
        enter_poll, finish = {}, {}
        n_poll = 0
        t0 = time.perf_counter()
        # record the poll at which each request entered its slot
        while b.pending:
            before = {s[0] for s in b._slot_req if s is not None}
            recs = b.poll()
            n_poll += 1
            after = {s[0] for s in b._slot_req if s is not None}
            for rid in after - before:
                enter_poll.setdefault(rid, n_poll - 1)
            for rec in recs:
                enter_poll.setdefault(rec["id"], n_poll - 1)
                finish[rec["id"]] = (
                    n_poll, len(rec["tokens"]) - rec["prompt_len"]
                )
        wall = time.perf_counter() - t0
        tps = [
            emitted / max(n_poll_f - enter_poll[rid], 1)
            for rid, (n_poll_f, emitted) in finish.items()
        ]
        tps = np.asarray(tps)
        print(
            f"  serve draft={source}: {wall:.2f}s, tokens/step p50 "
            f"{np.percentile(tps,50):.2f} mean {tps.mean():.2f} "
            f"max {tps.max():.2f} ({len(tps)} reqs, {n_poll} polls)"
        )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=3.0,
                    help="poisson arrival rate, req/s (part C)")
    ap.add_argument("--only", choices=["ab", "c", "d"], default=None,
                    help="run one section (d needs no 1.1B weights)")
    cli = ap.parse_args()
    rate = cli.rate
    if cli.only == "d":
        part_d_acceptance()
    else:
        main()
        if cli.only != "ab":
            part_d_acceptance()
