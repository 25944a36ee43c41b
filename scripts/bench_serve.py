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


if __name__ == "__main__":
    main()
