"""Continuous-batching server: per-request outputs must be token-identical
to greedy generate(), with slot refill exercised (more requests than
slots, ragged prompt lengths, EOS stops)."""

import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.infer.decode import generate
from dualhyp_tpu.infer.serve import ContinuousBatcher
from dualhyp_tpu.models import gpt
from tests import helpers


def _reference_outputs(params, cfg, prompts, max_new, eos_id):
    outs = {}
    for rid, prompt in prompts:
        ids = np.asarray([prompt], np.int32)
        tok, ln = generate(
            params, cfg, jnp.asarray(ids),
            jnp.asarray([len(prompt)], jnp.int32),
            max_new_tokens=max_new, temperature=0.2, top_k=1,
            eos_id=eos_id, compute_dtype=jnp.float32,
        )
        outs[rid] = list(np.asarray(tok)[0][: int(ln[0])])
    return outs


def test_serve_matches_generate_with_refill():
    cfg = helpers.tiny_llama_config()
    params = gpt.init(cfg, jax.random.key(3))
    rng = np.random.default_rng(0)

    max_new = 8
    # an EOS the model emits for at least one prompt (first greedy token)
    probe = [5, 11, 2, 9, 4]
    tok, ln = generate(
        params, cfg, jnp.asarray([probe], jnp.int32),
        jnp.asarray([len(probe)], jnp.int32), max_new_tokens=1,
        temperature=0.2, top_k=1, compute_dtype=jnp.float32,
    )
    eos = int(np.asarray(tok)[0, len(probe)])

    requests = [("probe", probe)]
    for i in range(9):  # 10 requests > 3 slots, ragged lengths
        n = int(rng.integers(3, 12))
        requests.append(
            (f"r{i}", rng.integers(1, cfg.vocab_size, n).tolist())
        )

    want = _reference_outputs(params, cfg, requests, max_new, eos)

    batcher = ContinuousBatcher(
        params, cfg, slots=3, max_new_tokens=max_new, draft_len=4,
        chunk_steps=2, eos_id=eos, compute_dtype=jnp.float32,
    )
    records = batcher.serve(requests)

    assert len(records) == len(requests)
    assert {r["id"] for r in records} == {rid for rid, _ in requests}
    for rec in records:
        assert rec["tokens"] == want[rec["id"]], rec["id"]
        assert rec["latency_s"] > 0


def test_serve_sharded_matches_single_device():
    """ContinuousBatcher over a data x fsdp x tensor mesh must produce
    token-identical records to the single-device batcher (sharded slot
    pool + sharded params; lifts the 'continuous is single-device'
    round-2 limitation)."""
    from dualhyp_tpu.parallel import make_mesh, shard_params

    cfg = helpers.tiny_llama_config()
    params = gpt.init(cfg, jax.random.key(3))
    rng = np.random.default_rng(2)

    max_new = 6
    requests = []
    for i in range(10):
        n = int(rng.integers(3, 12))
        requests.append((f"r{i}", rng.integers(1, cfg.vocab_size, n).tolist()))

    plain = ContinuousBatcher(
        params, cfg, slots=4, max_new_tokens=max_new, draft_len=3,
        chunk_steps=2, compute_dtype=jnp.float32,
    ).serve(requests)
    want = {r["id"]: r["tokens"] for r in plain}

    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    sharded_params, _ = shard_params(
        jax.tree_util.tree_map(jnp.copy, params), mesh
    )
    batcher = ContinuousBatcher(
        sharded_params, cfg, slots=4, max_new_tokens=max_new, draft_len=3,
        chunk_steps=2, compute_dtype=jnp.float32, mesh=mesh,
    )
    records = batcher.serve(requests)
    assert len(records) == len(requests)
    for rec in records:
        assert rec["tokens"] == want[rec["id"]], rec["id"]


def test_serve_per_request_budgets():
    """Per-request max_new budgets: each request's output equals a greedy
    generate() run with that budget (the lockstep path can only cap a
    whole batch at one value)."""
    cfg = helpers.tiny_llama_config()
    params = gpt.init(cfg, jax.random.key(5))
    rng = np.random.default_rng(1)

    requests = []
    caps = {}
    for i in range(6):
        n = int(rng.integers(4, 10))
        cap = int(rng.integers(1, 9))
        rid = f"r{i}"
        requests.append((rid, rng.integers(1, cfg.vocab_size, n).tolist(), cap))
        caps[rid] = cap

    want = {}
    for rid, prompt, cap in requests:
        tok, ln = generate(
            params, cfg, jnp.asarray([prompt], jnp.int32),
            jnp.asarray([len(prompt)], jnp.int32), max_new_tokens=cap,
            temperature=0.2, top_k=1, compute_dtype=jnp.float32,
        )
        want[rid] = list(np.asarray(tok)[0][: int(ln[0])])

    batcher = ContinuousBatcher(
        params, cfg, slots=2, max_new_tokens=150, draft_len=3,
        chunk_steps=2, compute_dtype=jnp.float32,
    )
    records = batcher.serve(requests)
    assert len(records) == len(requests)
    for rec in records:
        assert rec["tokens"] == want[rec["id"]], rec["id"]
        assert len(rec["tokens"]) - rec["prompt_len"] <= caps[rec["id"]]


def test_serve_anchored_matches_generate():
    """draft_source='anchored': outputs stay token-identical to greedy
    generate() whether or not a hypothesis span is submitted (the span
    only changes draft acceptance, never the emitted tokens)."""
    cfg = helpers.tiny_llama_config()
    params = gpt.init(cfg, jax.random.key(7))
    rng = np.random.default_rng(4)

    max_new = 8
    requests = []
    for i in range(8):  # > slots: refill paths scatter spans too
        n = int(rng.integers(6, 14))
        prompt = rng.integers(1, cfg.vocab_size, n).tolist()
        # half the requests carry a "hypothesis" = a mid-prompt span
        # (present verbatim, like the GER prompt packing); half none
        hyp = prompt[2 : 2 + n // 2] if i % 2 == 0 else None
        requests.append((f"r{i}", prompt, max_new, hyp))

    want = _reference_outputs(
        params, cfg, [(r, p) for r, p, _, _ in requests], max_new, None
    )

    batcher = ContinuousBatcher(
        params, cfg, slots=3, max_new_tokens=max_new, draft_len=4,
        chunk_steps=2, compute_dtype=jnp.float32, draft_source="anchored",
    )
    records = batcher.serve(requests)
    assert len(records) == len(requests)
    for rec in records:
        assert rec["tokens"] == want[rec["id"]], rec["id"]


def test_serve_int8_kv_matches_generate_int8():
    """kv_quant="int8" on the slot pool: per-request outputs are
    token-identical to generate(kv_quant="int8") — the chunked
    verify-step writes quantize each token's K/V row independently, so
    slot scatter/refill and the speculative chunks read the same cache
    bytes the lockstep path writes."""
    cfg = helpers.tiny_llama_config()
    params = gpt.init(cfg, jax.random.key(5))
    rng = np.random.default_rng(1)
    max_new = 8

    requests = []
    for i in range(7):  # > 3 slots: refill exercised
        n = int(rng.integers(3, 12))
        requests.append(
            (f"r{i}", rng.integers(1, cfg.vocab_size, n).tolist())
        )

    want = {}
    for rid, prompt in requests:
        tok, ln = generate(
            params, cfg, jnp.asarray([prompt], jnp.int32),
            jnp.asarray([len(prompt)], jnp.int32),
            max_new_tokens=max_new, temperature=0.2, top_k=1,
            compute_dtype=jnp.float32, kv_quant="int8",
        )
        want[rid] = list(np.asarray(tok)[0][: int(ln[0])])

    batcher = ContinuousBatcher(
        params, cfg, slots=3, max_new_tokens=max_new, draft_len=4,
        chunk_steps=2, compute_dtype=jnp.float32, kv_quant="int8",
    )
    records = batcher.serve(requests)
    assert len(records) == len(requests)
    for rec in records:
        assert rec["tokens"] == want[rec["id"]], rec["id"]
