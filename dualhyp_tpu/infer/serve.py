"""Continuous-batching correction serving loop.

The batched evaluator (cli/inference_ger.run_inference) decodes in
lockstep: a batch's wall time is its SLOWEST sequence and finished rows
idle until the whole batch completes. This module keeps a fixed pool of
decode SLOTS: when a sequence finishes, its slot is refilled with the
next queued prompt while the other slots keep decoding. Each host round
runs `chunk_steps` speculative draft+verify iterations
(infer/decode.lookup_step) in one jitted call, so all live slots advance
by up to chunk_steps x (draft_len+1) tokens between host syncs — on a
tunneled TPU the sync is the expensive part, so the chunk returns ONE
packed (4, slots) status array and rows are gathered only for slots that
actually finished.

Per-request output budgets are supported (max_new per request); the
lockstep evaluator can only run a whole batch to a single cap.

Greedy-only and token-identical to `generate(..., top_k=1)` per request
(the eval protocol, ref: inference/ger.py:74-81). The reference has no
serving path at all: it decodes batch=1 token-by-token in python
(ref: inference/ger.py:67-94, generate/base.py:19-82).
"""

from __future__ import annotations

import time
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.config import GPTConfig
from dualhyp_tpu.infer.decode import anchored_step, lookup_step
from dualhyp_tpu.models import gpt

# refill-batch buckets: the prefill jit compiles once per bucket size
_REFILL_BUCKETS = (1, 2, 4, 8, 16, 32)


class ContinuousBatcher:
    """Fixed-slot continuous batching over the speculative decode state.

    params/cfg: a gpt.init-style tree (optionally int8-quantized).
    slots: decode pool width; max_new_tokens: default per-request budget
    (eval protocol 150); chunk_steps: verify iterations per host round.
    """

    def __init__(
        self,
        params,
        cfg: GPTConfig,
        *,
        slots: int = 16,
        max_new_tokens: int = 150,
        draft_len: int = 8,
        ngram: int = 3,
        chunk_steps: int = 16,
        eos_id: Optional[int] = None,
        compute_dtype=jnp.bfloat16,
        mesh=None,
        draft_source: str = "lookup",
        kv_quant: Optional[str] = None,
    ):
        """mesh: optional device mesh — params follow their
        NamedShardings (TP/FSDP for >single-chip models) and the slot
        pool shards over data x fsdp, so the decode chunk runs SPMD over
        every chip (the reference decodes batch=1 on one GPU,
        ref: inference/ger.py:67-94).

        draft_source: 'lookup' drafts from suffix n-grams over the whole
        buffer; 'anchored' follows each request's best-hypothesis span
        with a monotonic pointer (infer/decode.anchored_step, +39%
        tokens/step on the correction regime) and degrades per slot to
        suffix lookup when no span was submitted. Both are
        token-identical to greedy.

        kv_quant="int8": int8 slot-pool KV cache with folded-out scales
        (gpt.init_cache) — halves the decode chunk's cache stream at
        wide slot pools. Opt-in: outputs may shift within quantization
        rounding."""
        assert draft_source in ("lookup", "anchored"), draft_source
        self.anchored = draft_source == "anchored"
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.max_new = max_new_tokens
        self.draft_len = draft_len
        self.ngram = ngram
        self.chunk_steps = chunk_steps
        self.eos_id = eos_id
        self.dtype = compute_dtype
        self.kv_quant = kv_quant
        self.mesh = mesh
        self.prompt_budget = cfg.block_size - 1
        self.buf = cfg.block_size + draft_len + 1

        self._row_sharding = self._cache_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axes = tuple(
                a for a in ("data", "fsdp") if a in mesh.axis_names
            )
            extent = 1
            for a in axes:
                extent *= mesh.shape[a]
            extent = max(extent, 1)
            if slots % extent != 0:
                # round the pool up so the data x fsdp extent divides it
                # (an assert here broke default --slots on 3/6-device
                # meshes); extra slots just idle until the queue fills
                slots = -(-slots // extent) * extent
                self.slots = slots
            self._row_sharding = NamedSharding(mesh, P(axes))
            # cache leaves are (L, B, G, S, D): batch is axis 1
            self._cache_sharding = NamedSharding(mesh, P(None, axes))
            self._rep_sharding = NamedSharding(mesh, P())

        self._chunk_fn = self._build_chunk()
        self._refill_fns = {}

    def _place_state(self, state, budget):
        """Pin the slot pool to its mesh shardings (no-op single-device)."""
        if self._row_sharding is None:
            return state, budget
        tokens, lengths, emitted, cache, done, last, steps = state[:7]
        row = self._row_sharding
        put = jax.device_put
        placed = (
            put(tokens, row), put(lengths, row), put(emitted, row),
            {k: put(v, self._cache_sharding) for k, v in cache.items()},
            put(done, row), put(last, row), put(steps, self._rep_sharding),
        )
        placed = placed + tuple(put(x, row) for x in state[7:])
        return placed, put(budget, row)

    # ---- jitted pieces ----
    def _build_chunk(self):
        cfg, dtype = self.cfg, self.dtype
        draft_len, ngram, eos = self.draft_len, self.ngram, self.eos_id
        chunk_steps = self.chunk_steps

        anchored = self.anchored

        def run(params, state, budget):
            def body(st, _):
                if anchored:
                    # per-slot hypothesis spans ride the state so refill
                    # can scatter them; the step itself treats them as
                    # read-only (a zero span degrades to suffix lookup)
                    core, ss, sl = st[:8], st[8], st[9]
                    new = anchored_step(
                        params, cfg, core, ss, sl, draft_len=draft_len,
                        ngram=ngram, eos_id=eos, max_new_tokens=budget,
                        compute_dtype=dtype,
                    )
                    return new + (ss, sl), None
                return lookup_step(
                    params, cfg, st, draft_len=draft_len, ngram=ngram,
                    eos_id=eos, max_new_tokens=budget, compute_dtype=dtype,
                ), None

            state, _ = jax.lax.scan(body, state, None, length=chunk_steps)
            tokens, lengths, emitted, cache, done, last, steps = state[:7]
            # one packed host transfer per chunk
            status = jnp.stack(
                [lengths, emitted, done.astype(jnp.int32), budget]
            )
            return state, status

        return jax.jit(run, donate_argnums=(1,))

    def _refill_fn(self, r: int, t: int):
        """Jitted prefill of r new prompts scattered into their slots.
        slot id >= slots marks a padded row (dropped by the scatter)."""
        key = (r, t)
        if key in self._refill_fns:
            return self._refill_fns[key]
        cfg, dtype, buf = self.cfg, self.dtype, self.buf
        kv_quant = self.kv_quant
        eos = self.eos_id

        anchored = self.anchored

        def refill(params, state, budget, slot_ids, pids, plens, new_budget,
                   span_start, span_len):
            tokens, lengths, emitted, cache, done, last, steps = state[:7]
            small = gpt.init_cache(cfg, r, buf, dtype=dtype,
                                   quantize=kv_quant)
            logits, small = gpt.prefill(
                params, cfg, pids, plens, small, compute_dtype=dtype
            )
            first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            fdone = (
                jnp.zeros((r,), bool) if eos is None else (first == eos)
            )
            rows = jnp.zeros((r, buf), jnp.int32)
            rows = jax.lax.dynamic_update_slice(rows, pids, (0, 0))
            rows = jax.vmap(
                lambda row, v, p: jax.lax.dynamic_update_slice(
                    row, v[None], (p,)
                )
            )(rows, jnp.where(fdone, 0, first), plens)
            rlen = plens + jnp.where(fdone, 0, 1)
            remit = jnp.where(fdone, 0, 1)

            # mode='drop' ignores padded rows (slot id out of range)
            tokens = tokens.at[slot_ids].set(rows, mode="drop")
            lengths = lengths.at[slot_ids].set(rlen, mode="drop")
            emitted = emitted.at[slot_ids].set(remit, mode="drop")
            done = done.at[slot_ids].set(fdone, mode="drop")
            last = last.at[slot_ids].set(first, mode="drop")
            budget = budget.at[slot_ids].set(new_budget, mode="drop")
            cache = {
                k: v.at[:, slot_ids].set(small[k], mode="drop")
                for k, v in cache.items()
            }
            new = (tokens, lengths, emitted, cache, done, last, steps)
            if anchored:
                ptr, ss, sl = state[7], state[8], state[9]
                ptr = ptr.at[slot_ids].set(0, mode="drop")
                ss = ss.at[slot_ids].set(span_start, mode="drop")
                sl = sl.at[slot_ids].set(span_len, mode="drop")
                new = new + (ptr, ss, sl)
            return new, budget

        fn = jax.jit(refill, donate_argnums=(1, 2))
        self._refill_fns[key] = fn
        return fn

    # ---- host driver ----
    def _empty_state(self):
        s, buf = self.slots, self.buf
        cache = gpt.init_cache(self.cfg, s, buf, dtype=self.dtype,
                               quantize=self.kv_quant)
        state = (
            jnp.zeros((s, buf), jnp.int32),
            jnp.ones((s,), jnp.int32),
            jnp.zeros((s,), jnp.int32),
            cache,
            jnp.ones((s,), bool),  # inactive
            jnp.zeros((s,), jnp.int32),
            jnp.int32(0),
        )
        if self.anchored:
            state = state + (
                jnp.zeros((s,), jnp.int32),  # span pointer
                jnp.zeros((s,), jnp.int32),  # span_start
                jnp.zeros((s,), jnp.int32),  # span_len
            )
        budget = jnp.zeros((s,), jnp.int32)
        return state, budget

    # ---- incremental (live-serving) API ----
    def start(self) -> None:
        """Initialise the slot pool for incremental submit()/poll()."""
        self._state, self._budget = self._place_state(*self._empty_state())
        # (id, prompt_len, t_submit, t_enter): t_submit is submit() time,
        # t_enter is slot-entry time — latency_s covers queue wait too
        self._slot_req = [None] * self.slots
        self._queue: List[tuple] = []
        self._buckets = sorted(
            {b for b in _REFILL_BUCKETS if b < self.slots} | {self.slots}
        )
        self._refill()

    def submit(self, rid, prompt, max_new: Optional[int] = None,
               hypothesis: Optional[Sequence[int]] = None) -> None:
        """Enqueue one request; it enters a slot at the next poll().

        hypothesis (anchored draft_source only): the request's best
        hypothesis token ids — its span inside the prompt anchors the
        drafting pointer (ref: the GER protocol packs it verbatim,
        data/prompts.py). Absent or not found, the slot degrades to
        suffix lookup.

        Raises on invalid requests instead of silently degrading: a
        prompt that cannot fit the model context, or a non-positive
        output budget."""
        prompt = list(prompt)
        cap = self.max_new if max_new is None else int(max_new)
        if cap <= 0:
            raise ValueError(f"max_new must be positive, got {cap}")
        if len(prompt) + 1 > self.cfg.block_size:
            raise ValueError(
                f"prompt of {len(prompt)} tokens exceeds block_size "
                f"{self.cfg.block_size}; truncate before submitting"
            )
        span = (0, 0)
        if self.anchored and hypothesis is not None:
            from dualhyp_tpu.infer.decode import find_subsequence_span

            span = find_subsequence_span(prompt, list(hypothesis))
        self._queue.append((rid, prompt, cap, time.perf_counter(), span))

    @property
    def pending(self) -> int:
        return len(self._queue) + sum(
            1 for s in self._slot_req if s is not None
        )

    def _refill(self) -> None:
        free = [i for i in range(self.slots) if self._slot_req[i] is None]
        if not free or not self._queue:
            return
        todo = []
        now = time.perf_counter()
        while free and self._queue and len(todo) < self._buckets[-1]:
            rid, prompt, cap, t_sub, span = self._queue.pop(0)
            cap = max(min(cap, self.cfg.block_size - len(prompt)), 1)
            slot = free.pop()
            self._slot_req[slot] = (rid, len(prompt), t_sub, now)
            todo.append((slot, prompt, cap, span))
        r = next(b for b in self._buckets if b >= len(todo))
        t_max = max(len(p) for _, p, _, _ in todo)
        # pad T to a small set of buckets to bound compile count
        t_pad = 64
        while t_pad < t_max:
            t_pad *= 2
        t_pad = min(t_pad, self.prompt_budget)
        pids = np.zeros((r, t_pad), np.int32)
        plens = np.ones((r,), np.int32)
        caps = np.ones((r,), np.int32)
        slot_ids = np.full((r,), self.slots, np.int32)  # dropped
        span_start = np.zeros((r,), np.int32)
        span_len = np.zeros((r,), np.int32)
        for row, (slot, prompt, cap, span) in enumerate(todo):
            pids[row, : len(prompt)] = prompt
            plens[row] = len(prompt)
            caps[row] = cap
            slot_ids[row] = slot
            span_start[row], span_len[row] = span
        fn = self._refill_fn(r, t_pad)
        self._state, self._budget = fn(
            self.params, self._state, self._budget, jnp.asarray(slot_ids),
            jnp.asarray(pids), jnp.asarray(plens), jnp.asarray(caps),
            jnp.asarray(span_start), jnp.asarray(span_len),
        )

    def poll(self) -> List[dict]:
        """Admit queued requests, run one chunk of decoding, and return
        the newly completed records ({id, tokens, prompt_len, latency_s};
        tokens include the prompt, EOS excluded). Returns [] when idle."""
        self._refill()
        if all(s is None for s in self._slot_req):
            return []
        self._state, status = self._chunk_fn(
            self.params, self._state, self._budget
        )
        h_lengths, h_emitted, h_done, h_budget = np.asarray(status)
        now = time.perf_counter()
        finished = [
            i for i in range(self.slots)
            if self._slot_req[i] is not None
            and (h_done[i] or h_emitted[i] >= h_budget[i])
        ]
        results: List[dict] = []
        if finished:
            rows = np.asarray(self._state[0][jnp.asarray(finished)])
            for row, slot in enumerate(finished):
                rid, plen, t_sub, t_enter = self._slot_req[slot]
                n = int(h_lengths[slot])
                results.append(
                    {
                        "id": rid,
                        "tokens": rows[row, :n].tolist(),
                        "prompt_len": plen,
                        # end-to-end: submit() -> completion (incl. queue)
                        "latency_s": now - t_sub,
                        "queue_s": t_enter - t_sub,
                        "decode_s": now - t_enter,
                    }
                )
                self._slot_req[slot] = None
        self._refill()
        return results

    def serve(self, requests: Iterable[Sequence]) -> List[dict]:
        """requests: iterable of (request_id, prompt token ids),
        (request_id, prompt, max_new), or (request_id, prompt, max_new,
        hypothesis token ids — anchors the draft pointer under
        draft_source='anchored'). Returns one record per request in
        COMPLETION order: {id, tokens, prompt_len, latency_s}. tokens
        include the prompt, EOS excluded (generate semantics)."""
        self.start()
        for req in requests:
            self.submit(req[0], req[1], req[2] if len(req) > 2 else None,
                        req[3] if len(req) > 3 else None)
        results: List[dict] = []
        while self.pending:
            results.extend(self.poll())
        return results
