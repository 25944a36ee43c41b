"""Device-side Whisper beam search with chunked host sync.

Round 1 kept the whole beam on host (python prefill, cache pulled to host
to reorder rows). Round 2 moved the per-step compute on device but still
crossed (beam, beam+1) candidate scalars to host EVERY token — through
the tunneled TPU that round-trip (~30-60 ms) dominated the ~110 ms/step.
Round 4 applies the recipe that took the VSR joint beam from 2.8 s to
126 ms/utt (infer/joint_device_beam.py): the BeamSearchDecoder update
rule itself — candidate ranking, eos retirement, beam refill
(ref: data/whisper/decoding.py:338-441) — runs ON DEVICE inside a
bounded while loop over `chunk_steps` tokens (with an all-utterances-
done early exit), and the host syncs once per chunk, replaying the
identical deterministic rule over the returned (n_steps, 3, U, 2*beam)
scalar pack to rebuild token lists. chunk_steps defaults adaptively:
16 for multi-utterance groups (host replay of chunk N pipelines behind
the device running chunk N+1; chunk 35 at U=8 measured 185 vs 172
ms/utt), the whole token budget at U=1 (replay is cheap there and the
~30 ms tunnel syncs dominate: 8.1 vs 9.2 ms/step measured; the early
exit means oversized chunks waste no post-finish device steps). Multi-utterance chunks keep the fixed-trip lax.scan — a data-dependent while cond serializes iteration dispatch (measured 43.1 vs 40.5 ms/step at U=8).

Per scan step, everything stays on device: one-hot ancestor selection ->
cached decoder step -> logit rules (blank / suppress / timestamp) ->
log_softmax -> per-row top(beam+1) -> per-utterance top(2*beam) ->
eos-retire/refill selection -> state scatter. The timestamp rules
(ref: decoding.py:482-547) need three per-row scalars that are
data-dependent on token history; they are carried ON DEVICE as O(1)
state (last/penultimate was-timestamp, last emitted timestamp) updated
incrementally at each selection instead of recomputed on host.

The self-attention KV cache never leaves HBM, stores at the decoder
params' dtype (bf16 in production; f32 under tests so parity stays
exact), and is donated through the jit. The cache is APPEND-ONLY
(round 4e): rows never move; each step writes one (L, R, n_state) K/V
column, and an (R, T) ancestor map — the only thing the selection
re-parents — selects each row's history inside decode_step_cached via
a grouped one-hot MXU einsum. The earlier protocols permuted the full
cache every step (eagerly in round 2; deferred into the step's
read+rewrite in round 4c); the profiler showed that gather+rewrite+
un-aliased carry copies at ~75% of the 62.9 ms step while the decoder
GEMMs were 3 ms (scripts/profile_whisper_beam.py). Prefill runs at one
row per utterance — the ancestor map's zeros point every row's prefix
columns at its group's row 0.

Token-for-token parity with `beam_search_nbest` + the vendored
DecodingTask is asserted in tests/test_whisper_decoding_rules.py.
"""

from __future__ import annotations

import os
from functools import partial
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.infer.beam_search import (
    BeamHypothesis, TimestampRules, cons_to_list,
)

_NEG = jnp.float32(-jnp.inf)


def _layer_unroll() -> int:
    """Decoder layer-scan unroll factor (DUALHYP_WHISPER_LAYER_UNROLL,
    default 1 = rolled). Full unroll (32) was MEASURED SLOWER at
    large-v3 beam 50 x 8 utterances: 50.5 vs 40.7 ms/step. The rolled
    scan's per-layer slice materialisation of the cross/self KV stacks
    (the ~2.9 ms/step `constant_dynamic-slice_fusion`s in the profile)
    is not waste — it double-buffers layer i+1's KV stream behind layer
    i's compute, which statically-sliced unrolled dots do not replicate.
    Matches the earlier python-loop negative (408 vs 293 ms/utt, see
    decode_step_cached docstring) from the pre-append-only-cache era."""
    return int(os.environ.get("DUALHYP_WHISPER_LAYER_UNROLL", "1"))


def _sel_mode() -> str:
    """Ancestor-selection formulation (DUALHYP_BEAM_SEL):
    - `flat` (default): one block-diagonal (B, B, T) one-hot over all
      rows — zero relayout copies, selection MACs quadratic in total
      rows (fine at U<=8 x beam 50; 95.6 vs 116.5 ms/utt vs grouped).
    - `grouped`: the (U, R, R, T) per-utterance einsum — linear MACs,
      but the (u, beam) row split breaks the cache slice's (8, 128)
      tiling whenever beam % 8 != 0 (relayout copies, ~6 ms/step).
    - `flat16`: flat with the selection run as a bf16 MXU matmul even
      over an int8 cache (values exact in bf16). MEASURED WORSE than
      int8 flat (102.9 vs 91.9 ms/utt at U=8): the doubled selection
      output/convert bytes outweigh the int8 emitter's inefficiency.
    - `padded`: grouped with the rows per group PADDED to a sublane
      multiple (50 -> 56): linear MACs and (in theory) clean tiling, at
      +12% rows through the GEMMs. MEASURED WORSE than both (124.0 vs
      flat 91.9 / grouped 116.5 ms/utt at U=8 int8): the row padding
      did not buy the expected relayout-free lowering and the extra
      rows tax every GEMM. Kept selectable for future hardware.
    All three are token-identical (decoding-rules parity suite)."""
    return os.environ.get("DUALHYP_BEAM_SEL", "flat")


def _sel_flat() -> bool:
    return _sel_mode() == "flat"


def _row_top_k(x, k, chunk=128):
    """Exact top-k over a wide vocab via chunk-max prefiltering: the
    true top-k lie in at most k chunks (every top-k element is >= the
    k-th value, so its chunk max is too), ranked by chunk max with
    XLA's lowest-index-first tie order — 2.0x over one lax.top_k at
    (400, 51866) (scripts/bench_beam_ops.py, verified element-exact
    there). Equal to lax.top_k except under exact f32 score ties
    straddling the k-th-value boundary ACROSS chunks — measure-zero for
    softmax outputs (and torch.topk resolves such ties arbitrarily in
    the reference too)."""
    r, v = x.shape
    if v <= 4 * k * chunk // 3:
        return jax.lax.top_k(x, k)
    vp = -(-v // chunk) * chunk
    xp = x
    if vp != v:
        xp = jnp.pad(x, ((0, 0), (0, vp - v)), constant_values=-jnp.inf)
    xp = xp.reshape(r, vp // chunk, chunk)
    _, cidx = jax.lax.top_k(xp.max(-1), k)  # (R, k) candidate chunks
    g = jnp.take_along_axis(xp, cidx[:, :, None], axis=1)
    vals, flat = jax.lax.top_k(g.reshape(r, k * chunk), k)
    sel_chunk = jnp.take_along_axis(cidx, flat // chunk, axis=1)
    return vals, sel_chunk * chunk + flat % chunk


@partial(
    jax.jit,
    static_argnames=(
        "dec_cfg", "n_utt", "beam", "beam_pad", "k_top", "sel_k", "n_steps",
        "sample_begin", "eos", "max_cand", "use_ts", "tb", "eot",
        "max_init_idx", "use_suppress", "use_blank", "use_ts_static",
        "early_exit", "unroll", "flat_sel", "flat16",
    ),
    donate_argnums=(2,),
)
def _beam_chunk(
    dec_params,
    cross,
    state,          # (tokens, scores, cache, anc, lt, pt, has, stamp, live, fin)
    suppress_mask,  # (V,) f32 additive (zeros when unused)
    blank_mask,     # (V,) f32 additive
    ts_static_mask, # (V,) f32 additive (<|notimestamps|> suppression)
    pos0,           # traced: decoder position of this chunk's first step
    offsets,        # None, or (R,) int32 per-row prefix-start columns
                    # (ragged per-utterance prompts, right-aligned)
    prefix_kv,      # None, or per-utterance shared prompt K/V (S-minor;
                    # float (k, v) or int8 (k, ksc, v, vsc)) — the self
                    # cache then covers ONLY the suffix (new tokens)
    prefix_valid,   # None, or (U, P) bool ragged prompt-column mask
    *,
    dec_cfg,
    n_utt,
    beam,
    beam_pad,
    k_top,
    sel_k,
    n_steps,
    sample_begin,
    eos,
    max_cand,
    use_ts,
    tb,
    eot,
    max_init_idx,
    use_suppress,
    use_blank,
    use_ts_static,
    early_exit=False,
    unroll=1,
    flat_sel=False,
    flat16=False,
):
    """`n_steps` lockstep beam steps with DEVICE-side candidate selection
    (the reference BeamSearchDecoder.update rule), ONE host transfer per
    chunk. The host replays the identical rule over the returned pack.

    dec_params is a jit ARGUMENT — closing over it would bake the full
    decoder (1.8 GB for large-v3) into the HLO as constants."""
    from dualhyp_tpu.models import whisper as w

    n_vocab = dec_cfg.n_vocab
    # beam_pad >= beam: physical rows per utterance group, padded to a
    # sublane multiple in `padded` selection mode so the grouped
    # selection einsum's (u, beam_pad) row split keeps the cache slice's
    # (8, 128) tiling. Pad rows carry -inf scores and are never
    # selected; `beam` remains the logical beam everywhere selection
    # semantics care.
    rows = n_utt * beam_pad
    u_of_row = jnp.arange(rows) // beam_pad
    row_in_u = jnp.arange(rows) % beam_pad
    iota = jnp.arange(n_vocab)

    def one(carry, s):
        (tokens, scores, cache, anc, lt, pt, has, stamp,
         live_count, fin_count) = carry
        pos = pos0 + s
        # spos: this step's SUFFIX cache column (the shared-prefix
        # protocol stores only new tokens in the per-row cache)
        spos = pos - (sample_begin - 1)
        is_first = pos == sample_begin - 1
        done_prev = (fin_count >= max_cand) | (live_count <= 0)

        last_tokens = jax.lax.dynamic_index_in_dim(
            tokens, pos, axis=1, keepdims=False
        )
        # APPEND-ONLY cache: rows never move. `anc` (R, T) maps each live
        # slot to its ancestor slot per step (within its utterance's beam
        # group); this step's column belongs to the slot itself. The
        # decode step selects history through a one-hot MXU einsum and
        # returns only the new K/V columns — the full-cache
        # gather+rewrite+carry-copy of the permuting protocol (profiled
        # at ~75% of the 62.9 ms step) never happens.
        t_buf = anc.shape[1]  # SUFFIX width (== cache column count)
        anc_step = jnp.where(
            (jnp.arange(t_buf) == spos)[None, :], row_in_u[:, None], anc
        )
        self_quant = "k_scale" in cache
        # int8 one-hot for the int8 cache: the history selection runs as
        # an s8 x s8 -> s32 MXU dot inside decode_step_cached.
        # flat16: compute-dtype one-hot -> the selection runs as a bf16
        # MXU matmul instead (decode_step_cached branches on the one-hot
        # dtype; int8 cache values are exact in bf16)
        if self_quant:
            oh_dtype = (dec_params["token_embedding"].dtype
                        if flat16 else jnp.int8)
        else:
            oh_dtype = cache["k"].dtype
        from dualhyp_tpu.ops.linalg import einsum as _einsum

        if flat_sel:
            # FLAT block-diagonal selector (B, B, T) over global row
            # slots: row r's ancestor at step t is its utterance's slot
            # base + the within-group index, every off-group entry an
            # exact zero. The selection dot then consumes the cache
            # slice with NO (u, beam) row split — the split forces a
            # (8, 128)-tile relayout copy per layer per step whenever
            # beam % 8 != 0 (see decode_step_cached).
            onehot = jax.nn.one_hot(
                u_of_row[:, None] * beam_pad + anc_step, rows, axis=1,
                dtype=oh_dtype,
            )
        else:
            onehot = jax.nn.one_hot(
                anc_step.reshape(n_utt, beam_pad, t_buf), beam_pad,
                axis=2, dtype=oh_dtype,
            )
        kv_scales = None
        if self_quant:
            # ancestor-select the per-column scales ONCE per step for
            # all layers (the ancestor map is layer-independent) as a
            # one-hot MXU contraction — a take_along_axis here sits
            # inside the chunk lax.scan, the exact pattern the round-4b
            # lesson says lowers to a DMA loop. f32 one-hot + HIGHEST
            # keeps the selection exact.
            oh32 = onehot.astype(jnp.float32)
            if flat_sel:
                kv_scales = tuple(
                    _einsum("bst,lst->lbt", oh32, cache[key])
                    for key in ("k_scale", "v_scale")
                )
            else:
                kv_scales = tuple(
                    _einsum(
                        "urst,lust->lurt", oh32,
                        cache[key].reshape(
                            dec_cfg.n_layer, n_utt, beam_pad, t_buf
                        ),
                    ).reshape(dec_cfg.n_layer, rows, t_buf)
                    for key in ("k_scale", "v_scale")
                )
        logits, cols = w.decode_step_cached(
            dec_params, dec_cfg, last_tokens, pos, cache, cross,
            anc_onehot=onehot, unroll=unroll, self_kv_scales=kv_scales,
            pos_offset=offsets, prefix_kv=prefix_kv,
            prefix_valid=prefix_valid, cache_pos=spos,
        )
        upd = {}
        for key in ("k", "v"):
            upd[key] = jax.lax.dynamic_update_slice(
                cache[key], cols[key][:, :, None, :], (0, 0, spos, 0)
            )
            sk = key + "_scale"
            if sk in cache:
                upd[sk] = jax.lax.dynamic_update_slice(
                    cache[sk], cols[sk][:, :, None], (0, 0, spos)
                )
        cache = upd
        logits = logits.astype(jnp.float32)
        if use_blank:
            logits = jnp.where(is_first, logits + blank_mask, logits)
        if use_suppress:
            logits = logits + suppress_mask
        if use_ts:
            if use_ts_static:
                logits = logits + ts_static_mask
            # effective last-timestamp bound from the carried O(1) state
            # (== host ts_scalars: stamps[-1] if last-and-not-penultimate
            # else stamps[-1]+1; timestamp_begin when no stamp yet)
            tl = jnp.where(
                has, jnp.where(lt & ~pt, stamp, stamp + 1), tb
            )
            is_ts = (iota >= tb)[None]
            mask = (lt & pt)[:, None] & is_ts
            mask |= (lt & ~pt)[:, None] & (iota < eot)[None]
            mask |= is_ts & (iota < tl[:, None])
            first_mask = (iota < tb)[None]
            if max_init_idx is not None:
                first_mask = first_mask | (iota > tb + max_init_idx)[None]
            mask |= is_first & first_mask
            logits = jnp.where(mask, _NEG, logits)
            lp = jax.nn.log_softmax(logits, axis=-1)
            ts_lp = jax.nn.logsumexp(lp[:, tb:], axis=-1)
            max_text = lp[:, :tb].max(axis=-1)
            force = (ts_lp > max_text)[:, None] & (iota < tb)[None]
            logits = jnp.where(force, _NEG, logits)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        cand_scores, cand = _row_top_k(logprobs, k_top)  # (R, k_top)

        # ---- BeamSearchDecoder.update on device ----
        total = scores[:, None] + cand_scores
        row_live = row_in_u < live_count[u_of_row]
        total = jnp.where(row_live[:, None], total, _NEG)
        flat = total.reshape(n_utt, beam_pad * k_top)
        sel_scores, sel_flat = jax.lax.top_k(flat, sel_k)  # sorted desc
        sel_tok = jnp.take_along_axis(
            cand.reshape(n_utt, beam_pad * k_top), sel_flat, axis=1
        )
        valid = jnp.isfinite(sel_scores)
        eosm = (sel_tok == eos) & valid
        live_c = valid & ~eosm
        l_inc = jnp.cumsum(live_c.astype(jnp.int32), axis=1)
        keep_live = live_c & (l_inc <= beam)
        live_before = l_inc - live_c.astype(jnp.int32)
        # eos candidates ranked before the beam-th live survivor retire
        # to `finished` (ref: decoding.py:368-388)
        keep_eos = eosm & (live_before < beam)

        uu = jnp.arange(n_utt)[:, None]
        dst = jnp.where(keep_live, l_inc - 1, beam_pad)  # == dropped
        new_parent = jnp.zeros((n_utt, beam_pad), jnp.int32).at[uu, dst].set(
            sel_flat // k_top, mode="drop")
        new_tok = jnp.zeros((n_utt, beam_pad), jnp.int32).at[uu, dst].set(
            sel_tok, mode="drop")
        new_scores = jnp.full((n_utt, beam_pad), -jnp.inf, jnp.float32).at[
            uu, dst].set(sel_scores, mode="drop")

        live_count = jnp.where(
            done_prev, live_count, jnp.minimum(l_inc[:, -1], beam)
        )
        fin_count = jnp.where(
            done_prev, fin_count, fin_count + keep_eos.sum(axis=1)
        )

        # ---- apply the selection ----
        gparent = u_of_row * beam_pad + new_parent.reshape(-1)
        anc = anc_step[gparent]  # (R, T) int32 — the only re-parenting
        tokf = new_tok.reshape(-1)
        tokens = tokens[gparent]
        # masked write beats a vmapped dynamic_update (per-row loop)
        col = jnp.arange(tokens.shape[1])[None, :]
        tokens = jnp.where(col == pos + 1, tokf[:, None], tokens)
        scores = new_scores.reshape(-1)
        if use_ts:
            new_lt = tokf >= tb
            # penultimate-is-timestamp after append: True when the new
            # sampled length is 1, else the parent's last-is-timestamp
            new_pt = jnp.logical_or(is_first, lt[gparent])
            new_has = has[gparent] | new_lt
            new_stamp = jnp.where(new_lt, tokf, stamp[gparent])
            lt, pt, has, stamp = new_lt, new_pt, new_has, new_stamp

        ys = jnp.stack([
            sel_scores,
            sel_flat.astype(jnp.float32),
            sel_tok.astype(jnp.float32),
        ])
        carry = (tokens, scores, cache, anc, lt, pt, has, stamp,
                 live_count, fin_count)
        return carry, ys

    if not early_exit:
        # fixed trip count: XLA pipelines iterations (double-buffered
        # cache DMA) — the multi-utterance path, where short chunks
        # already bound post-finish waste and the host replay of chunk N
        # overlaps the device on chunk N+1. (An early-exit while here
        # measured 43.1 vs 40.5 ms/step at U=8: the data-dependent cond
        # serializes iteration dispatch.)
        carry, ys = jax.lax.scan(one, state, jnp.arange(n_steps))
        live_count, fin_count = carry[-2], carry[-1]
        return carry, live_count, fin_count, ys

    # bounded while with an all-utterances-done EARLY EXIT: once every
    # utterance has retired max_cand hypotheses (or gone dead), the
    # remaining steps of the chunk never execute on device. This makes
    # oversized chunks safe — the single-utterance path runs its WHOLE
    # token budget as one chunk (one host sync total, 8.0 vs 9.2 ms/step)
    # with no post-finish waste; the host replay reaches the same final
    # step by the same deterministic rule, so the untouched (zero) tail
    # of ys is never read.
    def chunk_cond(st):
        s, carry, _ = st
        live_count, fin_count = carry[-2], carry[-1]
        done = (fin_count >= max_cand) | (live_count <= 0)
        return jnp.logical_and(s < n_steps, ~jnp.all(done))

    def chunk_body(st):
        s, carry, ys_buf = st
        carry, ys = one(carry, s)
        ys_buf = jax.lax.dynamic_update_slice(
            ys_buf, ys[None], (s, 0, 0, 0)
        )
        return s + 1, carry, ys_buf

    ys0 = jnp.zeros((n_steps, 3, n_utt, sel_k), jnp.float32)
    _, carry, ys = jax.lax.while_loop(
        chunk_cond, chunk_body, (jnp.int32(0), state, ys0)
    )
    live_count, fin_count = carry[-2], carry[-1]
    return carry, live_count, fin_count, ys


@partial(jax.jit, static_argnames=("dec_cfg", "n_utt", "quantize"))
def _prefill(dec_params, cross, prefix_arr, offsets=None, *, dec_cfg,
             n_utt, quantize=None):
    """Walk the shared sot sequence (positions 0..len(prefix_arr)-1) in
    one jitted scan; the first chunk step consumes the LAST prefix token,
    so this stops one short of it.

    Runs at ONE row per utterance (cache batch == n_utt): under deferred
    re-parenting only each utterance's row 0 is ever read before its
    first parents-gather, so prefilling all beam rows would scan the full
    (rows x t_buf) cache through the loop carry for identical values —
    at large-v3 beam 50 x 16 utterances that double-buffered stack was
    the 23 GB OOM that capped decode_batch at 8.

    RAGGED mode (offsets is an (n_utt,) int32 array): prefix_arr is
    (P, n_utt) — per-utterance prompts RIGHT-ALIGNED into P shared
    columns, utterance u's real tokens occupying columns
    [offsets[u], P); each row's logical position is clip(col - offset)
    and its pre-start columns are masked (self-column always valid).

    PARALLEL since round 5: one causal teacher-forced forward over all
    P columns (models/whisper.prefill_cache) instead of P sequential
    decode steps — the per-column walk re-streamed the full decoder
    weights P times and was 43% of the long-form device time at
    224-token rolling prompts. Same masks, PE lookup and einsum
    numerics as the sequential path (which used decode_step_cached's
    head-split branch).

    Returns the SHARED-PREFIX tensors consumed by decode_step_cached's
    prefix_kv: per-utterance S-minor (L, U, n_state, P) K/V (K
    pre-scaled), stored ONCE per utterance instead of once per beam row
    — the prompt region of every row's history is identical (ancestor
    slot 0 invariant). quantize="int8" returns
    (k_q, k_scale, v_q, v_scale) with per-(l, u, channel) scales, the
    cross-KV convention (NOT the per-column suffix-cache convention —
    outputs shift within rounding either way, and the channel axis is
    the one that folds out of the dots for free)."""
    from dualhyp_tpu.models import whisper as w

    if prefix_arr.ndim == 1:
        tokens = jnp.broadcast_to(
            prefix_arr[None], (n_utt, prefix_arr.shape[0])
        )
    else:
        tokens = prefix_arr.T  # (P, U) -> (U, P)
    ks, vs = w.prefill_cache(
        dec_params, dec_cfg, tokens, cross, pos_offset=offsets
    )
    ks = ks.transpose(0, 1, 3, 2)  # (L, U, P, S) -> (L, U, S, P)
    vs = vs.transpose(0, 1, 3, 2)
    if quantize == "int8":
        kq, ksc = w._q8(ks)
        vq, vsc = w._q8(vs)
        return (kq.astype(jnp.int8), ksc, vq.astype(jnp.int8), vsc)
    return ks, vs


def device_beam_search(
    dec_params,
    dec_cfg,
    features,
    prefix: List[int],
    *,
    beam_size: int,
    eos_id: int,
    max_new_tokens: int,
    suppress_tokens: Optional[Sequence[int]] = None,
    suppress_blank_ids: Optional[Sequence[int]] = None,
    timestamp_rules: Optional[TimestampRules] = None,
    patience: Optional[float] = None,
    length_penalty: Optional[float] = None,
    cache_dtype=None,
    chunk_steps: Optional[int] = None,
    t_bucket: Optional[int] = None,
    cross_kv_quant=None,
    self_kv_quant=None,
) -> List[BeamHypothesis]:
    """Whisper DecodingTask beam search with the per-step compute AND the
    candidate selection on device.

    Semantics identical to `beam_search_nbest` driven by a cached stepper
    (and therefore to the reference DecodingTask)."""
    feats = features
    if feats.ndim == 2:
        feats = feats[None]
    return device_beam_search_batch(
        dec_params, dec_cfg, feats, prefix,
        beam_size=beam_size, eos_id=eos_id, max_new_tokens=max_new_tokens,
        suppress_tokens=suppress_tokens, suppress_blank_ids=suppress_blank_ids,
        timestamp_rules=timestamp_rules, patience=patience,
        length_penalty=length_penalty, cache_dtype=cache_dtype,
        chunk_steps=chunk_steps, t_bucket=t_bucket,
        cross_kv_quant=cross_kv_quant, self_kv_quant=self_kv_quant,
    )[0]


def device_beam_search_batch(
    dec_params,
    dec_cfg,
    features,
    prefix: Union[List[int], Sequence[Sequence[int]]],
    *,
    beam_size: int,
    eos_id: int,
    max_new_tokens: int,
    suppress_tokens: Optional[Sequence[int]] = None,
    suppress_blank_ids: Optional[Sequence[int]] = None,
    timestamp_rules: Optional[TimestampRules] = None,
    patience: Optional[float] = None,
    length_penalty: Optional[float] = None,
    cache_dtype=None,
    chunk_steps: Optional[int] = None,
    t_bucket: Optional[int] = None,
    cross_kv_quant=None,
    self_kv_quant=None,
    debug_trace: Optional[list] = None,
) -> List[List[BeamHypothesis]]:
    """Beam search over U utterances at once: (U x beam_size)-row device
    steps amortise per-step work and fill the MXU; the host syncs once
    per `chunk_steps` tokens and replays the device's selection rule from
    the returned scalar pack. Utterances advance in lockstep; finished
    ones keep dead rows until all complete.

    t_bucket: initial new-token capacity of the self cache (None = 32
    for multi-utterance groups, the whole budget at U=1 — a single
    utterance's full-budget cache is small and one bucket preserves the
    one-host-sync protocol; always capped at max_new_tokens). The
    cache, token and ancestor buffers are
    allocated at this BUCKET, not the full budget, and grown by doubling
    (32 -> 64 -> 128 -> budget) only while utterances are still decoding
    — with the reference-parity budget of 224 the full-size buffers are
    ~15 GB at 8 utterances x beam 50 x large-v3 (an immediate OOM on a
    16 GB chip) and every step's append-only history selection streams
    the whole static T, so a short utterance must not pay for the budget
    it never uses. At each growth the finished utterances are COMPACTED
    away (live set padded to a power of two to bound the number of
    compiled (n_utt, T) variants), so deep buckets only carry the
    stragglers. Token streams are unchanged: growth pads with zeros the
    masked attention never reads, and compaction only re-indexes.

    chunk_steps=None picks per batch size: 16 for multi-utterance groups
    (the host replay of chunk N overlaps the device running chunk N+1 —
    chunk 35 at U=8 measured 185 vs 172 ms/utt), the WHOLE token budget
    for a single utterance (its replay is cheap, syncs dominate: one
    sync measured 8.1 vs 9.2 ms/step; the device chunk's all-done early
    exit means no post-finish waste either way).

    features: (U, S, n_state) encoder outputs. prefix: one shared
    List[int] (one DecodingOptions per run, like the reference's batched
    DecodingTask, ref: data/whisper/decoding.py:568-580, 719-747) or a
    per-utterance List[List[int]] of RAGGED prefixes (right-aligned into
    a shared column buffer; per-utterance results identical to separate
    runs — the long-form n-best streams batch their windows this way).
    cache_dtype: KV cache dtype; defaults to the decoder params' dtype.
    Returns one List[BeamHypothesis] per utterance, each sorted by
    `ranking_score` (sum-logprob / length**length_penalty)."""
    from dualhyp_tpu.models import whisper as w

    n_utt = features.shape[0]
    sel_mode = _sel_mode()
    beam_pad = (
        -(-beam_size // 8) * 8 if sel_mode == "padded" else beam_size
    )
    rows = n_utt * beam_pad
    if chunk_steps is None:
        chunk_steps = 16 if n_utt > 1 else max_new_tokens
    # RAGGED prefixes: `prefix` may be one shared List[int] (the batched
    # make_json_asr path — one DecodingOptions per run like the
    # reference) or a per-utterance List[List[int]] (the long-form
    # n-best seek streams, whose rolling prompts differ per stream).
    # Per-utterance prefixes are RIGHT-ALIGNED into a shared
    # sample_begin = max(len) column buffer: utterance u's tokens occupy
    # columns [sample_begin - len_u, sample_begin), every row carries a
    # position offset (its logical position = column - offset), and
    # decode_step_cached masks the pre-start columns. Columns stay
    # lockstep, so the append-only cache protocol is untouched.
    per_utt = bool(prefix) and isinstance(prefix[0], (list, tuple, np.ndarray))
    if per_utt:
        prefixes = [list(map(int, p)) for p in prefix]
        assert len(prefixes) == n_utt, (len(prefixes), n_utt)
        assert all(prefixes), "empty per-utterance prefix"
        if all(p == prefixes[0] for p in prefixes):
            prefix = prefixes[0]  # identical: the tuned shared path
            per_utt = False
    if per_utt:
        utt_sb = [len(p) for p in prefixes]
        sample_begin = max(utt_sb)
        off_np = np.asarray(
            [sample_begin - n for n in utt_sb], np.int32
        )
        utt_off = jnp.asarray(off_np)
        row_off = None  # built after beam_pad is known
        pmat = np.zeros((n_utt, sample_begin), np.int32)
        for u, p in enumerate(prefixes):
            pmat[u, sample_begin - len(p):] = p
    else:
        prefixes = None
        sample_begin = len(prefix)
        utt_sb = [sample_begin] * n_utt
        row_off = None
    # Reference main-loop cap: decoding stops once the total length
    # exceeds n_ctx (ref: data/whisper/decoding.py:746) — the forward at
    # length n_ctx (reading position n_ctx - 1) is the last to run.
    # Without this, a long rolling prompt plus the full 224-token budget
    # walks `pos` past the positional-embedding table (the long-form
    # 448-token windows hit NaN fills at pos == n_ctx and starved every
    # beam). Ragged groups cap at the LONGEST prefix — rows advance in
    # lockstep columns, so the shared buffer ends where the longest
    # row's budget does.
    assert sample_begin <= dec_cfg.n_ctx, (sample_begin, dec_cfg.n_ctx)
    max_new_tokens = min(max_new_tokens, dec_cfg.n_ctx - sample_begin + 1)
    max_candidates = int(round(beam_size * (patience or 1.0)))
    assert max_candidates > 0, f"invalid beam_size/patience: {beam_size}/{patience}"
    n_vocab = dec_cfg.n_vocab
    k_top = min(beam_size + 1, n_vocab)
    sel_k = min(2 * beam_size, beam_size * k_top)
    if cache_dtype is None:
        # the token embedding reflects the model's compute precision and
        # is never quantized (a quantized tree's first leaves are int8
        # weights and f32 scales — neither is a sane KV-cache dtype)
        cache_dtype = dec_params["token_embedding"].dtype

    # (L, U, n_state, S) memory KV (S-minor + K pre-scaled by hd**-0.25
    # — see precompute_cross_kv); rows map to utterance row // beam_size
    # inside decode_step_cached's grouped cross-attention path
    # cross_kv_quant="int8" halves the beam's dominant per-step HBM
    # stream (and the U-width memory bound) at a small logits rounding;
    # None keeps the exact bf16/f32 path (see precompute_cross_kv)
    cross = w.precompute_cross_kv(
        dec_params, dec_cfg, features, quantize=cross_kv_quant
    )
    if t_bucket is None:
        # multi-utterance: start small and grow (the 4h memory fix —
        # budget-224 batched caches OOM outright at full width). U=1's
        # full-budget cache is small (~1.9 GB at large-v3 budget 224)
        # and its protocol is ONE whole-budget chunk with one host
        # sync — starting at the full budget keeps growth from
        # splitting it into extra dispatches + recompiles.
        t_bucket = max_new_tokens if n_utt == 1 else 32
    cap = min(max_new_tokens, max(t_bucket, 1))
    # SHARED-PREFIX protocol: the per-row self cache holds ONLY the
    # suffix (new tokens); the prompt prefix lives once per utterance in
    # `prefix_kv` (see _prefill / decode_step_cached.prefix_kv) — a
    # 224-token rolling prompt no longer multiplies the cache, the
    # per-step history stream, or the selection work by beam_size
    t_full = sample_begin + max_new_tokens  # token-buffer width (int32)
    cache = w.init_self_cache(
        dec_cfg, rows, cap, dtype=cache_dtype, quantize=self_kv_quant
    )
    if per_utt:
        row_off = jnp.asarray(np.repeat(off_np, beam_pad))

    def vocab_mask(ids):
        m = np.zeros((n_vocab,), np.float32)
        if ids:
            m[list(ids)] = -np.inf
        return jnp.asarray(m)

    use_suppress = bool(suppress_tokens)
    use_blank = bool(suppress_blank_ids)
    use_ts = timestamp_rules is not None
    use_ts_static = use_ts and timestamp_rules.no_timestamps is not None
    suppress_mask = vocab_mask(suppress_tokens if use_suppress else None)
    blank_mask = vocab_mask(suppress_blank_ids if use_blank else None)
    ts_static_mask = vocab_mask(
        [timestamp_rules.no_timestamps] if use_ts_static else None
    )
    tb = timestamp_rules.timestamp_begin if use_ts else 0
    eot = timestamp_rules.eot if use_ts else eos_id
    max_init_idx = (
        timestamp_rules.max_initial_timestamp_index if use_ts else None
    )

    prefix_kv = None
    prefix_valid = None
    if sample_begin > 1:
        # one parallel causal pass over the prompt -> per-utterance
        # shared S-minor K/V (quantized per channel once when the beam
        # cache is int8 — the cross-KV convention, folds out of the dots)
        if per_utt:
            prefix_kv = _prefill(
                dec_params, cross,
                jnp.asarray(pmat[:, :-1].T, jnp.int32), utt_off,
                dec_cfg=dec_cfg, n_utt=n_utt,
                quantize=self_kv_quant,
            )
            prefix_valid = jnp.asarray(
                np.arange(sample_begin - 1)[None, :] >= off_np[:, None]
            )
        else:
            prefix_kv = _prefill(
                dec_params, cross, jnp.asarray(prefix[:-1], jnp.int32),
                dec_cfg=dec_cfg, n_utt=n_utt, quantize=self_kv_quant,
            )

    tokens0 = np.zeros((rows, t_full), np.int32)
    if per_utt:
        tokens0[:, :sample_begin] = np.repeat(pmat, beam_pad, axis=0)
    else:
        tokens0[:, :sample_begin] = prefix
    state = (
        jnp.asarray(tokens0),
        # only row 0 of each utterance is live at the first selection
        jnp.zeros((rows,), jnp.float32),
        cache,
        # ancestor map over SUFFIX columns: slot of each row's history
        # per new-token step (within its utterance's beam group)
        jnp.zeros((rows, cap), jnp.int32),
        jnp.zeros((rows,), bool),   # last sampled token is a timestamp
        jnp.ones((rows,), bool),    # penultimate is a timestamp (len<2)
        jnp.zeros((rows,), bool),   # any timestamp sampled yet
        jnp.zeros((rows,), jnp.int32),  # last sampled timestamp token
        jnp.ones((n_utt,), jnp.int32),  # live_count
        jnp.zeros((n_utt,), jnp.int32),  # fin_count
    )

    chunk_kwargs = dict(
        dec_cfg=dec_cfg, n_utt=n_utt, beam=beam_size,
        beam_pad=beam_pad, k_top=k_top,
        sel_k=sel_k, sample_begin=sample_begin, eos=eos_id,
        max_cand=max_candidates, use_ts=use_ts, tb=tb, eot=eot,
        max_init_idx=max_init_idx, use_suppress=use_suppress,
        use_blank=use_blank, use_ts_static=use_ts_static,
        early_exit=n_utt == 1,
        # read once here and passed as STATIC jit args: an env read
        # inside the traced body would not key the jit cache, so
        # toggling it mid-process would silently reuse the stale trace
        unroll=_layer_unroll(),
        flat_sel=sel_mode in ("flat", "flat16"),
        flat16=sel_mode == "flat16",
    )

    # host-side mirrors, rebuilt by replaying the device rule
    # live hypotheses are cons cells: node = (parent_node, tok), rooted
    # at None; cons_to_list walks the chain (cheap — only finished or
    # surviving hypotheses ever materialise)
    def _root(toks):
        node = None
        for t in toks:
            node = (node, int(t))
        return node

    roots = (
        [_root(p) for p in prefixes] if per_utt
        else [_root(prefix)] * n_utt
    )
    live: List[List[tuple]] = [[(roots[u], 0.0)] for u in range(n_utt)]
    finished: List[dict] = [{} for _ in range(n_utt)]
    utt_done = [False] * n_utt
    # device-slot -> original-utterance map; None marks a padding slot
    # introduced by compaction (its selections are computed and ignored)
    amap: List[Optional[int]] = list(range(n_utt))

    def dispatch(pos_base, n):
        nonlocal state
        state, _, _, ys = _beam_chunk(
            dec_params, cross, state, suppress_mask, blank_mask,
            ts_static_mask, jnp.int32(sample_begin - 1 + pos_base),
            row_off, prefix_kv, prefix_valid, n_steps=n, **chunk_kwargs,
        )
        return ys

    def grow_and_compact():
        # called only between chunks, with every dispatched chunk
        # replayed (utt_done is current) and more budget still to decode
        nonlocal state, cross, amap, cap, chunk_kwargs, row_off
        nonlocal prefix_kv, prefix_valid
        tokens, scores, cache, anc, lt, pt, has, stamp, lc, fc = state
        # drop the old state tuple NOW: it holds the pre-growth cache
        # dict, which would otherwise keep every old tensor alive until
        # the final rebind and defeat the one-at-a-time staging below
        state = None
        keep = [i for i, u in enumerate(amap)
                if u is not None and not utt_done[u]]
        n_new = 1
        while n_new < len(keep):
            n_new *= 2
        if n_new < len(amap):
            # drop finished utterances before paying for bigger buffers;
            # pad to a power of two with a DUPLICATE of a live utterance
            # (frozen nowhere — it decodes garbage nobody replays) so the
            # compiled (n_utt, T) variants stay a small ladder
            idx = keep + [keep[0]] * (n_new - len(keep))
            amap = [amap[i] for i in keep] + [None] * (n_new - len(keep))
            ui = jnp.asarray(idx, jnp.int32)
            ri = (ui[:, None] * beam_pad
                  + jnp.arange(beam_pad)[None, :]).reshape(-1)
            tokens, scores, anc = tokens[ri], scores[ri], anc[ri]
            lt, pt, has, stamp = lt[ri], pt[ri], has[ri], stamp[ri]
            if row_off is not None:
                row_off = row_off[ri]
            # pop per key so each old tensor dies right after its take
            cache = dict(cache)
            for k in list(cache):
                old = cache.pop(k)
                cache[k] = jnp.take(old, ri, axis=1)
                del old
            cross = tuple(jnp.take(c, ui, axis=1) for c in cross)
            if prefix_kv is not None:
                prefix_kv = tuple(
                    jnp.take(t, ui, axis=1) for t in prefix_kv
                )
            if prefix_valid is not None:
                prefix_valid = jnp.take(prefix_valid, ui, axis=0)
            lc, fc = lc[ui], fc[ui]
            chunk_kwargs = dict(
                chunk_kwargs, n_utt=n_new, early_exit=n_new == 1
            )
        new_cap = min(max_new_tokens, cap * 2)
        pad = new_cap - cap
        if pad > 0:
            # tokens stay full-width from the start (int32, tiny); only
            # the suffix cache + ancestor map grow
            anc = jnp.pad(anc, ((0, 0), (0, pad)))
            # grow K before V so at most one grown cache tensor coexists
            # with both old ones (the padded region is zeros the masked
            # attention never reads); pop per key so old K is freed
            # before V grows
            cache = dict(cache)
            for k in list(cache):
                old = cache.pop(k)
                spec = [(0, 0)] * old.ndim
                spec[2] = (0, pad)  # values (L,R,T,D) / scales (L,R,T)
                cache[k] = jnp.pad(old, spec)
                del old
            cap = new_cap
        state = (tokens, scores, cache, anc, lt, pt, has, stamp, lc, fc)
        if debug_trace is not None:  # (new cap, live slots) per growth
            debug_trace.append(
                (cap, sum(1 for u in amap if u is not None))
            )

    def replay(arr, n, amap_k):
        # replay the device's selection rule to rebuild token lists
        # (same inputs, same deterministic rule — host and device stay
        # in lockstep; ref: decoding.py:338-441). Sequences are
        # cons cells (parent_node, tok) materialised lazily — the
        # original per-candidate numpy-scalar reads + O(len) list
        # copies were ~290 ms/chunk of pure host time once the device
        # step dropped to ~31 ms (round-4e trace), dominating the wall.
        finite = np.isfinite(arr[:, 0])
        parents_all = (arr[:, 1].astype(np.int64)) // k_top
        toks_all = arr[:, 2].astype(np.int64)
        for s in range(n):
            sel_scores = arr[s, 0]
            for slot, u in enumerate(amap_k):
                if u is None or utt_done[u]:
                    continue
                idxs = np.nonzero(finite[s, slot])[0]
                sc_l = sel_scores[slot][idxs].tolist()
                par_l = parents_all[s, slot][idxs].tolist()
                tok_l = toks_all[s, slot][idxs].tolist()
                lu = live[u]
                nlu = len(lu)
                fin_u = finished[u]
                new_live: List[tuple] = []
                dropped = 0
                for score, parent, tok in zip(sc_l, par_l, tok_l):
                    if parent >= nlu:
                        dropped += 1
                        continue
                    if tok == eos_id:
                        if len(fin_u) < max_candidates:
                            fin_u.setdefault(
                                tuple(cons_to_list(lu[parent][0])), score
                            )
                    else:
                        new_live.append(((lu[parent][0], tok), score))
                        if len(new_live) == beam_size:
                            break
                # STARVATION guard: a beam can empty with nothing finished
                # when every candidate of a step is -inf (degenerate
                # rule-mask regimes — e.g. an untrained model driven into
                # a state whose allowed-token set is empty). The reference
                # finalizer pads from the still-live beams in exactly this
                # case (ref: data/whisper/decoding.py:389-408 finalize
                # appends EOT to unfinished sequences), so keep the
                # pre-step beams for our finalizer instead of returning
                # zero hypotheses.
                if not new_live and not fin_u:
                    if os.environ.get("DUALHYP_BEAM_DEBUG"):
                        print(
                            f"[beam-debug] starved: utt {u} step {s} "
                            f"finite={int(finite[s, slot].sum())} "
                            f"parent-dropped={dropped} nlu={nlu} "
                            f"top-scores={arr[s, 0, slot, :4].tolist()} "
                            f"toks={toks_all[s, slot, :4].tolist()}",
                            flush=True,
                        )
                    utt_done[u] = True
                    continue
                live[u] = new_live
                if len(fin_u) >= max_candidates or not new_live:
                    utt_done[u] = True

    # SPECULATIVE chunk pipelining: chunk k+1 is dispatched BEFORE chunk
    # k's scalar pack is fetched — the next chunk depends only on the
    # device-side carry, never on host state, so the ~30-60 ms tunnel
    # fetch + the host replay of chunk k overlap the device running
    # chunk k+1. If the replay finds every utterance finished, the
    # in-flight chunk is discarded unread (bounded waste: at most one
    # chunk per batch, only when the run ends before the token budget;
    # done utterances' rows compute garbage that is never read either
    # way). Token streams are unchanged — replay order is identical.
    # Speculation never crosses a bucket boundary: growth/compaction
    # needs the previous chunk replayed (utt_done current), and the
    # grown state replaces the carry the speculative chunk would read.
    step_done = 0
    pending = None  # (in-flight ys, its n_steps, its slot->utterance map)
    while True:
        if pending is None:
            if step_done >= max_new_tokens or all(utt_done):
                break
            if cap - step_done == 0:
                grow_and_compact()
            n_steps = min(
                chunk_steps, max_new_tokens - step_done, cap - step_done
            )
            pending = (dispatch(step_done, n_steps), n_steps, list(amap))
            step_done += n_steps
        nxt = None
        if step_done < max_new_tokens and cap - step_done > 0:
            n2 = min(
                chunk_steps, max_new_tokens - step_done, cap - step_done
            )
            nxt = (dispatch(step_done, n2), n2, list(amap))
            step_done += n2
        ys_k, n_k, amap_k = pending
        replay(np.asarray(ys_k), n_k, amap_k)  # overlaps in-flight chunk
        if all(utt_done):
            break
        pending = nxt

    out: List[List[BeamHypothesis]] = []
    for u in range(n_utt):
        results = [
            BeamHypothesis(list(seq), score, utt_sb[u])
            for seq, score in finished[u].items()
        ]
        if len(results) < beam_size:
            for node, sc in sorted(live[u], key=lambda x: -x[1]):
                results.append(
                    BeamHypothesis(cons_to_list(node), sc, utt_sb[u])
                )
                if len(results) >= beam_size:
                    break
        results.sort(key=lambda h: -h.ranking_score(length_penalty))
        out.append(results)
    return out
