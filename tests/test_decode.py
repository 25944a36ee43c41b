import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.infer import evaluate as ev
from dualhyp_tpu.infer.decode import generate, generate_lookup
from dualhyp_tpu.models import gpt
from tests import helpers


def _greedy_reference(params, cfg, prompt, max_new, eos_id=None):
    """Token-by-token greedy using only the training forward pass."""
    seq = list(prompt)
    for _ in range(max_new):
        logits = gpt.forward(
            params, cfg, jnp.asarray([seq], jnp.int32), compute_dtype=jnp.float32
        )
        tok = int(jnp.argmax(logits[0, -1]))
        if eos_id is not None and tok == eos_id:
            break  # reference drops the EOS token (generate/base.py:78-80)
        seq.append(tok)
    return seq


@pytest.mark.slow
def test_generate_matches_forward_greedy():
    cfg = helpers.tiny_llama_config()
    params = gpt.init(cfg, jax.random.key(3))
    prompt = [5, 11, 2, 9, 4]
    max_new = 6
    want = _greedy_reference(params, cfg, prompt, max_new)

    ids = np.zeros((1, len(prompt)), np.int32)
    ids[0] = prompt
    tokens, lengths = generate(
        params,
        cfg,
        jnp.asarray(ids),
        jnp.asarray([len(prompt)], jnp.int32),
        max_new_tokens=max_new,
        temperature=0.2,
        top_k=1,
        compute_dtype=jnp.float32,
    )
    got = list(np.asarray(tokens)[0][: int(lengths[0])])
    assert got == want, (got, want)


def test_generate_stops_at_eos_and_batches_ragged():
    cfg = helpers.tiny_llama_config()
    params = gpt.init(cfg, jax.random.key(3))
    p1 = [5, 11, 2, 9, 4]
    p2 = [7, 1, 3]
    max_new = 8

    # pick an eos that the model actually emits for p1 (its first greedy tok)
    first = _greedy_reference(params, cfg, p1, 1)[-1]
    want1 = _greedy_reference(params, cfg, p1, max_new, eos_id=first)
    want2 = _greedy_reference(params, cfg, p2, max_new, eos_id=first)

    ids = np.zeros((2, 5), np.int32)
    ids[0, : len(p1)] = p1
    ids[1, : len(p2)] = p2
    tokens, lengths = generate(
        params,
        cfg,
        jnp.asarray(ids),
        jnp.asarray([len(p1), len(p2)], jnp.int32),
        max_new_tokens=max_new,
        temperature=0.2,
        top_k=1,
        eos_id=first,
        compute_dtype=jnp.float32,
    )
    got1 = list(np.asarray(tokens)[0][: int(lengths[0])])
    got2 = list(np.asarray(tokens)[1][: int(lengths[1])])
    assert got1 == want1
    assert got2 == want2
    assert first not in got1[len(p1):]  # EOS excluded, like the reference


def test_verify_step_matches_sequential_decode():
    """Chunked verification logits == one-token-at-a-time decode logits."""
    cfg = helpers.tiny_llama_config()
    params = gpt.init(cfg, jax.random.key(7))
    rng = np.random.default_rng(0)
    b, t, k = 2, 6, 4
    prompt = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, t)), jnp.int32)
    lengths = jnp.asarray([t, t - 2], jnp.int32)
    chunk = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, k)), jnp.int32)

    cache = gpt.init_cache(cfg, b, 32, dtype=jnp.float32)
    _, cache = gpt.prefill(params, cfg, prompt, lengths, cache,
                           compute_dtype=jnp.float32)
    chunk_logits, _ = gpt.verify_step(
        params, cfg, chunk, lengths, cache, compute_dtype=jnp.float32
    )

    seq_logits = []
    seq_cache = cache
    for i in range(k):
        li, seq_cache = gpt.decode_step(
            params, cfg, chunk[:, i], lengths + i, seq_cache,
            compute_dtype=jnp.float32,
        )
        seq_logits.append(li)
    np.testing.assert_allclose(
        np.asarray(chunk_logits),
        np.stack([np.asarray(l) for l in seq_logits], axis=1),
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.slow
def test_generate_lookup_matches_generate_greedy():
    """Prompt-lookup speculative decode is token-identical to greedy
    generate() — across seeds, ragged batches, EOS, and draft lengths."""
    for seed in (3, 11):
        cfg = helpers.tiny_llama_config()
        params = gpt.init(cfg, jax.random.key(seed))
        rng = np.random.default_rng(seed)
        b, t, max_new = 3, 10, 12
        ids = rng.integers(1, cfg.vocab_size, (b, t)).astype(np.int32)
        # repeat a bigram inside row 0 so the lookup proposes real drafts
        ids[0, 4:6] = ids[0, 0:2]
        lens = np.asarray([t, t - 3, t - 5], np.int32)
        for row, l in enumerate(lens):
            ids[row, l:] = 0
        # an EOS id the model emits for row 0 (its first greedy token)
        base = generate(
            params, cfg, jnp.asarray(ids), jnp.asarray(lens),
            max_new_tokens=max_new, temperature=0.2, top_k=1,
            compute_dtype=jnp.float32,
        )
        eos = int(np.asarray(base[0])[0, lens[0]])
        for draft_len in (1, 3, 8):
            for eos_id in (None, eos):
                want_tok, want_len = generate(
                    params, cfg, jnp.asarray(ids), jnp.asarray(lens),
                    max_new_tokens=max_new, temperature=0.2, top_k=1,
                    eos_id=eos_id, compute_dtype=jnp.float32,
                )
                got_tok, got_len = generate_lookup(
                    params, cfg, jnp.asarray(ids), jnp.asarray(lens),
                    max_new_tokens=max_new, eos_id=eos_id,
                    draft_len=draft_len, compute_dtype=jnp.float32,
                )
                np.testing.assert_array_equal(
                    np.asarray(got_len), np.asarray(want_len),
                    err_msg=f"seed={seed} draft={draft_len} eos={eos_id}",
                )
                for row in range(b):
                    n = int(want_len[row])
                    np.testing.assert_array_equal(
                        np.asarray(got_tok)[row, :n],
                        np.asarray(want_tok)[row, :n],
                        err_msg=f"seed={seed} draft={draft_len} eos={eos_id} row={row}",
                    )


@pytest.mark.slow
def test_generate_anchored_matches_generate_greedy():
    """Hypothesis-anchored speculative decode is token-identical to greedy
    generate() — across ragged batches, EOS, draft lengths, and with
    present/absent/degenerate spans."""
    from dualhyp_tpu.infer.decode import generate_anchored

    for seed in (3, 11):
        cfg = helpers.tiny_llama_config()
        params = gpt.init(cfg, jax.random.key(seed))
        rng = np.random.default_rng(seed)
        b, t, max_new = 3, 10, 12
        ids = rng.integers(1, cfg.vocab_size, (b, t)).astype(np.int32)
        ids[0, 4:6] = ids[0, 0:2]
        lens = np.asarray([t, t - 3, t - 5], np.int32)
        for row, l in enumerate(lens):
            ids[row, l:] = 0
        # row 0: a real span; row 1: zero span (degrades to lookup);
        # row 2: span covering the whole prompt
        span_start = np.asarray([2, 0, 0], np.int32)
        span_len = np.asarray([5, 0, t - 5], np.int32)
        base = generate(
            params, cfg, jnp.asarray(ids), jnp.asarray(lens),
            max_new_tokens=max_new, temperature=0.2, top_k=1,
            compute_dtype=jnp.float32,
        )
        eos = int(np.asarray(base[0])[0, lens[0]])
        for draft_len in (1, 4, 8):
            for eos_id in (None, eos):
                want_tok, want_len = generate(
                    params, cfg, jnp.asarray(ids), jnp.asarray(lens),
                    max_new_tokens=max_new, temperature=0.2, top_k=1,
                    eos_id=eos_id, compute_dtype=jnp.float32,
                )
                got_tok, got_len = generate_anchored(
                    params, cfg, jnp.asarray(ids), jnp.asarray(lens),
                    jnp.asarray(span_start), jnp.asarray(span_len),
                    max_new_tokens=max_new, eos_id=eos_id,
                    draft_len=draft_len, compute_dtype=jnp.float32,
                )
                np.testing.assert_array_equal(
                    np.asarray(got_len), np.asarray(want_len),
                    err_msg=f"seed={seed} draft={draft_len} eos={eos_id}",
                )
                for row in range(b):
                    n = int(want_len[row])
                    np.testing.assert_array_equal(
                        np.asarray(got_tok)[row, :n],
                        np.asarray(want_tok)[row, :n],
                        err_msg=f"seed={seed} draft={draft_len} "
                                f"eos={eos_id} row={row}",
                    )


def test_anchored_propose_follows_span_and_pointer():
    """The anchored draft copies the hypothesis span continuation, uses
    the EARLIEST at/after-pointer match (plain lookup would latch onto
    the most-recent, e.g. self-repetition in the generated text), and
    the pointer disambiguates repeated n-grams inside the span."""
    from dualhyp_tpu.infer.decode import _anchored_propose, _lookup_propose

    # buffer layout: [prefix 0..2][span 3..10][suffix][generated ...]
    #   span = 7 8 9 5 7 8 9 6   (the trigram 7 8 9 occurs twice)
    buf = np.zeros((32,), np.int32)
    buf[:3] = [1, 2, 3]
    span = [7, 8, 9, 5, 7, 8, 9, 6]
    buf[3:11] = span
    buf[11:14] = [4, 4, 4]  # other prompt text
    # generated so far: copied "7 8 9" (the FIRST span occurrence)
    buf[14:17] = [7, 8, 9]
    length = 17

    draft, span_pos = _anchored_propose(
        jnp.asarray(buf), jnp.int32(length), jnp.int32(0),
        jnp.int32(3), jnp.int32(8), draft_len=4, ngram=3,
    )
    # earliest match => continuation is "5 7 8 9" (not the 2nd occurrence)
    assert list(np.asarray(draft)) == [5, 7, 8, 9]
    assert int(span_pos) == 3  # continuation index within the span

    # with the pointer advanced past the first occurrence, the SECOND
    # occurrence's continuation ("6 ...") is proposed instead
    draft2, span_pos2 = _anchored_propose(
        jnp.asarray(buf), jnp.int32(length), jnp.int32(5),
        jnp.int32(3), jnp.int32(8), draft_len=4, ngram=3,
    )
    assert list(np.asarray(draft2))[0] == 6
    assert int(span_pos2) == 7

    # plain whole-buffer lookup prefers the MOST RECENT occurrence — the
    # second span copy — so the pointer genuinely changes the draft
    fb = _lookup_propose(jnp.asarray(buf), jnp.int32(length),
                         draft_len=4, ngram=3)
    assert list(np.asarray(fb))[0] == 6

    # zero span => identical to the whole-buffer fallback
    d0, p0 = _anchored_propose(
        jnp.asarray(buf), jnp.int32(length), jnp.int32(0),
        jnp.int32(0), jnp.int32(0), draft_len=4, ngram=3,
    )
    assert int(p0) == -1
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(fb))


def test_find_subsequence_span():
    from dualhyp_tpu.infer.decode import find_subsequence_span

    assert find_subsequence_span([1, 2, 3, 4, 5], [3, 4]) == (2, 2)
    assert find_subsequence_span([1, 2, 3], [4]) == (0, 0)
    assert find_subsequence_span([1, 2, 3], []) == (0, 0)
    assert find_subsequence_span([1, 2, 1, 2], [1, 2]) == (0, 2)


def test_edit_distance_and_wer():
    assert ev.edit_distance("abc", "abc") == 0
    assert ev.edit_distance("abc".split(), "abc".split()) == 0
    assert ev.edit_distance(["a", "b", "c"], ["a", "x", "c"]) == 1
    assert ev.edit_distance(["a", "b"], ["a", "b", "c"]) == 1
    assert ev.edit_distance(["a", "b", "c"], ["b", "c"]) == 1

    # corpus WER: (1 sub + 1 del) / 6 ref words
    preds = ["the cat sat", "on mat"]
    refs = ["the dog sat", "on the mat"]
    np.testing.assert_allclose(ev.word_error_rate(preds, refs), 2 / 6)


def test_post_normalize_and_metrics():
    assert ev.post_normalize("Hello, World - it's fine?") == "hello world  its fine"
    out = ev.evaluate_predictions(["The cat."], ["the cat"])
    assert out["gtms"] == 0.0 and out["post_gtms"] == 1.0
    assert out["post_ST_wer"] == 0.0


def test_extract_response():
    full = "PROMPT### Response:\nhello world\nextra line"
    prompt = "PROMPT### Response:\n"
    assert ev.extract_response(full, prompt) == "hello world"


def test_decode_attention_int8_matches_dequant():
    """int8-cache attention with folded-out scales (ops/attention
    `_dequant_cache`: K scale multiplies the logits, V scale the
    probabilities) equals attention over the explicitly dequantized
    cache — the fold is the same math applied on the other side of the
    contraction."""
    from dualhyp_tpu.ops import attention as attn_ops
    from dualhyp_tpu.ops.quant import q8_rows

    rng = np.random.default_rng(0)
    b, g, hq, s, d = 2, 2, 4, 16, 8
    q = jnp.asarray(rng.normal(size=(b, hq, 1, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, g, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, g, s, d)).astype(np.float32))
    kq, ksc = q8_rows(k)
    vq, vsc = q8_rows(v)
    k_dq = jnp.asarray(np.asarray(kq) * np.asarray(ksc)[..., None])
    v_dq = jnp.asarray(np.asarray(vq) * np.asarray(vsc)[..., None])
    kv_length = jnp.asarray([10, 16], jnp.int32)
    got = attn_ops.decode_attention(
        q, kq.astype(jnp.int8), vq.astype(jnp.int8), kv_length,
        k_scale=ksc, v_scale=vsc,
    )
    want = attn_ops.decode_attention(q, k_dq, v_dq, kv_length)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )

    qc = jnp.asarray(rng.normal(size=(b, hq, 3, d)).astype(np.float32))
    start = jnp.asarray([7, 13], jnp.int32)
    got_c = attn_ops.chunk_decode_attention(
        qc, kq.astype(jnp.int8), vq.astype(jnp.int8), start,
        k_scale=ksc, v_scale=vsc,
    )
    want_c = attn_ops.chunk_decode_attention(qc, k_dq, v_dq, start)
    np.testing.assert_allclose(
        np.asarray(got_c), np.asarray(want_c), rtol=1e-5, atol=1e-5
    )


def test_generate_int8_kv_matches_bf16_tiny():
    """generate(kv_quant="int8") returns the exact bf16-cache greedy
    stream at tiny scale (quantization noise << the random model's
    logit gaps — the same argument as the whisper KV-quant tests) and
    EOS/ragged-batch handling is unchanged."""
    cfg = helpers.tiny_llama_config()
    params = gpt.init(cfg, jax.random.key(3))
    ids = np.zeros((2, 5), np.int32)
    ids[0] = [5, 11, 2, 9, 4]
    ids[1, :3] = [7, 1, 3]
    lengths = jnp.asarray([5, 3], jnp.int32)
    kw = dict(max_new_tokens=8, temperature=0.2, top_k=1,
              compute_dtype=jnp.float32)
    ref_t, ref_l = generate(params, cfg, jnp.asarray(ids), lengths, **kw)
    got_t, got_l = generate(params, cfg, jnp.asarray(ids), lengths,
                            kv_quant="int8", **kw)
    assert np.array_equal(np.asarray(ref_l), np.asarray(got_l))
    for b in range(2):
        n = int(ref_l[b])
        assert np.array_equal(
            np.asarray(ref_t)[b, :n], np.asarray(got_t)[b, :n]
        )


def test_generate_lookup_int8_matches_generate_int8():
    """The speculative paths' token-identity invariant holds under the
    int8 cache: chunked verify-step writes quantize each token's K/V row
    independently (per-(B, G, slot) scales over D), so step-by-step and
    chunked decoding write IDENTICAL cache bytes."""
    from dualhyp_tpu.infer.decode import generate_anchored

    cfg = helpers.tiny_llama_config()
    params = gpt.init(cfg, jax.random.key(4))
    ids = np.zeros((2, 8), np.int32)
    ids[0] = [5, 11, 2, 9, 4, 5, 11, 2]
    ids[1, :6] = [7, 1, 3, 7, 1, 3]
    lengths = jnp.asarray([8, 6], jnp.int32)
    kw = dict(max_new_tokens=8, compute_dtype=jnp.float32,
              kv_quant="int8")
    ref_t, ref_l = generate(params, cfg, jnp.asarray(ids), lengths,
                            temperature=0.2, top_k=1, **kw)
    got_t, got_l = generate_lookup(
        params, cfg, jnp.asarray(ids), lengths, **kw
    )
    anc_t, anc_l = generate_anchored(
        params, cfg, jnp.asarray(ids), lengths,
        jnp.asarray([0, 0], jnp.int32), jnp.asarray([4, 3], jnp.int32),
        **kw
    )
    for got, gl in ((got_t, got_l), (anc_t, anc_l)):
        assert np.array_equal(np.asarray(ref_l), np.asarray(gl))
        for b in range(2):
            n = int(ref_l[b])
            assert np.array_equal(
                np.asarray(ref_t)[b, :n], np.asarray(got)[b, :n]
            )
