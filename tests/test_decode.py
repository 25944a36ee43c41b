import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.infer import evaluate as ev
from dualhyp_tpu.infer.decode import generate
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
