import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.models import gpt
from dualhyp_tpu.ops import quant
from tests import helpers


def test_quantize_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    q, scale = quant.quantize_weight(w)
    assert q.dtype == jnp.int8 and scale.shape == (64, 1)
    deq = quant.dequantize_weight(q, scale)
    # max error bounded by half a quantization step per row
    step = np.asarray(scale)[:, 0]
    err = np.abs(np.asarray(deq) - np.asarray(w)).max(axis=-1)
    assert (err <= step * 0.5 + 1e-7).all()


def test_qmatmul_close_to_fp(rng):
    x = jnp.asarray(rng.normal(size=(3, 7, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    q, scale = quant.quantize_weight(w)
    got = np.asarray(quant.qmatmul(x, q, scale))
    want = np.asarray(x) @ np.asarray(w).T
    # int8 dynamic quantization: relative error ~1%
    denom = np.abs(want).mean()
    assert np.abs(got - want).mean() / denom < 0.02


def test_quantized_model_forward_close(rng):
    cfg = helpers.tiny_llama_config(
        n_embd=256, n_head=8, n_query_groups=2, intermediate_size=512,
        vocab_size=96, padding_multiple=16,
    )
    params = gpt.init(cfg, jax.random.key(0))
    idx = jnp.asarray(np.arange(12)[None] % cfg.vocab_size, jnp.int32)
    want = np.asarray(gpt.forward(params, cfg, idx, compute_dtype=jnp.float32))

    qparams = quant.quantize_tree(params)
    # big matmul weights quantized; embeddings and norms untouched
    assert quant.Q_KEY in qparams["blocks"]["attn"]["qkv"]
    assert "weight" in qparams["wte"]
    assert "weight" not in qparams["blocks"]["attn"]["qkv"]

    got = np.asarray(gpt.forward(qparams, cfg, idx, compute_dtype=jnp.float32))
    # argmax predictions should essentially agree on a random tiny model
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree >= 0.9, agree
    cos = (got * want).sum() / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.99, cos


def test_int8_decode_agrees_with_fp(rng):
    """Greedy decode with int8 weights should mostly agree token-wise."""
    from dualhyp_tpu.infer.decode import generate

    cfg = helpers.tiny_llama_config(
        n_embd=256, n_head=8, n_query_groups=2, intermediate_size=512,
        vocab_size=96, padding_multiple=16,
    )
    params = gpt.init(cfg, jax.random.key(3))
    qparams = quant.quantize_tree(params)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(2, 8)).astype(np.int32))
    lengths = jnp.asarray([8, 8], jnp.int32)
    kw = dict(max_new_tokens=8, temperature=0.2, top_k=1, compute_dtype=jnp.float32)
    t_fp, _ = generate(params, cfg, ids, lengths, **kw)
    t_q, _ = generate(qparams, cfg, ids, lengths, **kw)
    agree = (np.asarray(t_fp) == np.asarray(t_q)).mean()
    assert agree >= 0.8, agree


def test_int4_roundtrip_groupwise(rng):
    from dualhyp_tpu.ops import quant

    w = rng.normal(size=(64, 512)).astype(np.float32)
    packed, scale = quant.quantize_weight_int4(jnp.asarray(w))
    assert packed.shape == (64, 256) and packed.dtype == jnp.int8
    assert scale.shape == (64, 512 // quant.INT4_GROUP)
    deq = np.asarray(quant.dequantize_weight_int4(packed, scale))
    # max error bounded by half an int4 step per group
    step = np.repeat(np.asarray(scale), quant.INT4_GROUP, axis=1)
    assert np.all(np.abs(deq - w) <= step * 0.5 + 1e-7)


def test_q4matmul_close_to_fp(rng):
    from dualhyp_tpu.ops import quant

    w = rng.normal(size=(64, 512)).astype(np.float32) * 0.05
    x = rng.normal(size=(3, 512)).astype(np.float32)
    packed, scale = quant.quantize_weight_int4(jnp.asarray(w))
    got = np.asarray(quant.q4matmul(jnp.asarray(x), packed, scale))
    want = x @ w.T
    # symmetric int4 on gaussian weights: step = absmax/7 ~ 3sigma/7, so
    # the expected relative noise is ~(step/sqrt(12))/sigma ~ 12%
    assert np.mean(np.abs(got - want)) / np.mean(np.abs(want)) < 0.15


def test_int4_model_forward_and_decode(rng):
    """quantize_tree(mode='int4') end to end: forward close to fp and the
    greedy decoder runs (int4 is lossy; token agreement is model-dependent
    and validated per checkpoint, unlike int8)."""
    from dualhyp_tpu.infer.decode import generate
    from dualhyp_tpu.models import gpt
    from dualhyp_tpu.ops import quant
    from tests import helpers

    cfg = helpers.tiny_llama_config(
        n_embd=256, n_head=8, n_query_groups=2, intermediate_size=512,
        vocab_size=384, padding_multiple=128,
    )
    params = gpt.init(cfg, jax.random.key(0))
    qparams = quant.quantize_tree(params, mode="int4")
    assert "weight_q4" in qparams["blocks"]["attn"]["qkv"]
    idx = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 12)), jnp.int32)
    fp = np.asarray(gpt.forward(params, cfg, idx, compute_dtype=jnp.float32))
    q4 = np.asarray(gpt.forward(qparams, cfg, idx, compute_dtype=jnp.float32))
    assert np.isfinite(q4).all()
    # logits stay correlated with the fp model (lossy but sane)
    corr = np.corrcoef(fp.ravel(), q4.ravel())[0, 1]
    assert corr > 0.9, corr

    toks, lens = generate(
        qparams, cfg, idx, jnp.asarray([12, 12], jnp.int32),
        max_new_tokens=4, temperature=0.2, top_k=1,
        compute_dtype=jnp.float32,
    )
    assert np.asarray(lens).min() >= 12


def test_int4_pallas_kernel_matches_xla(rng):
    """Fused dequant+matmul kernel (interpret mode on CPU) == the XLA
    dequant path, across shapes incl. padding remainders."""
    from dualhyp_tpu.ops import quant
    from dualhyp_tpu.ops.pallas import int4_kernel

    for out_d, in_d in [(320, 640), (256, 2048), (100, 512)]:
        w = rng.normal(size=(out_d, in_d)).astype(np.float32) * 0.05
        x = rng.normal(size=(5, in_d)).astype(np.float32)
        packed, scale = quant.quantize_weight_int4(jnp.asarray(w))
        ref = x @ np.asarray(quant.dequantize_weight_int4(packed, scale)).T
        got = np.asarray(
            int4_kernel.q4_matmul(jnp.asarray(x), packed, scale)
        )
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_int8_whisper_decode_step_close(rng):
    """Quantized whisper decoder (the make_json_asr `quantize` option):
    decode_step_cached logits stay correlated with full precision, and
    the device beam runs end-to-end on the quantized tree."""
    from dualhyp_tpu.infer.whisper_device_beam import device_beam_search
    from dualhyp_tpu.models import whisper as w

    dec_cfg = w.WhisperDecoderConfig(
        n_vocab=512, n_ctx=16, n_state=256, n_head=4, n_layer=2
    )
    dec = w.init_decoder(dec_cfg, jax.random.key(0))
    qdec = quant.quantize_tree(dec)
    # the big stacked linears quantize; the embedding tables stay raw
    assert quant.Q_KEY in qdec["blocks"]["attn"]["key"]
    assert quant.Q_KEY in qdec["blocks"]["mlp"]["fc1"]
    assert isinstance(qdec["token_embedding"], jnp.ndarray)

    feats = jnp.asarray(rng.normal(size=(1, 8, 256)).astype(np.float32))
    cross = w.precompute_cross_kv(dec, dec_cfg, feats)
    qcross = w.precompute_cross_kv(qdec, dec_cfg, feats)
    cache = w.init_self_cache(dec_cfg, 1, 8)
    toks = jnp.asarray([3], jnp.int32)
    logits, _ = w.decode_step_cached(dec, dec_cfg, toks, 0, cache, cross)
    qlogits, _ = w.decode_step_cached(qdec, dec_cfg, toks, 0, cache, qcross)
    fp, q8 = np.asarray(logits).ravel(), np.asarray(qlogits).ravel()
    assert np.isfinite(q8).all()
    corr = np.corrcoef(fp, q8)[0, 1]
    assert corr > 0.99, corr

    hyps = device_beam_search(
        qdec, dec_cfg, feats[0], [3], beam_size=4, eos_id=dec_cfg.n_vocab - 1,
        max_new_tokens=5,
    )
    assert len(hyps) == 4
    assert all(np.isfinite(h.avg_logprob) for h in hyps)
