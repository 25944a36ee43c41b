"""HF checkpoint conversion + end-to-end logits parity vs transformers.

The strongest parity check available offline: build a tiny random
LlamaForCausalLM (GQA + RMSNorm + SwiGLU + full rotary — TinyLlama's
architecture), convert its weights through our QKV-interleave path
(== scripts/convert_hf_checkpoint.py:188-201 semantics), and require our
forward logits to match the transformers implementation token-for-token.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dualhyp_tpu.ckpt import convert_hf
from dualhyp_tpu.models import gpt
from tests import helpers


@pytest.fixture(scope="module")
def tiny_hf_llama():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=96,
        hidden_size=64,
        intermediate_size=88,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=2,
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg)
    model.eval()
    return model


def test_interleave_roundtrip(rng):
    cfg = helpers.tiny_llama_config()
    hs, hq, g = cfg.head_size, cfg.n_head, cfg.n_query_groups
    q = rng.normal(size=(hq * hs, cfg.n_embd)).astype(np.float32)
    k = rng.normal(size=(g * hs, cfg.n_embd)).astype(np.float32)
    v = rng.normal(size=(g * hs, cfg.n_embd)).astype(np.float32)
    fused = convert_hf.interleave_qkv(q, k, v, cfg)
    assert fused.shape == (cfg.qkv_out_dim, cfg.n_embd)
    q2, k2, v2 = convert_hf.split_qkv(fused, cfg)
    np.testing.assert_array_equal(q, q2)
    np.testing.assert_array_equal(k, k2)
    np.testing.assert_array_equal(v, v2)


@pytest.mark.slow
def test_converted_llama_matches_transformers_logits(tiny_hf_llama):
    hf_model = tiny_hf_llama
    hf_state = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}

    cfg = helpers.tiny_llama_config()  # same shape as the HF config above
    params = convert_hf.convert_llama_family(hf_state, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    ids = np.array([[3, 17, 42, 9, 55, 21, 7, 88, 12, 1]], dtype=np.int64)
    with torch.no_grad():
        want = hf_model(torch.from_numpy(ids)).logits.numpy()

    got = np.asarray(
        gpt.forward(params, cfg, jnp.asarray(ids, jnp.int32), compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got[..., : want.shape[-1]], want, rtol=2e-3, atol=2e-3)

    # greedy continuation must match token-for-token
    hf_seq = ids.copy()
    with torch.no_grad():
        for _ in range(5):
            logits = hf_model(torch.from_numpy(hf_seq)).logits[0, -1]
            nxt = int(torch.argmax(logits))
            hf_seq = np.concatenate([hf_seq, [[nxt]]], axis=1)

    from dualhyp_tpu.infer.decode import generate

    tokens, lengths = generate(
        params,
        cfg,
        jnp.asarray(ids, jnp.int32),
        jnp.asarray([ids.shape[1]], jnp.int32),
        max_new_tokens=5,
        temperature=0.2,
        top_k=1,
        compute_dtype=jnp.float32,
    )
    got_seq = list(np.asarray(tokens)[0][: int(lengths[0])])
    assert got_seq == list(hf_seq[0]), (got_seq, list(hf_seq[0]))


def test_convert_neox_family_runs(rng):
    """Shape-level check of the neox mapping with synthetic tensors."""
    cfg = helpers.tiny_config(n_layer=2, n_head=4, n_embd=32, vocab_size=96)
    L, d, inter, v = 2, 32, cfg.intermediate_size, cfg.padded_vocab_size
    hs = cfg.head_size

    hf = {"gpt_neox.embed_in.weight": rng.normal(size=(96, d)).astype(np.float32),
          "gpt_neox.final_layer_norm.weight": np.ones(d, np.float32),
          "gpt_neox.final_layer_norm.bias": np.zeros(d, np.float32),
          "embed_out.weight": rng.normal(size=(96, d)).astype(np.float32)}
    for i in range(L):
        p = f"gpt_neox.layers.{i}."
        hf[p + "input_layernorm.weight"] = np.ones(d, np.float32)
        hf[p + "input_layernorm.bias"] = np.zeros(d, np.float32)
        hf[p + "post_attention_layernorm.weight"] = np.ones(d, np.float32)
        hf[p + "post_attention_layernorm.bias"] = np.zeros(d, np.float32)
        hf[p + "attention.query_key_value.weight"] = rng.normal(
            size=(3 * d, d)
        ).astype(np.float32)
        hf[p + "attention.query_key_value.bias"] = np.zeros(3 * d, np.float32)
        hf[p + "attention.dense.weight"] = rng.normal(size=(d, d)).astype(np.float32)
        hf[p + "attention.dense.bias"] = np.zeros(d, np.float32)
        hf[p + "mlp.dense_h_to_4h.weight"] = rng.normal(size=(inter, d)).astype(
            np.float32
        )
        hf[p + "mlp.dense_h_to_4h.bias"] = np.zeros(inter, np.float32)
        hf[p + "mlp.dense_4h_to_h.weight"] = rng.normal(size=(d, inter)).astype(
            np.float32
        )
        hf[p + "mlp.dense_4h_to_h.bias"] = np.zeros(d, np.float32)

    params = convert_hf.convert_neox_family(hf, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    logits = gpt.forward(
        params, cfg, jnp.asarray([[1, 2, 3]], jnp.int32), compute_dtype=jnp.float32
    )
    assert logits.shape == (1, 3, v)
    assert bool(jnp.isfinite(logits).all())
