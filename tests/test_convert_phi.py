"""Phi-family conversion parity vs transformers (tiny random PhiForCausalLM)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dualhyp_tpu.ckpt import convert_hf
from dualhyp_tpu.config import GPTConfig
from dualhyp_tpu.models import gpt


def test_converted_phi_matches_transformers_logits(rng):
    from transformers import PhiConfig, PhiForCausalLM

    hf_cfg = PhiConfig(
        vocab_size=96,
        hidden_size=32,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=64,
        partial_rotary_factor=0.5,
        layer_norm_eps=1e-5,
        hidden_act="gelu_new",
        tie_word_embeddings=False,
        attention_dropout=0.0,
        embd_pdrop=0.0,
        resid_pdrop=0.0,
    )
    torch.manual_seed(0)
    model = PhiForCausalLM(hf_cfg)
    model.eval()

    cfg = GPTConfig(
        name="phi-test",
        block_size=64,
        vocab_size=96,
        padding_multiple=16,
        n_layer=2,
        n_head=4,
        n_embd=32,
        rotary_percentage=0.5,
        parallel_residual=True,
        shared_attention_norm=True,
        bias=True,
        lm_head_bias=True,
        norm_class="LayerNorm",
        mlp_class="GptNeoxMLP",
        intermediate_size=128,
        gelu_approximate="tanh",
    )
    hf_state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_hf.convert_phi_family(hf_state, cfg)
    )

    ids = np.asarray([[3, 17, 42, 9, 55, 21, 7, 88]], np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(
        gpt.forward(params, cfg, jnp.asarray(ids, jnp.int32), compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got[..., : want.shape[-1]], want, rtol=3e-3, atol=3e-3)
