"""Every registry entry must construct a valid GPTConfig; random
architecture variants must keep forward/decode equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualhyp_tpu.config import GPTConfig
from dualhyp_tpu.models import gpt
from dualhyp_tpu.registry import available_configs, config_from_name


def test_all_registry_entries_construct():
    names = available_configs()
    assert len(names) >= 112
    for name in names:
        cfg = config_from_name(name)
        assert cfg.padded_vocab_size >= cfg.vocab_size
        assert cfg.n_head % cfg.n_query_groups == 0
        assert cfg.qkv_out_dim == (cfg.n_head + 2 * cfg.n_query_groups) * cfg.head_size
        assert 0 < cfg.rope_n_elem <= cfg.head_size or cfg.rotary_percentage == 0


def test_registry_key_families_have_expected_shapes():
    tiny = config_from_name("tiny-llama-1.1b-chat")
    assert (tiny.n_layer, tiny.n_head, tiny.n_embd, tiny.n_query_groups) == (22, 32, 2048, 4)
    assert tiny.norm_class == "RMSNorm" and tiny.mlp_class == "LLaMAMLP"
    assert tiny.intermediate_size == 5632 and tiny.rotary_percentage == 1.0

    pythia = config_from_name("pythia-14m")
    assert pythia.norm_class == "LayerNorm" and pythia.mlp_class == "GptNeoxMLP"

    mixtral = config_from_name("Mixtral-8x7B-v0.1")
    assert mixtral.mlp_class == "LLaMAMoE" and mixtral.n_expert == 8

    llama3 = config_from_name("Llama-3-8B")
    assert llama3.vocab_size > 100_000 and llama3.n_query_groups == 8


ARCH_VARIANTS = [
    dict(n_head=4, n_query_groups=4, rotary_percentage=0.25,
         parallel_residual=True, bias=True, norm_class="LayerNorm",
         mlp_class="GptNeoxMLP"),
    dict(n_head=4, n_query_groups=1, rotary_percentage=0.5,
         parallel_residual=True, bias=False, norm_class="RMSNorm",
         mlp_class="GptNeoxMLP"),  # MQA + partial rotary
    dict(n_head=8, n_query_groups=2, rotary_percentage=1.0,
         parallel_residual=False, bias=False, norm_class="RMSNorm",
         mlp_class="LLaMAMLP", intermediate_size=48),
    dict(n_head=4, n_query_groups=4, rotary_percentage=1.0,
         parallel_residual=True, shared_attention_norm=True, bias=True,
         norm_class="LayerNorm", mlp_class="GptNeoxMLP"),  # falcon-7b style
    dict(n_head=4, n_query_groups=2, rotary_percentage=1.0,
         parallel_residual=False, bias=False, norm_class="RMSNorm",
         mlp_class="GemmaMLP", intermediate_size=48, scale_embeddings=True),
]


@pytest.mark.parametrize("variant", range(len(ARCH_VARIANTS)))
@pytest.mark.slow
def test_architecture_fuzz_decode_equivalence(variant):
    """forward == prefill+decode across GQA/MQA, partial rotary, residual
    styles, norm/MLP classes, embedding scaling."""
    kw = dict(
        name=f"fuzz{variant}",
        block_size=32,
        vocab_size=64,
        padding_multiple=16,
        n_layer=2,
        n_embd=32,
    )
    kw.update(ARCH_VARIANTS[variant])
    cfg = GPTConfig(**kw)
    params = gpt.init(cfg, jax.random.key(variant))
    seq = np.asarray([[5, 9, 3, 7, 2, 8]], np.int32)
    full = np.asarray(
        gpt.forward(params, cfg, jnp.asarray(seq), compute_dtype=jnp.float32)
    )
    assert np.isfinite(full).all()

    cache = gpt.init_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = gpt.prefill(
        params, cfg, jnp.asarray(seq[:, :3]), jnp.asarray([3], jnp.int32),
        cache, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(logits[0]), full[0, 2], rtol=2e-4, atol=2e-4)
    for t in range(3, seq.shape[1]):
        logits, cache = gpt.decode_step(
            params, cfg, jnp.asarray(seq[:, t]), jnp.asarray([t], jnp.int32),
            cache, compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(logits[0]), full[0, t], rtol=2e-4, atol=2e-4
        )
