"""Adapter v1 / v2 variant coverage (ref: ger/adapter.py, ger/adapter_v2.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.models import gpt
from tests import helpers


def _adapter_cfg(**kw):
    return helpers.tiny_llama_config(use_adapter=True, adapter_start_layer=1, **kw)


def test_adapter_v1_zero_gate_is_identity():
    """gating_factor starts at 0 => adapter output == base output
    (zero-init attention, ref: ger/adapter.py:111,148-149)."""
    cfg_base = helpers.tiny_llama_config()
    cfg_ad = _adapter_cfg()
    params = gpt.init(cfg_ad, jax.random.key(0))
    base_params = {
        "wte": params["wte"],
        "ln_f": params["ln_f"],
        "lm_head": params["lm_head"],
        "blocks": {
            k: v for k, v in params["blocks"].items()
        },
    }
    base_blocks_attn = {
        k: v for k, v in params["blocks"]["attn"].items()
        if k not in ("adapter_wte", "gating_factor")
    }
    base_params["blocks"] = dict(params["blocks"])
    base_params["blocks"]["attn"] = base_blocks_attn

    idx = jnp.asarray(np.arange(10)[None] % cfg_ad.vocab_size, jnp.int32)
    out_ad = gpt.forward(params, cfg_ad, idx, compute_dtype=jnp.float32)
    out_base = gpt.forward(base_params, cfg_base, idx, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out_ad), np.asarray(out_base), rtol=1e-5, atol=1e-5
    )


def test_adapter_v1_gate_changes_output_beyond_start_layer():
    cfg = _adapter_cfg()
    params = gpt.init(cfg, jax.random.key(0))
    idx = jnp.asarray(np.arange(10)[None] % cfg.vocab_size, jnp.int32)
    base = gpt.forward(params, cfg, idx, compute_dtype=jnp.float32)
    opened = jax.tree_util.tree_map(lambda x: x, params)
    opened["blocks"] = dict(params["blocks"])
    opened["blocks"]["attn"] = dict(params["blocks"]["attn"])
    opened["blocks"]["attn"]["gating_factor"] = (
        jnp.ones_like(params["blocks"]["attn"]["gating_factor"]) * 0.5
    )
    out = gpt.forward(opened, cfg, idx, compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_adapter_v1_trainable_mask():
    cfg = _adapter_cfg()
    params = gpt.init(cfg, jax.random.key(0))
    mask = gpt.trainable_mask(params, cfg)
    flat = {}

    def visit(path, m):
        key = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
        flat[key] = m

    jax.tree_util.tree_map_with_path(visit, mask)
    trainable_keys = sorted(k for k, v in flat.items() if v)
    assert trainable_keys == [
        "blocks/attn/adapter_wte",
        "blocks/attn/gating_factor",
    ]


def test_adapter_v2_identity_at_init_and_mask():
    cfg = helpers.tiny_llama_config(use_adapter_v2=True)
    base_cfg = helpers.tiny_llama_config()
    params = gpt.init(cfg, jax.random.key(0))
    idx = jnp.asarray(np.arange(8)[None] % cfg.vocab_size, jnp.int32)
    out = gpt.forward(params, cfg, idx, compute_dtype=jnp.float32)

    # strip adapter leaves -> same weights through the base config
    def strip(node):
        if isinstance(node, dict):
            return {
                k: strip(v)
                for k, v in node.items()
                if k not in ("adapter_scale", "adapter_bias")
            }
        return node

    base = gpt.forward(strip(params), base_cfg, idx, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), rtol=1e-5, atol=1e-5)

    # trainable: scales/biases + all norms (ref: ger/adapter_v2.py:31-43)
    mask = gpt.trainable_mask(params, cfg)
    flags = []

    def visit(path, m):
        key = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
        flags.append((key, m))

    jax.tree_util.tree_map_with_path(visit, mask)
    trainables = {k for k, m in flags if m}
    assert any("adapter_scale" in k for k in trainables)
    assert any("norm_1" in k for k in trainables)
    assert any(k.startswith("ln_f") for k in trainables)
    assert not any("attn/qkv/weight" in k for k in trainables)


def test_adapter_v2_scale_bias_applied():
    cfg = helpers.tiny_llama_config(use_adapter_v2=True)
    params = gpt.init(cfg, jax.random.key(0))
    idx = jnp.asarray(np.arange(8)[None] % cfg.vocab_size, jnp.int32)
    base = gpt.forward(params, cfg, idx, compute_dtype=jnp.float32)
    mod = jax.tree_util.tree_map(lambda x: x, params)
    mod["blocks"] = dict(params["blocks"])
    mod["blocks"]["attn"] = dict(params["blocks"]["attn"])
    qkv = dict(params["blocks"]["attn"]["qkv"])
    qkv["adapter_scale"] = qkv["adapter_scale"] * 1.1
    mod["blocks"]["attn"]["qkv"] = qkv
    out = gpt.forward(mod, cfg, idx, compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(out), np.asarray(base))
