"""HF checkpoint -> dualhyp_tpu parameter tree.

Replaces scripts/convert_hf_checkpoint.py + scripts/download.py of the
reference. Key transform: the separate HF q/k/v projections interleave into
one fused per-group QKV weight — per query group, q_per_kv query-head row
blocks then one K then one V block (ref: scripts/convert_hf_checkpoint.py:188-201)
— and per-layer tensors stack along a leading (n_layer, ...) axis for the
scan-over-depth forward.

Reads .safetensors shards directly via safetensors.numpy (no torch, no
pickle); memory stays bounded by one shard.

Supported families this round: llama-style (TinyLlama, Llama-2/3, Mistral,
OpenLLaMA, Vicuna...) and gpt-neox-style (Pythia, Dolly, RedPajama).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict

import numpy as np

from dualhyp_tpu.config import GPTConfig
from dualhyp_tpu.registry import config_from_name


def interleave_qkv(q: np.ndarray, k: np.ndarray, v: np.ndarray,
                   cfg: GPTConfig) -> np.ndarray:
    """Separate (out, in) q/k/v weights -> fused interleaved layout."""
    hs = cfg.head_size
    block = hs * cfg.q_per_kv
    qs = [q[i : i + block] for i in range(0, q.shape[0], block)]
    ks = [k[i : i + hs] for i in range(0, k.shape[0], hs)]
    vs = [v[i : i + hs] for i in range(0, v.shape[0], hs)]
    assert len(qs) == len(ks) == len(vs) == cfg.n_query_groups
    parts = []
    for g in range(cfg.n_query_groups):
        parts.extend((qs[g], ks[g], vs[g]))
    return np.concatenate(parts, axis=0)


def split_qkv(fused: np.ndarray, cfg: GPTConfig):
    """Inverse of interleave_qkv (for exporting back to HF)."""
    hs = cfg.head_size
    per_group = hs * (cfg.q_per_kv + 2)
    qs, ks, vs = [], [], []
    for g in range(cfg.n_query_groups):
        blk = fused[g * per_group : (g + 1) * per_group]
        qs.append(blk[: hs * cfg.q_per_kv])
        ks.append(blk[hs * cfg.q_per_kv : hs * (cfg.q_per_kv + 1)])
        vs.append(blk[hs * (cfg.q_per_kv + 1) :])
    return np.concatenate(qs), np.concatenate(ks), np.concatenate(vs)


def _load_hf_tensors(checkpoint_dir: Path) -> Dict[str, np.ndarray]:
    from safetensors import numpy as st_np

    tensors: Dict[str, np.ndarray] = {}
    shards = sorted(checkpoint_dir.glob("*.safetensors"))
    if not shards:
        raise FileNotFoundError(f"no .safetensors files in {checkpoint_dir}")
    for shard in shards:
        tensors.update(st_np.load_file(str(shard)))
    return tensors


def _pad_vocab(w: np.ndarray, cfg: GPTConfig) -> np.ndarray:
    if w.shape[0] < cfg.padded_vocab_size:
        pad = np.zeros((cfg.padded_vocab_size - w.shape[0],) + w.shape[1:], w.dtype)
        return np.concatenate([w, pad], axis=0)
    return w[: cfg.padded_vocab_size]


def convert_llama_family(hf: Dict[str, np.ndarray], cfg: GPTConfig) -> dict:
    L = cfg.n_layer

    def layer(name, i):
        return hf[f"model.layers.{i}.{name}"]

    qkv = np.stack(
        [
            interleave_qkv(
                layer("self_attn.q_proj.weight", i),
                layer("self_attn.k_proj.weight", i),
                layer("self_attn.v_proj.weight", i),
                cfg,
            )
            for i in range(L)
        ]
    )

    if cfg.mlp_class == "LLaMAMoE":
        # Mixtral: block_sparse_moe.gate + per-expert w1/w3/w2
        # (ref weight-name mapping: scripts/convert_hf_checkpoint.py:140-148)
        e = cfg.n_expert
        mlp = {
            "gate": {
                "weight": np.stack(
                    [layer("block_sparse_moe.gate.weight", i) for i in range(L)]
                )
            },
            "fc_1": {
                "weight": np.stack(
                    [
                        np.stack(
                            [
                                layer(f"block_sparse_moe.experts.{x}.w1.weight", i)
                                for x in range(e)
                            ]
                        )
                        for i in range(L)
                    ]
                )
            },
            "fc_2": {
                "weight": np.stack(
                    [
                        np.stack(
                            [
                                layer(f"block_sparse_moe.experts.{x}.w3.weight", i)
                                for x in range(e)
                            ]
                        )
                        for i in range(L)
                    ]
                )
            },
            "proj": {
                "weight": np.stack(
                    [
                        np.stack(
                            [
                                layer(f"block_sparse_moe.experts.{x}.w2.weight", i)
                                for x in range(e)
                            ]
                        )
                        for i in range(L)
                    ]
                )
            },
        }
    else:
        mlp = None
    wte = _pad_vocab(hf["model.embed_tokens.weight"], cfg)
    lm_head = hf.get("lm_head.weight", hf["model.embed_tokens.weight"])
    params = {
        "wte": {"weight": wte},
        "ln_f": {"scale": hf["model.norm.weight"]},
        "lm_head": {"weight": _pad_vocab(lm_head, cfg)},
        "blocks": {
            "norm_1": {
                "scale": np.stack(
                    [layer("input_layernorm.weight", i) for i in range(L)]
                )
            },
            "norm_2": {
                "scale": np.stack(
                    [layer("post_attention_layernorm.weight", i) for i in range(L)]
                )
            },
            "attn": {
                "qkv": {"weight": qkv},
                "proj": {
                    "weight": np.stack(
                        [layer("self_attn.o_proj.weight", i) for i in range(L)]
                    )
                },
            },
            "mlp": mlp
            if mlp is not None
            else {
                "fc_1": {
                    "weight": np.stack(
                        [layer("mlp.gate_proj.weight", i) for i in range(L)]
                    )
                },
                "fc_2": {
                    "weight": np.stack(
                        [layer("mlp.up_proj.weight", i) for i in range(L)]
                    )
                },
                "proj": {
                    "weight": np.stack(
                        [layer("mlp.down_proj.weight", i) for i in range(L)]
                    )
                },
            },
        },
    }
    return params


def convert_neox_family(hf: Dict[str, np.ndarray], cfg: GPTConfig) -> dict:
    """GPT-NeoX (Pythia etc): HF ships fused QKV in (head, (q,k,v), hs)
    interleaving per head — which IS our per-group layout for MHA."""
    L = cfg.n_layer

    def layer(name, i):
        return hf[f"gpt_neox.layers.{i}.{name}"]

    def norm(name, i, part):
        return layer(f"{name}.{part}", i)

    params = {
        "wte": {"weight": _pad_vocab(hf["gpt_neox.embed_in.weight"], cfg)},
        "ln_f": {
            "scale": hf["gpt_neox.final_layer_norm.weight"],
            "bias": hf["gpt_neox.final_layer_norm.bias"],
        },
        "lm_head": {"weight": _pad_vocab(hf["embed_out.weight"], cfg)},
        "blocks": {
            "norm_1": {
                "scale": np.stack([norm("input_layernorm", i, "weight") for i in range(L)]),
                "bias": np.stack([norm("input_layernorm", i, "bias") for i in range(L)]),
            },
            "norm_2": {
                "scale": np.stack(
                    [norm("post_attention_layernorm", i, "weight") for i in range(L)]
                ),
                "bias": np.stack(
                    [norm("post_attention_layernorm", i, "bias") for i in range(L)]
                ),
            },
            "attn": {
                "qkv": {
                    "weight": np.stack(
                        [layer("attention.query_key_value.weight", i) for i in range(L)]
                    ),
                    "bias": np.stack(
                        [layer("attention.query_key_value.bias", i) for i in range(L)]
                    ),
                },
                "proj": {
                    "weight": np.stack(
                        [layer("attention.dense.weight", i) for i in range(L)]
                    ),
                    "bias": np.stack(
                        [layer("attention.dense.bias", i) for i in range(L)]
                    ),
                },
            },
            "mlp": {
                "fc": {
                    "weight": np.stack(
                        [layer("mlp.dense_h_to_4h.weight", i) for i in range(L)]
                    ),
                    "bias": np.stack(
                        [layer("mlp.dense_h_to_4h.bias", i) for i in range(L)]
                    ),
                },
                "proj": {
                    "weight": np.stack(
                        [layer("mlp.dense_4h_to_h.weight", i) for i in range(L)]
                    ),
                    "bias": np.stack(
                        [layer("mlp.dense_4h_to_h.bias", i) for i in range(L)]
                    ),
                },
            },
        },
    }
    return params


def convert_falcon_family(hf: Dict[str, np.ndarray], cfg: GPTConfig,
                          model_name: str) -> dict:
    """Falcon: fused QKV ships pre-interleaved in the target layout; 7b uses
    one shared norm (parallel residual + shared_attention_norm), 40b/180B
    split ln_attn/ln_mlp (ref: scripts/convert_hf_checkpoint.py:68-100)."""
    L = cfg.n_layer

    def layer(name, i):
        return hf[f"transformer.h.{i}.{name}"]

    def stack(fmt):
        return np.stack([layer(fmt, i) for i in range(L)])

    blocks = {
        "attn": {
            "qkv": {"weight": stack("self_attention.query_key_value.weight")},
            "proj": {"weight": stack("self_attention.dense.weight")},
        },
        "mlp": {
            "fc": {"weight": stack("mlp.dense_h_to_4h.weight")},
            "proj": {"weight": stack("mlp.dense_4h_to_h.weight")},
        },
    }
    if "7b" in model_name:
        blocks["norm_1"] = {
            "scale": stack("input_layernorm.weight"),
            "bias": stack("input_layernorm.bias"),
        }
    else:
        blocks["norm_1"] = {
            "scale": stack("ln_attn.weight"),
            "bias": stack("ln_attn.bias"),
        }
        blocks["norm_2"] = {
            "scale": stack("ln_mlp.weight"),
            "bias": stack("ln_mlp.bias"),
        }
    return {
        "wte": {"weight": _pad_vocab(hf["transformer.word_embeddings.weight"], cfg)},
        "ln_f": {
            "scale": hf["transformer.ln_f.weight"],
            "bias": hf["transformer.ln_f.bias"],
        },
        "lm_head": {"weight": _pad_vocab(hf["lm_head.weight"], cfg)},
        "blocks": blocks,
    }


def convert_phi_family(hf: Dict[str, np.ndarray], cfg: GPTConfig) -> dict:
    """Phi-1.5/2 (separate q/k/v with biases, GELU MLP, single pre-norm with
    parallel residual) — ref: scripts/convert_hf_checkpoint.py:205-280."""
    L = cfg.n_layer

    def layer(name, i):
        return hf[f"model.layers.{i}.{name}"]

    def stack(fmt):
        return np.stack([layer(fmt, i) for i in range(L)])

    qkv_w = np.stack(
        [
            interleave_qkv(
                layer("self_attn.q_proj.weight", i),
                layer("self_attn.k_proj.weight", i),
                layer("self_attn.v_proj.weight", i),
                cfg,
            )
            for i in range(L)
        ]
    )
    qkv_b = np.stack(
        [
            interleave_qkv(
                layer("self_attn.q_proj.bias", i)[:, None],
                layer("self_attn.k_proj.bias", i)[:, None],
                layer("self_attn.v_proj.bias", i)[:, None],
                cfg,
            )[:, 0]
            for i in range(L)
        ]
    )
    return {
        "wte": {"weight": _pad_vocab(hf["model.embed_tokens.weight"], cfg)},
        "ln_f": {
            "scale": hf["model.final_layernorm.weight"],
            "bias": hf["model.final_layernorm.bias"],
        },
        "lm_head": {
            "weight": _pad_vocab(hf["lm_head.weight"], cfg),
            "bias": _pad_vocab(hf["lm_head.bias"][:, None], cfg)[:, 0],
        },
        "blocks": {
            "norm_1": {
                "scale": stack("input_layernorm.weight"),
                "bias": stack("input_layernorm.bias"),
            },
            "attn": {
                "qkv": {"weight": qkv_w, "bias": qkv_b},
                "proj": {
                    "weight": stack("self_attn.dense.weight"),
                    "bias": stack("self_attn.dense.bias"),
                },
            },
            "mlp": {
                "fc": {
                    "weight": stack("mlp.fc1.weight"),
                    "bias": stack("mlp.fc1.bias"),
                },
                "proj": {
                    "weight": stack("mlp.fc2.weight"),
                    "bias": stack("mlp.fc2.bias"),
                },
            },
        },
    }


def convert_hf_checkpoint(checkpoint_dir, model_name: str | None = None,
                          out_path=None, dtype: str | None = None) -> dict:
    """Convert an HF checkpoint dir to our npz format + config JSON."""
    checkpoint_dir = Path(checkpoint_dir)
    name = model_name or checkpoint_dir.name
    cfg = config_from_name(name)
    hf = _load_hf_tensors(checkpoint_dir)
    if any("self_attn.dense" in k for k in hf):
        params = convert_phi_family(hf, cfg)
    elif any(k.startswith("model.layers.") for k in hf):
        params = convert_llama_family(hf, cfg)
    elif any(k.startswith("gpt_neox.") for k in hf):
        params = convert_neox_family(hf, cfg)
    elif any(k.startswith("transformer.h.") for k in hf):
        params = convert_falcon_family(hf, cfg, name)
    else:
        raise NotImplementedError(
            f"unrecognised checkpoint family; keys like {sorted(hf)[:3]}"
        )
    if dtype:
        params = _cast_tree(params, dtype)
    if out_path is not None:
        from dualhyp_tpu.ckpt.io import save_params

        out_path = Path(out_path)
        save_params(out_path, params)
        with open(out_path.parent / "dualhyp_config.json", "w", encoding="utf-8") as fp:
            fp.write(cfg.to_json())
    return params


def _cast_tree(tree, dtype):
    import jax.numpy as jnp

    target = np.dtype(jnp.dtype(dtype).name) if dtype != "bfloat16" else None

    def cast(x):
        if dtype == "bfloat16":
            import ml_dtypes

            return x.astype(ml_dtypes.bfloat16)
        return x.astype(target)

    return _tree_map_np(cast, tree)


def _tree_map_np(fn, tree):
    if isinstance(tree, dict):
        return {k: _tree_map_np(fn, v) for k, v in tree.items()}
    return fn(tree)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint_dir", required=True)
    parser.add_argument("--model_name", default=None)
    parser.add_argument("--out", default=None)
    parser.add_argument("--dtype", default=None)
    args = parser.parse_args()
    out = args.out or str(Path(args.checkpoint_dir) / "dualhyp_model.npz")
    convert_hf_checkpoint(args.checkpoint_dir, args.model_name, out, args.dtype)
    print(f"wrote {out}")
