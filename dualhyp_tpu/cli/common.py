"""Shared CLI plumbing for the finetune / inference entry points.

Mirrors the reference's argparse surface (ref: finetune/ger.py:371-436,
inference/ger.py:127-155) so users migrating from the reference keep their
flags, and adds the TPU-mesh knobs (--dp/--fsdp/--tensor) that replace the
reference's `--d` GPU count + Lightning strategy selection.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def add_model_args(parser: argparse.ArgumentParser):
    parser.add_argument("--llm_checkpoint", type=str,
                        default="checkpoints/TinyLlama/TinyLlama-1.1B-Chat-v1.0")
    parser.add_argument("--lora_r", type=int, default=16)
    parser.add_argument("--lora_alpha", type=int, default=16)
    parser.add_argument("--lora_dropout", type=float, default=0.05)
    parser.add_argument("--lora_query", type=bool, default=True)
    parser.add_argument("--lora_key", type=bool, default=True)
    parser.add_argument("--lora_value", type=bool, default=True)
    parser.add_argument("--lora_projection", type=bool, default=True)
    parser.add_argument("--lora_mlp", type=bool, default=False)
    parser.add_argument("--lora_head", type=bool, default=False)
    parser.add_argument("--mode", type=str, default="lora",
                        choices=["lora", "adapter", "adapter_v2", "full"],
                        help="PEFT family: selects trainable leaves at "
                             "finetune time and reconstructs the matching "
                             "model config at inference/serve time")


def add_data_args(parser: argparse.ArgumentParser):
    parser.add_argument("--nhyps_key", type=str, default="nhyps_asr")
    parser.add_argument("--dual_hypotheses", action="store_true")
    parser.add_argument("--max_nhyps", type=int, default=None)
    parser.add_argument("--prompts_format", type=str, default="GER")
    parser.add_argument("--apply_chat_template", action="store_true")
    parser.add_argument("--language", type=str, default=None)
    parser.add_argument("--audio_corruption_disabled", action="store_true")
    parser.add_argument("--visual_corruption_disabled", action="store_true")


def add_mesh_args(parser: argparse.ArgumentParser):
    parser.add_argument("--dp", type=int, default=None,
                        help="data-parallel mesh extent (default: all devices)")
    parser.add_argument("--fsdp", type=int, default=1,
                        help="parameter-sharding mesh extent (ZeRO-3 equivalent)")
    parser.add_argument("--tensor", type=int, default=1,
                        help="tensor-parallel mesh extent (for >7B configs)")
    parser.add_argument("--expert", type=int, default=1,
                        help="expert-parallel mesh extent (MoE configs: "
                             "experts shard over this axis)")
    parser.add_argument("--seq", type=int, default=1,
                        help="sequence-parallel mesh extent (activations "
                             "shard over tokens; long-context headroom)")


def model_config_from_args(args, relprompt: bool = False):
    from dualhyp_tpu.registry import config_from_checkpoint

    checkpoint_dir = Path(args.llm_checkpoint)
    overrides = dict(
        lora_r=args.lora_r,
        lora_alpha=args.lora_alpha,
        lora_dropout=args.lora_dropout,
        lora_query=args.lora_query,
        lora_key=args.lora_key,
        lora_value=args.lora_value,
        lora_projection=args.lora_projection,
        lora_mlp=args.lora_mlp,
        lora_head=args.lora_head,
    )
    # --mode adapter/adapter_v2/full selects the PEFT family on the model
    # config itself: adapter modes drop the LoRA leaves and enable the
    # prefix-attention (+v2 scale/bias) leaves so init/trainable_mask
    # mark the right parameters (ref: finetune/adapter.py:17,
    # finetune/adapter_v2.py:17 pick the variant by module import)
    mode = getattr(args, "mode", "lora")
    if mode in ("adapter", "adapter_v2"):
        overrides.update(
            lora_r=0,
            use_adapter=True,
            use_adapter_v2=(mode == "adapter_v2"),
        )
    elif mode == "full":
        overrides.update(lora_r=0)
    if relprompt:
        overrides.update(use_relprompt=True, n_extra_tokens=3)
    return config_from_checkpoint(checkpoint_dir, **overrides)


def max_input_length_from_checkpoint(checkpoint_dir, default: int = 1024) -> int:
    """(ref: finetune/ger.py:421-425)"""
    cfg_path = Path(checkpoint_dir) / "tokenizer_config.json"
    if cfg_path.is_file():
        with open(cfg_path, encoding="utf-8") as fp:
            tok_cfg = json.load(fp)
        value = tok_cfg.get("model_max_length")
        if isinstance(value, int) and value < 10**9:
            return value
    return default


def load_tokenizer(checkpoint_dir, prefer_transformers: bool = True):
    """HF AutoTokenizer when available (== finetune/ger.py:88), else our
    tokenizers-backed wrapper."""
    if prefer_transformers:
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(
                checkpoint_dir, use_fast=True, padding_side="left"
            )
            if tok.pad_token is None:
                tok.pad_token = tok.eos_token
            if "phi-" in str(checkpoint_dir).lower():
                # phi checkpoints ship the wrong eos in tokenizer_config
                # (ref: finetune/ger.py:119-120)
                tok.eos_token = "<|endoftext|>"
            return tok
        except Exception:
            pass
    from dualhyp_tpu.data.tokenizer import Tokenizer

    return Tokenizer(checkpoint_dir)


def dataset_class_for(args):
    from dualhyp_tpu.data import hypotheses

    if args.dual_hypotheses:
        if args.prompts_format == "RelPrompt":
            return hypotheses.DualHypothesesMaskDataset
        return hypotheses.DualHypothesesDataset
    return hypotheses.HypothesesDataset


def check_valid_checkpoint_dir(checkpoint_dir) -> None:
    """Actionable error listing what's missing (== ger/utils.py:239-270)."""
    checkpoint_dir = Path(checkpoint_dir)
    problems = []
    if not checkpoint_dir.is_dir():
        problems.append(f"checkpoint dir {checkpoint_dir} does not exist")
    else:
        has_weights = (
            (checkpoint_dir / "dualhyp_model.npz").is_file()
            or list(checkpoint_dir.glob("*.safetensors"))
        )
        if not has_weights:
            problems.append(
                "no weights: expected dualhyp_model.npz (converted) or HF "
                "*.safetensors files"
            )
        if not (checkpoint_dir / "tokenizer.json").is_file() and not (
            checkpoint_dir / "tokenizer_config.json"
        ).is_file():
            problems.append("no tokenizer files (tokenizer.json / tokenizer_config.json)")
    if problems:
        raise FileNotFoundError(
            f"invalid checkpoint dir {str(checkpoint_dir)!r}:\n  - "
            + "\n  - ".join(problems)
            + "\n\nDownload + convert one with:\n  python -m dualhyp_tpu.cli."
            f"download --repo_id <org>/<name>"
        )


def load_base_params(checkpoint_dir, cfg):
    """Converted base weights if present; otherwise convert on the fly;
    otherwise random init with a warning."""
    import jax

    from dualhyp_tpu.ckpt.io import load_params
    from dualhyp_tpu.models import gpt

    checkpoint_dir = Path(checkpoint_dir)
    npz = checkpoint_dir / "dualhyp_model.npz"
    if npz.is_file():
        loaded = load_params(npz)
        params = gpt.init(cfg, jax.random.key(1337))
        return _overlay(params, loaded)
    if list(checkpoint_dir.glob("*.safetensors")):
        from dualhyp_tpu.ckpt.convert_hf import convert_hf_checkpoint

        loaded = convert_hf_checkpoint(checkpoint_dir, cfg.name)
        params = gpt.init(cfg, jax.random.key(1337))
        return _overlay(params, loaded)
    print(f"WARNING: no weights found under {checkpoint_dir}; random init")
    return gpt.init(cfg, jax.random.key(1337))


def _overlay(params: dict, loaded: dict) -> dict:
    """strict=False load: loaded leaves replace same-path init leaves
    (missing LoRA/adapter leaves keep their init, ref: finetune/ger.py:122-124)."""
    import numpy as np

    def merge(init_node, loaded_node, path=""):
        if not isinstance(init_node, dict):
            arr = np.asarray(loaded_node)
            if tuple(arr.shape) != tuple(init_node.shape):
                raise ValueError(
                    f"shape mismatch at {path}: ckpt {arr.shape} vs model "
                    f"{tuple(init_node.shape)}"
                )
            return arr.astype(np.asarray(init_node).dtype)
        out = {}
        for key, child in init_node.items():
            if isinstance(loaded_node, dict) and key in loaded_node:
                out[key] = merge(child, loaded_node[key], f"{path}/{key}")
            else:
                out[key] = child
        return out

    return merge(params, loaded)
