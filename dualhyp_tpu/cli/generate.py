"""Standalone text generation from a checkpoint (== generate/base.py main).

  python -m dualhyp_tpu.cli.generate --prompt "Hello, my name is" \\
      --llm_checkpoint checkpoints/TinyLlama/TinyLlama-1.1B-Chat-v1.0 \\
      --max_new_tokens 50 --temperature 0.8 --top_k 200

Supports LoRA/adapter checkpoints via --model_path (overlaid strict=False),
optional LoRA merging (--merge_lora) and int8 quantization (--quantize int8,
replacing the reference's bnb/gptq options).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.cli import common


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--prompt", type=str, default="Hello, my name is")
    parser.add_argument("--num_samples", type=int, default=1)
    parser.add_argument("--max_new_tokens", type=int, default=50)
    parser.add_argument("--top_k", type=int, default=200)
    parser.add_argument("--temperature", type=float, default=0.8)
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--merge_lora", action="store_true")
    parser.add_argument("--quantize", choices=[None, "int8"], default=None)
    parser.add_argument("--seed", type=int, default=1234)
    common.add_model_args(parser)
    args = parser.parse_args(argv)

    from dualhyp_tpu.infer.decode import generate
    from dualhyp_tpu.models import gpt

    checkpoint_dir = Path(args.llm_checkpoint)
    tokenizer = common.load_tokenizer(checkpoint_dir)
    cfg = common.model_config_from_args(args)
    params = common.load_base_params(checkpoint_dir, cfg)
    if args.model_path:
        from dualhyp_tpu.ckpt.io import load_params
        from dualhyp_tpu.cli.common import _overlay

        params = _overlay(params, load_params(args.model_path))
    if args.merge_lora and cfg.any_lora:
        params = gpt.merge_lora(params, cfg)
    if args.quantize == "int8":
        from dualhyp_tpu.ops.quant import quantize_tree

        params = quantize_tree(params)

    ids = np.asarray(tokenizer.encode(args.prompt), np.int32)[None]
    lengths = jnp.asarray([ids.shape[1]], jnp.int32)
    rng = jax.random.key(args.seed)
    for i in range(args.num_samples):
        rng, key = jax.random.split(rng)
        t0 = time.perf_counter()
        tokens, total = generate(
            params,
            cfg,
            jnp.asarray(ids),
            lengths,
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature,
            top_k=args.top_k,
            eos_id=getattr(tokenizer, "eos_token_id", None),
            rng=key,
        )
        tokens = np.asarray(jax.block_until_ready(tokens))
        dt = time.perf_counter() - t0
        n_new = int(total[0]) - ids.shape[1]
        print(tokenizer.decode(tokens[0][: int(total[0])]))
        print(
            f"# sample {i}: {n_new} tokens in {dt:.2f}s "
            f"({n_new / max(dt, 1e-9):.1f} tok/s)",
        )


if __name__ == "__main__":
    main()
