"""Decode-latency benchmark: p50 correction latency on the flagship model.

The reference decodes batch=1 with a python-loop sampler
(inference/ger.py:67-94); our decoder is a jitted lax.while_loop over a
batch. Reports per-utterance p50 at several batch sizes (prompt 512 tokens,
150 new — the eval protocol's max_new).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from dualhyp_tpu.infer.decode import generate
from dualhyp_tpu.models import gpt
from dualhyp_tpu.registry import config_from_name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantize", default=None, choices=("int8", "int4"),
                    help="weight quantization")
    ap.add_argument("--kv_quant", default=None, choices=("int8",),
                    help="int8 KV cache (folded-out scales)")
    args = ap.parse_args()
    cfg = config_from_name("tiny-llama-1.1b-chat")
    params = gpt.init(cfg, jax.random.key(0))
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    if args.quantize:
        from dualhyp_tpu.ops.quant import quantize_tree

        params = quantize_tree(params, mode=args.quantize)
    rng = np.random.default_rng(0)
    prompt_len, max_new = 512, 150
    for batch in (1, 8, 16):
        ids = rng.integers(1, cfg.vocab_size, size=(batch, prompt_len)).astype(np.int32)
        lengths = jnp.full((batch,), prompt_len, jnp.int32)
        # warmup/compile
        tokens, total = generate(
            params, cfg, jnp.asarray(ids), lengths,
            max_new_tokens=max_new, temperature=0.2, top_k=1,
            kv_quant=args.kv_quant,
        )
        jax.block_until_ready(tokens)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            tokens, total = generate(
                params, cfg, jnp.asarray(ids), lengths,
                max_new_tokens=max_new, temperature=0.2, top_k=1,
                kv_quant=args.kv_quant,
            )
            jax.block_until_ready(tokens)
            times.append(time.perf_counter() - t0)
        wall = float(np.median(times))
        print(
            f"batch={batch}: wall {wall:.3f}s, per-utterance p50 "
            f"{wall / batch * 1000:.0f}ms, decode {max_new * batch / wall:,.0f} tok/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
