"""Quantization WER probe (real TPU): train the synthetic-corpus
memorization model (n_embd 256 so its linears pass the quantization size
gate), then decode the same examples with fp32/bf16, int8, and int4
weights and report WER for each — the accuracy evidence behind the
`--quantize` guidance (int8 ~ lossless, int4 validate-before-serving).
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")

import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.config import GPTConfig
from dualhyp_tpu.data import collate, hypotheses, synthetic
from dualhyp_tpu.models import gpt
from dualhyp_tpu.ops.quant import quantize_tree
from dualhyp_tpu.train import TrainConfig, Trainer
from dualhyp_tpu.cli.inference_ger import run_inference
from scripts.bench_spec_decode import make_tokenizer


def main():
    tok, vocab_size = make_tokenizer()
    tmp = Path(tempfile.mkdtemp())
    synthetic.write_json(
        tmp / "train.json",
        synthetic.make_records(n_uids=64, variants_per_uid=1, seed=1),
    )
    cfg = GPTConfig(
        name="quantwer", block_size=768, vocab_size=vocab_size,
        padding_multiple=128, n_layer=4, n_head=8, n_query_groups=2,
        n_embd=256, rotary_percentage=1.0, parallel_residual=False,
        bias=False, norm_class="RMSNorm", mlp_class="LLaMAMLP",
        intermediate_size=512, lora_r=0,
    )
    ds = hypotheses.DualHypothesesDataset(
        "train", str(tmp / "train.json"), tok, prompts_format="DualHyp",
        seed=3, random_sample_nhyps=False,
    )
    params = gpt.init(cfg, jax.random.key(0))
    tcfg = TrainConfig(
        learning_rate=1e-3, batch_size=16, micro_batch_size=16,
        compute_dtype="bfloat16", lm_head_chunk_size=0, mode="full",
    )
    trainer = Trainer(cfg, tcfg, params)
    rng = jax.random.key(7)
    for epoch in range(80):
        for batch in collate.epoch_batches(
            ds, 16, shuffle=True, seed=0, epoch=epoch, buckets=(512,)
        ):
            rng, k = jax.random.split(rng)
            loss, _ = trainer.train_step(
                batch, max_iters=2000, warmup_steps=20, rng=k
            )
    print(f"trained: final loss {float(loss):.4f}", flush=True)

    variants = {
        "bf16": trainer.params,
        "int8": quantize_tree(trainer.params, mode="int8"),
        "int4": quantize_tree(trainer.params, mode="int4"),
    }
    for name, p in variants.items():
        _, metrics = run_inference(
            p, cfg, tok, ds, decode_batch=8, max_new_tokens=20,
            compute_dtype=jnp.bfloat16,
        )
        print(
            f"{name}: WER {metrics['WER']:.4f}, exact {metrics['gtms']:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
