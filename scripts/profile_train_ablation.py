"""Train-step time ablation on the real TPU: where do the non-MXU 57% go?

Times (pipelined, 8 iterations, sync at end) at the headline config
(TinyLlama-1.1B LoRA, mb=6, seq 1024, bf16, no remat):

  1. full train step          (loss+grads+optimizer)
  2. grads only               (no optimizer update)
  3. loss only (forward + CE)
  4. forward to hidden only   (no lm_head/CE)
  5. forward, LoRA stripped   (base weights only)
  6. forward, attention replaced by identity
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")

import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.models import gpt
from dualhyp_tpu.ops.cross_entropy import chunked_cross_entropy
from dualhyp_tpu.registry import config_from_name
from dualhyp_tpu.train import TrainConfig, Trainer

MB, SEQ = 6, 1024


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    cfg = config_from_name(
        "tiny-llama-1.1b-chat", lora_r=16, lora_alpha=16, lora_dropout=0.05,
        lora_query=True, lora_key=True, lora_value=True, lora_projection=True,
    )
    params = gpt.init(cfg, jax.random.key(0))
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, (MB, SEQ)).astype(np.int32)
    labels = ids.copy()

    tcfg = TrainConfig(batch_size=MB, micro_batch_size=MB,
                       compute_dtype="bfloat16", lm_head_chunk_size=128)
    # the step donates its trainable buffers, which would alias `params`
    trainer = Trainer(cfg, tcfg, jax.tree_util.tree_map(jnp.copy, params))
    batch = {"input_ids": ids, "labels": labels}

    def full_step():
        loss, _ = trainer.train_step(batch, max_iters=1000, warmup_steps=10,
                                     rng=jax.random.key(1))
        return loss

    t_full = timeit(lambda: full_step(), iters=8)
    tok = MB * SEQ
    print(f"1. full step: {t_full*1e3:7.1f} ms  ({tok/t_full:,.0f} tok/s)")

    # grads only
    grad_fn = jax.jit(
        lambda tr, fr, i, l: jax.grad(trainer._loss)(tr, fr, i, l, None)
    )
    t_grad = timeit(grad_fn, trainer.trainable, trainer.frozen, ids, labels)
    print(f"2. grads only: {t_grad*1e3:6.1f} ms")

    # loss only
    loss_fn = jax.jit(
        lambda tr, fr, i, l: trainer._loss(tr, fr, i, l, None)
    )
    t_loss = timeit(loss_fn, trainer.trainable, trainer.frozen, ids, labels)
    print(f"3. loss fwd+CE: {t_loss*1e3:6.1f} ms")

    # forward to hidden only
    fwd_hidden = jax.jit(
        lambda p, i: gpt.forward(p, cfg, i, compute_dtype=jnp.bfloat16,
                                 return_hidden=True)
    )
    t_hidden = timeit(fwd_hidden, params, jnp.asarray(ids))
    print(f"4. fwd hidden only: {t_hidden*1e3:6.1f} ms")

    # forward without LoRA (strip lora leaves)
    cfg_nolora = config_from_name("tiny-llama-1.1b-chat")
    p_nolora = {
        "wte": params["wte"], "ln_f": params["ln_f"],
        "lm_head": {"weight": params["lm_head"]["weight"]},
        "blocks": jax.tree_util.tree_map(
            lambda x: x,
            {
                "norm_1": params["blocks"]["norm_1"],
                "norm_2": params["blocks"]["norm_2"],
                "attn": {
                    "qkv": {"weight": params["blocks"]["attn"]["qkv"]["weight"]},
                    "proj": {"weight": params["blocks"]["attn"]["proj"]["weight"]},
                },
                "mlp": {
                    "fc_1": {"weight": params["blocks"]["mlp"]["fc_1"]["weight"]},
                    "fc_2": {"weight": params["blocks"]["mlp"]["fc_2"]["weight"]},
                    "proj": {"weight": params["blocks"]["mlp"]["proj"]["weight"]},
                },
            },
        ),
    }
    fwd_nolora = jax.jit(
        lambda p, i: gpt.forward(p, cfg_nolora, i, compute_dtype=jnp.bfloat16,
                                 return_hidden=True)
    )
    t_nolora = timeit(fwd_nolora, p_nolora, jnp.asarray(ids))
    print(f"5. fwd hidden, no LoRA: {t_nolora*1e3:6.1f} ms")

    # CE only from hidden
    hidden = fwd_hidden(params, jnp.asarray(ids))
    head_w = params["lm_head"]["weight"]
    ce_fn = jax.jit(
        lambda h, w, l: chunked_cross_entropy(
            (h @ w.T.astype(h.dtype)).astype(jnp.float32), l, chunk_size=0
        )
    )
    try:
        t_ce = timeit(ce_fn, hidden, head_w, jnp.asarray(labels))
        print(f"6. lm_head+CE from hidden: {t_ce*1e3:6.1f} ms")
    except Exception as exc:
        print(f"6. lm_head+CE: skipped ({exc})")


if __name__ == "__main__":
    main()
