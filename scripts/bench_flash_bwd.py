"""Attention fwd+bwd microbenchmark (real TPU): own kernels vs splash vs
XLA at the headline 1.1B training shape, pipelined (one sync for the whole
scan — per-call syncs are meaningless through the axon tunnel).

    python scripts/bench_flash_bwd.py              # one impl (env-selected)
    python scripts/bench_flash_bwd.py --sweep      # impls x block shapes
                                                   # (subprocess per config:
                                                   # blocks are read at
                                                   # import time)
"""

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

SHAPE = dict(b=6, hq=32, g=4, t=1024, d=64)  # TinyLlama-1.1B mb=6 @ 1024
ITERS = 30


def run_one(impl: str) -> float:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")
    import jax.numpy as jnp

    b, hq, g, t, d = (SHAPE[k] for k in ("b", "hq", "g", "t", "d"))
    key = jax.random.key(0)
    kq, kk, kv, kw = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, hq, t, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, g, t, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, g, t, d), jnp.bfloat16)
    w = jax.random.normal(kw, (b, hq, t, d), jnp.bfloat16)

    if impl == "xla":
        from dualhyp_tpu.ops.attention import _causal_attention_xla

        attn = lambda q_, k_, v_: _causal_attention_xla(q_, k_, v_, 0.125)
    elif impl == "own":
        from dualhyp_tpu.ops.pallas import flash_vjp

        attn = lambda q_, k_, v_: flash_vjp.flash_attention(q_, k_, v_, 0.125)
    else:  # splash
        from dualhyp_tpu.ops.pallas import flash_attention as fa

        attn = lambda q_, k_, v_: fa.causal_attention(q_, k_, v_, 0.125)

    def loss(q_, k_, v_):
        return jnp.sum(attn(q_, k_, v_).astype(jnp.float32) *
                       w.astype(jnp.float32))

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def chain(q0, k0, v0):
        def body(carry, _):
            q_, k_, v_ = carry
            dq, dk, dv = grad(q_, k_, v_)
            eps = jnp.bfloat16(1e-4)
            return (q_ + eps * dq.astype(jnp.bfloat16),
                    k_ + eps * dk.astype(jnp.bfloat16),
                    v_ + eps * dv.astype(jnp.bfloat16)), None

        (qf, kf, vf), _ = jax.lax.scan(body, (q0, k0, v0), None, length=ITERS)
        return qf

    out = jax.block_until_ready(chain(q, k, v))  # compile
    t0 = time.perf_counter()
    out = jax.block_until_ready(chain(q, k, v))
    wall = time.perf_counter() - t0
    ms = wall / ITERS * 1e3
    blocks = (os.environ.get("DUALHYP_FLASH_BLOCK_Q", "-"),
              os.environ.get("DUALHYP_FLASH_BLOCK_KV", "-"))
    print(f"{impl:7s} blocks q={blocks[0]:>4s} kv={blocks[1]:>4s}: "
          f"{ms:7.3f} ms / fwd+bwd iter", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default=None,
                    choices=[None, "own", "splash", "xla"])
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()

    if not args.sweep:
        run_one(args.impl or "own")
        return

    for impl in ("xla", "splash"):
        subprocess.run(
            [sys.executable, __file__, "--impl", impl],
            env={**os.environ}, check=False,
        )
    for bq, bkv in ((256, 256), (512, 256), (256, 512), (512, 512),
                    (128, 256), (256, 128), (256, 1024), (128, 128),
                    (128, 512)):
        r = subprocess.run(
            [sys.executable, __file__, "--impl", "own"],
            env={**os.environ,
                 "DUALHYP_FLASH_BLOCK_Q": str(bq),
                 "DUALHYP_FLASH_BLOCK_KV": str(bkv)},
            check=False,
        )
        if r.returncode:
            print(f"own blocks q={bq} kv={bkv}: FAILED (likely VMEM)",
                  flush=True)


if __name__ == "__main__":
    main()
