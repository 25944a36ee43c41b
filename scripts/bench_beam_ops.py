"""Isolate the whisper-beam step's component costs on the real TPU.

Times (pipelined, sync once) the suspected hot spots of the batched
beam step at production shapes (U=8, beam 50, large-v3):

  1. per-row top_k over the 51866-token vocab (k = beam+1)
  2. attention-logits einsum: f32-upcast operands (status quo) vs
     bf16 operands with preferred_element_type=f32 (one MXU pass)
  3. log_softmax over (rows, vocab) f32

Run: python scripts/bench_beam_ops.py
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")

from dualhyp_tpu.ops.linalg import einsum

R, V, K = 400, 51866, 51
U, H, S, D = 8, 20, 1500, 64
ITERS = 32


def _fetch(out):
    """Force the whole dispatch chain: a value fetch is the only sync
    that proved reliable through the tunnel (block_until_ready returned
    instantly-wrong timings in one configuration — see
    bench_whisper_encode.py)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed(name, fn, *args):
    _fetch(fn(*args))  # compile + drain
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fn(*args)
    _fetch(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"  {name:<52s} {dt*1e3:8.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(R, V)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(U, 50, H, 1, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(U, H, S, D)), jnp.bfloat16)

    print(f"top_k / softmax over ({R}, {V}):")
    timed("lax.top_k k=51", jax.jit(lambda x: jax.lax.top_k(x, K)), logits)
    timed("lax.top_k k=1 (argmax ref)",
          jax.jit(lambda x: jax.lax.top_k(x, 1)), logits)
    timed("log_softmax", jax.jit(jax.nn.log_softmax), logits)
    timed("sort full row (upper bound)",
          jax.jit(lambda x: jnp.sort(x, axis=-1)), logits)

    # the PRODUCTION two-stage top-k (don't re-implement: a local copy
    # would drift from what ships)
    from dualhyp_tpu.infer.whisper_device_beam import _row_top_k

    ts = jax.jit(lambda x: _row_top_k(x, K))
    timed("two-stage top_k (chunk max -> gather -> top_k)", ts, logits)
    v1, i1 = jax.lax.top_k(logits, K)
    v2, i2 = ts(logits)
    print(f"  two-stage exact match: vals={bool(jnp.all(v1 == v2))} "
          f"idx={bool(jnp.all(i1 == i2))}")

    print(f"cross-attn logits einsum (u=8, rows 50, heads {H}, S={S}):")
    f32 = jax.jit(lambda a, b: einsum(
        "ubhtd,uhsd->ubhts", a.astype(jnp.float32), b.astype(jnp.float32)))
    bf16acc = jax.jit(lambda a, b: einsum(
        "ubhtd,uhsd->ubhts", a, b, preferred_element_type=jnp.float32))
    t_f32 = timed("f32-upcast operands (status quo)", f32, q, k)
    t_bf = timed("bf16 operands + preferred f32", bf16acc, q, k)
    a, b = jax.block_until_ready(f32(q, k)), jax.block_until_ready(bf16acc(q, k))
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"  max abs diff: {err:.3e}   speedup x{t_f32/t_bf:.2f}")

    # encoder-shaped attention (1500 x 1500)
    qe = jnp.asarray(rng.normal(size=(U, H, S, D)), jnp.bfloat16)
    print(f"encoder attn logits ({U},{H},{S},{S}):")
    f32e = jax.jit(lambda a, b: einsum(
        "bhtd,bhsd->bhts", a.astype(jnp.float32), b.astype(jnp.float32)))
    bfe = jax.jit(lambda a, b: einsum(
        "bhtd,bhsd->bhts", a, b, preferred_element_type=jnp.float32))
    t1 = timed("f32-upcast operands (status quo)", f32e, qe, k)
    t2 = timed("bf16 operands + preferred f32", bfe, qe, k)
    print(f"  speedup x{t1/t2:.2f}")


if __name__ == "__main__":
    main()
