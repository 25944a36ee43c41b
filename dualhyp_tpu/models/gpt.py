"""Decoder-only GPT with GQA, partial RoPE, and PEFT variants — TPU-native.

Capability parity with the reference model stack (ref: ger/model.py,
ger/lora.py, ger/adapter.py, ger/adapter_v2.py, ger/relprompt.py), designed
for XLA rather than translated from torch:

  * parameters are plain pytrees with every per-layer tensor stacked along a
    leading (n_layer, ...) axis; the forward pass is a single `lax.scan` over
    depth (one traced block => fast compiles, clean `jax.checkpoint`
    placement, one sharding rule for all layers)
  * LoRA / adapter weights are extra leaves in the same tree; trainability is
    a pytree mask (see `trainable_mask`), not mutable module state
  * decode uses a fixed-size functional KV cache with per-sequence write
    positions (static shapes; batched, unlike the reference's batch=1 loop)
  * weights keep torch's (out_features, in_features) layout and the fused
    QKV interleaving of the reference checkpoint format, so converted
    checkpoints load with no re-layout (ref: scripts/convert_hf_checkpoint.py:188-201)

Dtype policy: master params float32; matmuls/activations run in
`compute_dtype` (bfloat16 by default); norms and softmax accumulate fp32.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from dualhyp_tpu.ops.linalg import einsum
import numpy as np

from dualhyp_tpu.config import GPTConfig
from dualhyp_tpu.ops import attention as attn_ops
from dualhyp_tpu.ops import rmsnorm as norm_ops
from dualhyp_tpu.ops import rope as rope_ops
from dualhyp_tpu.ops import swiglu as mlp_ops


# ---------------------------------------------------------------------------
# LoRA geometry helpers (fused-QKV layout)
# ---------------------------------------------------------------------------

def lora_qkv_shapes(cfg: GPTConfig):
    """Output-row extents of the enabled q/k/v LoRA deltas.

    Matches the reference arithmetic exactly, including its GQA quirk: the
    delta is laid out as contiguous [q | k | v] blocks over the fused
    projection even though the base fused weight interleaves heads per query
    group (ref: ger/lora.py:226-233 — kv block extent is
    n_embd // q_per_kv). We reproduce the arithmetic so reference-trained
    LoRA checkpoints give identical outputs.
    """
    enable_q, enable_k, enable_v = cfg.enable_lora_qkv
    kv_embd = cfg.n_embd // cfg.q_per_kv
    shapes = (
        cfg.n_embd * enable_q,
        kv_embd * enable_k,
        kv_embd * enable_v,
    )
    return tuple(s for s in shapes if s)


def lora_qkv_row_index(cfg: GPTConfig) -> np.ndarray:
    """Rows of the fused QKV output that receive the LoRA delta
    (ref: ger/lora.py:263-269)."""
    enable_q, enable_k, enable_v = cfg.enable_lora_qkv
    kv_embd = cfg.n_embd // cfg.q_per_kv
    rows = []
    if enable_q:
        rows.extend(range(0, cfg.n_embd))
    if enable_k:
        rows.extend(range(cfg.n_embd, cfg.n_embd + kv_embd))
    if enable_v:
        rows.extend(range(cfg.n_embd + kv_embd, cfg.qkv_out_dim))
    return np.asarray(rows, dtype=np.int32)


# ---------------------------------------------------------------------------
# Parameter initialisation
# ---------------------------------------------------------------------------

def _linear_init(key, out_f, in_f, std):
    return jax.random.normal(key, (out_f, in_f), jnp.float32) * std


def _maybe_bias(out_f, enabled):
    return {"bias": jnp.zeros((out_f,), jnp.float32)} if enabled else {}


def _lora_leaves(key, r, out_f, in_f):
    """A ~ kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(in), 1/sqrt(in)); B = 0
    (ref: ger/lora.py:144-150)."""
    bound = 1.0 / math.sqrt(in_f)
    return {
        "lora_A": jax.random.uniform(key, (r, in_f), jnp.float32, -bound, bound),
        "lora_B": jnp.zeros((out_f, r), jnp.float32),
    }


def _adapter_v2_leaves(out_f):
    return {
        "adapter_scale": jnp.ones((out_f,), jnp.float32),
        "adapter_bias": jnp.zeros((out_f,), jnp.float32),
    }


def _norm_leaves(cfg: GPTConfig, shape):
    leaves = {"scale": jnp.ones(shape, jnp.float32)}
    if cfg.norm_class == "LayerNorm":
        leaves["bias"] = jnp.zeros(shape, jnp.float32)
    return leaves


def init(cfg: GPTConfig, key) -> dict:
    """Random-init parameter tree (normally overwritten by a checkpoint)."""
    keys = iter(jax.random.split(key, 256))
    d, L = cfg.n_embd, cfg.n_layer
    inter = cfg.intermediate_size
    std = math.sqrt(2.0 / 5 / d)  # GPT-NeoX init (ref: ger/model.py:41-55)
    proj_std = 1.0 / math.sqrt(d) / cfg.n_layer
    v = cfg.padded_vocab_size

    def stack(f):
        return jnp.stack([f(k) for k in jax.random.split(next(keys), L)])

    params = {
        "wte": {
            "weight": jax.random.normal(
                next(keys), (cfg.effective_padded_vocab_size, d), jnp.float32
            )
            * std
        },
        "ln_f": _norm_leaves(cfg, (d,)),
    }

    lm_head = {"weight": _linear_init(next(keys), v, d, std)}
    lm_head.update(_maybe_bias(v, cfg.lm_head_bias))
    if cfg.lora_head and cfg.lora_r > 0:
        lm_head.update(_lora_leaves(next(keys), cfg.lora_r, v, d))
    if cfg.use_adapter_v2:
        lm_head.update(_adapter_v2_leaves(v))
    params["lm_head"] = lm_head

    # ---- stacked per-layer params ----
    qkv = {"weight": stack(lambda k: _linear_init(k, cfg.qkv_out_dim, d, std))}
    if cfg.bias:
        qkv["bias"] = jnp.zeros((L, cfg.qkv_out_dim), jnp.float32)
    if cfg.lora_r > 0 and any(cfg.enable_lora_qkv):
        n_enabled = sum(cfg.enable_lora_qkv)
        sum_shapes = sum(lora_qkv_shapes(cfg))
        bound = 1.0 / math.sqrt(d)
        qkv["lora_A"] = jax.random.uniform(
            next(keys), (L, cfg.lora_r * n_enabled, d), jnp.float32, -bound, bound
        )
        qkv["lora_B"] = jnp.zeros((L, sum_shapes, cfg.lora_r), jnp.float32)
    if cfg.use_adapter_v2:
        qkv["adapter_scale"] = jnp.ones((L, cfg.qkv_out_dim), jnp.float32)
        qkv["adapter_bias"] = jnp.zeros((L, cfg.qkv_out_dim), jnp.float32)

    def linear_block(out_f, in_f, init_std, with_lora):
        leaves = {"weight": stack(lambda k: _linear_init(k, out_f, in_f, init_std))}
        if cfg.bias:
            leaves["bias"] = jnp.zeros((L, out_f), jnp.float32)
        if with_lora and cfg.lora_r > 0:
            bound = 1.0 / math.sqrt(in_f)
            leaves["lora_A"] = jax.random.uniform(
                next(keys), (L, cfg.lora_r, in_f), jnp.float32, -bound, bound
            )
            leaves["lora_B"] = jnp.zeros((L, out_f, cfg.lora_r), jnp.float32)
        if cfg.use_adapter_v2:
            leaves["adapter_scale"] = jnp.ones((L, out_f), jnp.float32)
            leaves["adapter_bias"] = jnp.zeros((L, out_f), jnp.float32)
        return leaves

    attn = {
        "qkv": qkv,
        "proj": linear_block(d, d, proj_std, cfg.lora_projection),
    }
    if cfg.use_adapter:
        attn["adapter_wte"] = (
            jax.random.normal(next(keys), (L, cfg.adapter_prompt_length, d)) * std
        )
        attn["gating_factor"] = jnp.zeros((L, cfg.n_head), jnp.float32)

    if cfg.mlp_class in ("LLaMAMLP", "GemmaMLP"):
        mlp = {
            "fc_1": linear_block(inter, d, std, cfg.lora_mlp),
            "fc_2": linear_block(inter, d, std, cfg.lora_mlp),
            "proj": linear_block(d, inter, proj_std, cfg.lora_mlp),
        }
    elif cfg.mlp_class == "GptNeoxMLP":
        mlp = {
            "fc": linear_block(inter, d, std, cfg.lora_mlp),
            "proj": linear_block(d, inter, proj_std, cfg.lora_mlp),
        }
    elif cfg.mlp_class == "LLaMAMoE":
        # Mixtral-style sparse MoE. The reference *declares* LLaMAMoE in its
        # config registry and checkpoint converter but ships no module
        # (ger/config.py:57 vs ger/model.py — Mixtral configs crash there);
        # we implement it: softmax router over n_expert, top
        # n_expert_per_token experts, normalised weights.
        assert cfg.n_expert > 0 and cfg.n_expert_per_token > 0
        e = cfg.n_expert

        def expert_stack(out_f, in_f, init_std):
            return {
                "weight": jnp.stack(
                    [
                        stack(lambda k: _linear_init(k, out_f, in_f, init_std))
                        for _ in range(e)
                    ],
                    axis=1,
                )  # (L, E, out, in)
            }

        mlp = {
            "gate": {"weight": stack(lambda k: _linear_init(k, e, d, std))},
            "fc_1": expert_stack(inter, d, std),
            "fc_2": expert_stack(inter, d, std),
            "proj": expert_stack(d, inter, proj_std),
        }
    else:
        raise NotImplementedError(f"mlp_class {cfg.mlp_class!r}")

    blocks = {
        "norm_1": _norm_leaves(cfg, (L, d)),
        "attn": attn,
        "mlp": mlp,
    }
    if not cfg.shared_attention_norm:
        blocks["norm_2"] = _norm_leaves(cfg, (L, d))
    params["blocks"] = blocks
    return params


# ---------------------------------------------------------------------------
# Functional layers
# ---------------------------------------------------------------------------

def _norm(cfg: GPTConfig, leaves, x):
    if cfg.norm_class == "RMSNorm":
        return norm_ops.rms_norm(x, leaves["scale"], cfg.norm_eps)
    return norm_ops.layer_norm(x, leaves["scale"], leaves["bias"], cfg.norm_eps)


def _dropout(x, rate, rng):
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _base_linear(leaves, x):
    """Plain or int8/int4-quantized linear depending on the leaf set."""
    from dualhyp_tpu.ops import quant

    if quant.Q_KEY in leaves:
        y = quant.qmatmul(x, leaves[quant.Q_KEY], leaves[quant.SCALE_KEY])
        if "bias" in leaves:
            y = y + leaves["bias"].astype(y.dtype)
        return y
    if quant.Q4_KEY in leaves:
        y = quant.q4matmul(x, leaves[quant.Q4_KEY], leaves[quant.SCALE4_KEY])
        if "bias" in leaves:
            y = y + leaves["bias"].astype(y.dtype)
        return y
    return mlp_ops.linear(x, leaves["weight"], leaves.get("bias"))


def _use_fused_lora(leaves) -> bool:
    """Fused LoRA Pallas kernel (opt-in: DUALHYP_LORA_IMPL=fused).

    Measured negative result on v5e-1 (TinyLlama-1.1B train step, mb=6,
    seq 1024): fused 12.1k tok/s/chip at the best tiling
    (bm/bn/bk 1024/512/512; 10.9k at 256/256/512) vs 12.6k for the XLA
    composition — the rank-16 branch rides along for free but the Pallas
    base matmul cannot beat XLA's tuned matmul at these shapes, so the
    default stays XLA (see BENCH_NOTES.md)."""
    import os

    from dualhyp_tpu.ops import backend as _backend
    from dualhyp_tpu.ops import quant

    if quant.Q_KEY in leaves or quant.Q4_KEY in leaves or "lora_A" not in leaves:
        return False
    if os.environ.get("DUALHYP_LORA_IMPL", "xla") != "fused":
        return False
    return _backend.get_backend() == "pallas"


def _apply_linear(cfg: GPTConfig, leaves, x, *, lora_gate=None, rng=None):
    """torch-layout linear with optional LoRA branch and adapter-v2 wrap.

    lora_gate: scalar 0/1 multiplier implementing `lora_start_layer`
    (ref: ger/lora.py:572-581) under the depth scan.
    """
    if _use_fused_lora(leaves):
        from dualhyp_tpu.ops.pallas import lora_kernel

        xin = _dropout(x, cfg.lora_dropout, rng) if (
            rng is not None and cfg.lora_dropout > 0.0
        ) else None
        y = lora_kernel.lora_linear(
            x, leaves["weight"], leaves["lora_A"], leaves["lora_B"],
            cfg.lora_scaling, xin=xin, gate=lora_gate,
        )
        if "bias" in leaves:
            y = y + leaves["bias"].astype(y.dtype)
        if "adapter_scale" in leaves:
            y = (y + leaves["adapter_bias"].astype(y.dtype)) * leaves[
                "adapter_scale"
            ].astype(y.dtype)
        return y
    y = _base_linear(leaves, x)
    if "lora_A" in leaves:
        a = leaves["lora_A"].astype(x.dtype)
        b = leaves["lora_B"].astype(x.dtype)
        xin = _dropout(x, cfg.lora_dropout, rng)
        delta = einsum("...d,rd->...r", xin, a)
        delta = einsum("...r,or->...o", delta, b) * cfg.lora_scaling
        if lora_gate is not None:
            delta = delta * lora_gate
        y = y + delta
    if "adapter_scale" in leaves:
        y = (y + leaves["adapter_bias"].astype(y.dtype)) * leaves[
            "adapter_scale"
        ].astype(y.dtype)
    return y


def _apply_qkv(cfg: GPTConfig, leaves, x, *, lora_gate=None, rng=None):
    """Fused QKV projection with the reference's LoRA arithmetic.

    The LoRA delta computes per-enabled-matrix blocks (the reference's
    grouped-conv1d trick, ref: ger/lora.py:314-347) laid out [q | k | v] and
    scattered into the fused output rows via `lora_qkv_row_index`
    (zero-padding, ref: ger/lora.py:272-312).
    """
    if _use_fused_lora(leaves) and all(cfg.enable_lora_qkv):
        from dualhyp_tpu.ops.pallas import lora_kernel

        b_bd = lora_kernel.lora_qkv_block_b(
            leaves["lora_B"], lora_qkv_shapes(cfg), cfg.lora_r
        )
        xin = _dropout(x, cfg.lora_dropout, rng) if (
            rng is not None and cfg.lora_dropout > 0.0
        ) else None
        y = lora_kernel.lora_linear(
            x, leaves["weight"], leaves["lora_A"], b_bd,
            cfg.lora_scaling, xin=xin, gate=lora_gate,
        )
        if "bias" in leaves:
            y = y + leaves["bias"].astype(y.dtype)
        if "adapter_scale" in leaves:
            y = (y + leaves["adapter_bias"].astype(y.dtype)) * leaves[
                "adapter_scale"
            ].astype(y.dtype)
        return y
    y = _base_linear(leaves, x)
    if "lora_A" in leaves:
        shapes = lora_qkv_shapes(cfg)
        n_enabled = len(shapes)
        r = cfg.lora_r
        a = leaves["lora_A"].astype(x.dtype)  # (n_enabled*r, D)
        b = leaves["lora_B"].astype(x.dtype)  # (sum(shapes), r)
        xin = _dropout(x, cfg.lora_dropout, rng)
        after_a = einsum("...d,rd->...r", xin, a)  # (..., n_enabled*r)
        outs = []
        row = 0
        for i, extent in enumerate(shapes):
            b_i = jax.lax.slice_in_dim(b, row, row + extent, axis=0)
            a_i = after_a[..., i * r : (i + 1) * r]
            outs.append(einsum("...r,or->...o", a_i, b_i))
            row += extent
        delta = jnp.concatenate(outs, axis=-1) * cfg.lora_scaling
        if all(cfg.enable_lora_qkv):
            padded = delta
        else:
            rows = jnp.asarray(lora_qkv_row_index(cfg))
            padded = (
                jnp.zeros(y.shape, y.dtype).at[..., rows].set(delta.astype(y.dtype))
            )
        if lora_gate is not None:
            padded = padded * lora_gate
        y = y + padded.astype(y.dtype)
    if "adapter_scale" in leaves:
        y = (y + leaves["adapter_bias"].astype(y.dtype)) * leaves[
            "adapter_scale"
        ].astype(y.dtype)
    return y


def _split_heads(cfg: GPTConfig, qkv):
    """(B, T, QKV) -> q (B, Hq, T, D), k (B, G, T, D), v (B, G, T, D).

    The fused layout interleaves per query group: [q*q_per_kv, k, v]
    (ref: ger/model.py:215-231)."""
    b, t, _ = qkv.shape
    g, qpk, hs = cfg.n_query_groups, cfg.q_per_kv, cfg.head_size
    qkv = qkv.reshape(b, t, g, qpk + 2, hs)
    q = qkv[:, :, :, :qpk].reshape(b, t, g * qpk, hs).transpose(0, 2, 1, 3)
    k = qkv[:, :, :, qpk].transpose(0, 2, 1, 3)
    v = qkv[:, :, :, qpk + 1].transpose(0, 2, 1, 3)
    return q, k, v


@jax.custom_vjp
def _permute_rows(x, perm, inv):
    """`jnp.take(x, perm, axis=0)` whose BACKWARD is the inverse take.

    `perm` must be a permutation with inverse `inv` (perm[inv] == iota).
    jnp.take's autodiff backward is a scatter-add — XLA cannot know the
    indices are collision-free, and TPU lowers scatter far slower than
    the equivalent gather. For a permutation, d/dx is exactly
    take(g, inv): same values, no scatter."""
    return jnp.take(x, perm, axis=0)


def _permute_rows_fwd(x, perm, inv):
    return jnp.take(x, perm, axis=0), (perm, inv)


def _permute_rows_bwd(res, g):
    perm, inv = res
    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return jnp.take(g, inv, axis=0), f0(perm), f0(inv)


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def _moe_mlp_sparse(cfg: GPTConfig, leaves, x, impl: str = "sparse"):
    """Dropless sparse-compute MoE: tokens sort by assigned expert and each
    expert runs grouped matmuls over its contiguous span. FLOPs scale
    with top-k instead of n_expert — the production path for large expert
    counts. Numerically equivalent to `_moe_mlp` (same top-k softmax
    weights; tested in tests/test_moe.py).

    Grouped-GEMM primitive by DUALHYP_MOE_IMPL:
      * "sparse"   — `jax.lax.ragged_dot` (measured only 1.12x end-to-end
                     on v5e where the FLOP ratio promises 4x,
                     BENCH_NOTES.md)
      * "megablox" — the Pallas megablox `gmm` kernel (TPU only)
    The dense path stays the default because it partitions trivially
    under expert-parallel sharding.
    """
    e, k = cfg.n_expert, cfg.n_expert_per_token
    orig_shape = x.shape
    d = orig_shape[-1]
    xf = x.reshape(-1, d)
    n = xf.shape[0]

    router = einsum(
        "nd,ed->ne", xf, leaves["gate"]["weight"].astype(x.dtype)
    ).astype(jnp.float32)
    top_vals, top_ids = jax.lax.top_k(router, k)  # (N, K)
    weights = jax.nn.softmax(top_vals, axis=-1).astype(x.dtype)

    ef = top_ids.reshape(-1)  # (N*K,) expert per flat slot
    order = jnp.argsort(ef)  # stable: ties keep token order
    # inverse permutation via a 1-D int scatter of iota (cheaper than a
    # second 8k-row bitonic argsort)
    iota = jnp.arange(order.shape[0], dtype=order.dtype)
    inv = jnp.zeros_like(order).at[order].set(iota)
    # (N*K, D) sorted by expert. Row replication goes through an explicit
    # broadcast (backward = a regular sum over k) and the permutation
    # through _permute_rows (backward = the inverse gather) — jnp.take's
    # generic backward is a scatter-add over the (N*K, D) activations,
    # which TPU serializes (measured in the round-4 MoE trace).
    xk_rep = jnp.broadcast_to(xf[:, None, :], (n, k, d)).reshape(n * k, d)
    xr = _permute_rows(xk_rep, order, inv)
    group_sizes = jnp.bincount(ef, length=e).astype(jnp.int32)

    w1 = leaves["fc_1"]["weight"].astype(x.dtype).transpose(0, 2, 1)  # (E,D,O)
    w2 = leaves["fc_2"]["weight"].astype(x.dtype).transpose(0, 2, 1)
    wp = leaves["proj"]["weight"].astype(x.dtype).transpose(0, 2, 1)  # (E,O,D)
    if impl == "megablox":
        import os

        from jax.experimental.pallas.ops.tpu.megablox import gmm as _gmm

        # round-3's 2.8x-slower megablox result came from
        # preferred_element_type=f32: the kernel already accumulates in
        # an f32 VMEM scratch regardless of output dtype (megablox
        # gmm.py acc_scratch), so emitting f32 only doubled the HBM
        # write traffic of the (tokens*k, intermediate) activations and
        # added a full astype pass over them. Emit the compute dtype.
        # Tiling: the (128,128,128) default underfills VMEM at MoE
        # shapes; (512,1024,1024) capped to the problem dims matches the
        # public maxtext recipe for v5e.
        tile_env = os.environ.get("DUALHYP_GMM_TILING")
        base_tile = (
            tuple(int(v) for v in tile_env.split(","))
            if tile_env else (512, 1024, 1024)
        )

        def tile_dim(d, cap):
            # largest multiple-of-128 divisor of d that fits the cap:
            # tiles that divide the problem evenly avoid the padded
            # remainder tile (e.g. intermediate 3584 under a 1024 tile
            # pads 3.5 -> 4 tiles; 896 divides exactly)
            best = 0
            t = 128
            while t <= min(d, cap):
                if d % t == 0:
                    best = t
                t += 128
            return best or min(d, cap)

        def gdot(lhs, rhs, gs):
            m, kd = lhs.shape
            n = rhs.shape[-1]
            tiling = (tile_dim(m, base_tile[0]), tile_dim(kd, base_tile[1]),
                      tile_dim(n, base_tile[2]))
            return _gmm(lhs, rhs.astype(lhs.dtype), gs,
                        preferred_element_type=lhs.dtype, tiling=tiling)
    else:
        # precision=HIGHEST only for f32 operands: this environment
        # defaults matmuls to bf16 even for fp32 (CLAUDE.md), which would
        # break dense-path equivalence — but requesting fp32 contract
        # precision on bf16 operands makes the Mosaic ragged_dot lowering
        # fail ("Bad lhs type"), so bf16 keeps DEFAULT
        prec = (
            jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
        )

        def gdot(lhs, rhs, gs):
            return jax.lax.ragged_dot(lhs, rhs, gs, precision=prec)

    # checkpoint_name tags (inert without a policy): remat='moe' saves
    # xr/g1/g2 across the block's remat boundary so the backward re-runs
    # ZERO forward grouped GEMMs — h recomputes elementwise from g1/g2,
    # and every wgrad/dgrad input is either saved or a backward gmm.
    from jax.ad_checkpoint import checkpoint_name

    xr = checkpoint_name(xr, "moe_xr")
    g1 = checkpoint_name(gdot(xr, w1, group_sizes), "moe_g1")
    g2 = checkpoint_name(gdot(xr, w2, group_sizes), "moe_g2")
    h = jax.nn.silu(g1) * g2
    out = gdot(h, wp, group_sizes)  # (N*K, D)

    out = _permute_rows(out, inv, order).reshape(n, k, d)
    return (out * weights[..., None]).sum(axis=1).reshape(orig_shape)


def _moe_mlp(cfg: GPTConfig, leaves, x):
    """Dense-compute sparse-weight MoE (top-k routing, Mixtral semantics).

    Every expert runs on every token and results combine through the
    (renormalised) top-k router weights — zero-weight experts contribute
    nothing, so outputs equal true sparse routing. Dense compute maps
    cleanly onto the MXU, needs no sort/scatter, and partitions trivially
    under expert-parallel sharding; `_moe_mlp_sparse`
    (DUALHYP_MOE_IMPL=sparse) is the grouped-GEMM path whose FLOPs scale
    with top-k instead of n_expert.
    """
    import os

    impl = os.environ.get("DUALHYP_MOE_IMPL")
    if impl in ("sparse", "megablox"):
        return _moe_mlp_sparse(cfg, leaves, x, impl=impl)
    e, k = cfg.n_expert, cfg.n_expert_per_token
    router = einsum("...d,ed->...e", x, leaves["gate"]["weight"].astype(x.dtype))
    router = router.astype(jnp.float32)
    # build the dense combine weights from the SAME top_k selection the
    # sparse path uses, so router ties break identically (top_k takes
    # exactly k; a `router >= kth` mask could select more on ties)
    top_vals, top_ids = jax.lax.top_k(router, k)  # (..., K)
    top_w = jax.nn.softmax(top_vals, axis=-1)
    onehot = jax.nn.one_hot(top_ids, e, dtype=router.dtype)  # (..., K, E)
    weights = (onehot * top_w[..., None]).sum(axis=-2).astype(x.dtype)

    h1 = einsum("...d,eod->...eo", x, leaves["fc_1"]["weight"].astype(x.dtype))
    h2 = einsum("...d,eod->...eo", x, leaves["fc_2"]["weight"].astype(x.dtype))
    h = jax.nn.silu(h1) * h2
    out = einsum("...eo,edo->...ed", h, leaves["proj"]["weight"].astype(x.dtype))
    return einsum("...ed,...e->...d", out, weights)


def _mlp(cfg: GPTConfig, leaves, x, *, lora_gate=None, rng=None):
    if cfg.mlp_class == "LLaMAMoE":
        return _moe_mlp(cfg, leaves, x)
    rngs = jax.random.split(rng, 3) if rng is not None else (None, None, None)
    if cfg.mlp_class in ("LLaMAMLP", "GemmaMLP"):
        gate = "silu" if cfg.mlp_class == "LLaMAMLP" else "gelu"
        if not any(
            k in leaves["fc_1"]
            for k in ("lora_A", "adapter_scale", "weight_q8", "weight_q4")
        ):
            return mlp_ops.swiglu_mlp(
                x,
                leaves["fc_1"]["weight"],
                leaves["fc_2"]["weight"],
                leaves["proj"]["weight"],
                leaves["fc_1"].get("bias"),
                leaves["fc_2"].get("bias"),
                leaves["proj"].get("bias"),
                gate=gate,
            )
        act = jax.nn.silu if gate == "silu" else (lambda z: jax.nn.gelu(z, approximate=True))
        h1 = _apply_linear(cfg, leaves["fc_1"], x, lora_gate=lora_gate, rng=rngs[0])
        h2 = _apply_linear(cfg, leaves["fc_2"], x, lora_gate=lora_gate, rng=rngs[1])
        h = act(h1) * h2
        return _apply_linear(cfg, leaves["proj"], h, lora_gate=lora_gate, rng=rngs[2])
    # GptNeoxMLP
    h = _apply_linear(cfg, leaves["fc"], x, lora_gate=lora_gate, rng=rngs[0])
    h = jax.nn.gelu(h, approximate=(cfg.gelu_approximate == "tanh"))
    return _apply_linear(cfg, leaves["proj"], h, lora_gate=lora_gate, rng=rngs[1])


def _adapter_attention(cfg: GPTConfig, attn_leaves, q, layer_gate):
    """LLaMA-Adapter v1 prefix attention (ref: ger/adapter.py:116-146).

    q: (B, Hq, T, D) post-RoPE queries. The learned prefix is projected
    through the block's own QKV weights (no RoPE, matching the reference),
    attended with a full (non-causal) mask, and gated per head by the
    zero-initialised gating factor. Returns (B, Hq, T, D)."""
    prefix = attn_leaves["adapter_wte"][None].astype(q.dtype)  # (1, aT, D)
    aqkv = _apply_qkv(cfg, attn_leaves["qkv"], prefix)
    _, ak, av = _split_heads(cfg, aqkv)  # (1, G, aT, D)
    b = q.shape[0]
    ak = jnp.broadcast_to(ak, (b,) + ak.shape[1:])
    av = jnp.broadcast_to(av, (b,) + av.shape[1:])
    ay = _full_prefix_attention(q, ak, av, cfg)
    gating = attn_leaves["gating_factor"].astype(q.dtype)  # (Hq,)
    return ay * gating[None, :, None, None] * layer_gate


def _full_prefix_attention(q, ak, av, cfg: GPTConfig):
    b, hq, t, d = q.shape
    g = ak.shape[1]
    qg = q.reshape(b, g, hq // g, t, d)
    scale = 1.0 / math.sqrt(cfg.head_size)
    logits = einsum(
        "bgqtd,bgsd->bgqts", qg.astype(jnp.float32), ak.astype(jnp.float32)
    ) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = einsum("bgqts,bgsd->bgqtd", probs, av)
    return out.reshape(b, hq, t, d)


# ---------------------------------------------------------------------------
# Block + full forward
# ---------------------------------------------------------------------------

def _block(cfg: GPTConfig, leaves, x, cos, sin, layer_idx, rng=None,
           cache_kv=None, positions=None, kv_length=None, mlp_remat=False):
    """One transformer block. Returns (x, new_cache_kv).

    cache_kv: optional (k, v) of shape (B, G, S, D) for decode; positions:
    (B,) per-sequence write slots; kv_length: (B,) valid-cache extents.
    mlp_remat: rematerialise only the MLP (the widest activations:
    2 x (B, T, intermediate) gate tensors) while keeping attention saved —
    a cheaper memory/recompute point than full-block remat.
    """
    lora_gate = (layer_idx >= cfg.lora_start_layer).astype(x.dtype)
    adapter_gate = (layer_idx >= cfg.adapter_start_layer).astype(x.dtype)
    rngs = jax.random.split(rng, 4) if rng is not None else (None,) * 4

    n1 = _norm(cfg, leaves["norm_1"], x)
    qkv = _apply_qkv(cfg, leaves["attn"]["qkv"], n1, lora_gate=lora_gate, rng=rngs[0])
    q, k, v = _split_heads(cfg, qkv)

    t = x.shape[1]
    if positions is None:
        q = rope_ops.apply_rope(q, cos[:t], sin[:t])
        k = rope_ops.apply_rope(k, cos[:t], sin[:t])
    elif t == 1:
        # per-sequence positions (decode): gather rope rows per batch element
        cos_b = jnp.take(cos, positions, axis=0)[:, None, :]  # (B, 1, n_elem)
        sin_b = jnp.take(sin, positions, axis=0)[:, None, :]
        q = rope_ops.apply_rope(q, cos_b[:, None], sin_b[:, None])
        k = rope_ops.apply_rope(k, cos_b[:, None], sin_b[:, None])
    else:
        # chunked decode (speculative verify): token i sits at positions+i
        pos = positions[:, None] + jnp.arange(t)[None, :]  # (B, T)
        cos_b = jnp.take(cos, pos, axis=0)[:, None]  # (B, 1, T, n_elem)
        sin_b = jnp.take(sin, pos, axis=0)[:, None]
        q = rope_ops.apply_rope(q, cos_b, sin_b)
        k = rope_ops.apply_rope(k, cos_b, sin_b)

    new_cache = None
    if cache_kv is None:
        y = attn_ops.causal_attention(q, k, v)
    else:
        # 2-tuple (k, v): float cache. 4-tuple (k, v, k_scale, v_scale):
        # int8 cache (init_cache(quantize="int8")) — K/V are quantized
        # over D (ops/quant.q8_rows) at the write, the int8 bytes stream
        # through the attention dots via a pure convert, and the
        # per-slot scales fold into the logits / probabilities
        # (ops/attention._dequant_cache) — the whisper-beam zero-copy
        # protocol on the GER decode cache. Rounding beyond the
        # reference's bf16 (which itself exceeds the weights-only bnb
        # surface, ref: ger/utils.py:40-92); opt-in at the decode APIs.
        quant = len(cache_kv) == 4
        if quant:
            ck, cv, ksc, vsc = cache_kv
            from dualhyp_tpu.ops.quant import q8_rows

            k_q, k_sc = q8_rows(k)   # (B, G, T, D) -> scales (B, G, T)
            v_q, v_sc = q8_rows(v)
        else:
            ck, cv = cache_kv
            ksc = vsc = None
            k_q, v_q = k, v
        if positions is not None:
            # scatter this step's k/v into per-sequence slots
            def write(c, new):
                def upd(c_b, new_b, pos_b):
                    return jax.lax.dynamic_update_slice_in_dim(
                        c_b, new_b.astype(c_b.dtype), pos_b, axis=1
                    )
                return jax.vmap(upd)(c, new, positions)
            ck = write(ck, k_q)
            cv = write(cv, v_q)
            if quant:
                ksc = write(ksc, k_sc)
                vsc = write(vsc, v_sc)
            if t == 1:
                y = attn_ops.decode_attention(
                    q, ck, cv, kv_length, k_scale=ksc, v_scale=vsc)
            else:
                y = attn_ops.chunk_decode_attention(
                    q, ck, cv, positions, k_scale=ksc, v_scale=vsc)
        else:
            # prefill: write the whole prompt at slot 0 and run causal
            # attn from the EXACT pre-quantization k/v (decode steps
            # then read the rounded cache — same protocol as the whisper
            # beam's exact prefill + post-hoc prompt quantization)
            ck = jax.lax.dynamic_update_slice(ck, k_q.astype(ck.dtype), (0, 0, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v_q.astype(cv.dtype), (0, 0, 0, 0))
            if quant:
                ksc = jax.lax.dynamic_update_slice(ksc, k_sc, (0, 0, 0))
                vsc = jax.lax.dynamic_update_slice(vsc, v_sc, (0, 0, 0))
            y = attn_ops.causal_attention(q, k, v)
        new_cache = (ck, cv, ksc, vsc) if quant else (ck, cv)

    if cfg.use_adapter and "adapter_wte" in leaves["attn"]:
        y = y + _adapter_attention(cfg, leaves["attn"], q, adapter_gate)

    b = x.shape[0]
    y = y.transpose(0, 2, 1, 3).reshape(b, t, cfg.n_head * cfg.head_size)
    h = _apply_linear(cfg, leaves["attn"]["proj"], y, lora_gate=lora_gate, rng=rngs[1])

    def mlp_call(lv, h_in, g, r):
        return _mlp(cfg, lv, h_in, lora_gate=g, rng=r)

    if mlp_remat:
        mlp_call = jax.checkpoint(mlp_call)

    if cfg.parallel_residual:
        n2 = n1 if cfg.shared_attention_norm else _norm(cfg, leaves["norm_2"], x)
        x = x + h + mlp_call(leaves["mlp"], n2, lora_gate, rngs[2])
    else:
        x = x + h
        n2 = _norm(cfg, leaves["norm_2"], x)
        x = x + mlp_call(leaves["mlp"], n2, lora_gate, rngs[3])
    return x, new_cache


def rope_cache(cfg: GPTConfig, dtype=jnp.bfloat16):
    return rope_ops.build_rope_cache(
        cfg.block_size,
        cfg.rope_n_elem,
        base=cfg.rope_base,
        condense_ratio=cfg.rope_condense_ratio,
        dtype=dtype,
    )


def _embed(cfg: GPTConfig, params, idx, compute_dtype):
    x = jnp.take(params["wte"]["weight"], idx, axis=0).astype(compute_dtype)
    if cfg.scale_embeddings:
        x = x * jnp.asarray(math.sqrt(cfg.n_embd), compute_dtype)
    return x


def _head(cfg: GPTConfig, params, x, rng=None):
    return _apply_linear(cfg, params["lm_head"], x, rng=rng)


def forward(
    params: dict,
    cfg: GPTConfig,
    idx,
    *,
    rng=None,
    compute_dtype=jnp.bfloat16,
    remat=False,  # False | True/'full' (whole block) | 'mlp' (MLP only)
    return_hidden: bool = False,
):
    """Training / evaluation forward pass (no cache). idx: (B, T) int32.

    Returns logits (B, T, padded_vocab) in float32, or the final hidden
    states when `return_hidden` (for fused chunked cross entropy).
    """
    b, t = idx.shape
    assert t <= cfg.block_size, f"sequence {t} exceeds block_size {cfg.block_size}"
    x = _embed(cfg, params, idx, compute_dtype)
    cos, sin = rope_cache(cfg, compute_dtype)

    layer_ids = jnp.arange(cfg.n_layer)
    rngs = jax.random.split(rng, cfg.n_layer) if rng is not None else None

    def body(carry, scanned):
        if rngs is None:
            leaves, lid = scanned
            layer_rng = None
        else:
            leaves, lid, layer_rng = scanned
        out, _ = _block(cfg, leaves, carry, cos, sin, lid, rng=layer_rng,
                        mlp_remat=(remat == "mlp"))
        return out, None

    if remat == "moe":
        # full-block remat EXCEPT the MoE grouped-GEMM outputs: saving
        # xr/g1/g2 (~130 MB/layer at the 8-expert bench shapes) means the
        # backward re-runs zero forward gmm calls (the dense-path names
        # simply never appear, so this degrades to full remat there)
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "moe_xr", "moe_g1", "moe_g2"
            ),
        )
    elif remat is True or remat == "full":
        body = jax.checkpoint(body)

    xs = (params["blocks"], layer_ids) if rngs is None else (
        params["blocks"], layer_ids, rngs
    )
    x, _ = jax.lax.scan(body, x, xs)

    x = _norm(cfg, params["ln_f"], x)
    if return_hidden:
        return x
    return _head(cfg, params, x).astype(jnp.float32)


# ---------------------------------------------------------------------------
# KV-cache decode path
# ---------------------------------------------------------------------------

def init_cache(cfg: GPTConfig, batch_size: int, max_seq: int, dtype=jnp.bfloat16,
               quantize=None):
    """Fixed-size per-layer KV cache stacked over depth: (L, B, G, S, D).

    Stores only the `n_query_groups` KV heads (the reference expands to all
    query heads before caching, ref: ger/model.py:132-151 — storing groups
    cuts cache HBM by q_per_kv x).

    quantize="int8": int8 K/V with per-(layer, row, group, slot) f32
    scales ("k_scale"/"v_scale", (L, B, G, S)) — halves the decode
    steps' cache stream (the whisper-beam zero-copy protocol: scales
    fold out of both attention contractions, ops/attention). Outputs
    may shift within quantization rounding; opt-in."""
    shape = (cfg.n_layer, batch_size, cfg.n_query_groups, max_seq, cfg.head_size)
    if quantize is None:
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if quantize != "int8":
        raise ValueError(f"unsupported KV-cache quantization: {quantize}")
    return {
        "k": jnp.zeros(shape, jnp.int8),
        "v": jnp.zeros(shape, jnp.int8),
        "k_scale": jnp.zeros(shape[:-1], jnp.float32),
        "v_scale": jnp.zeros(shape[:-1], jnp.float32),
    }


def _cache_xs(cache: dict) -> tuple:
    """Per-layer scan xs for the cache dict (float: (k, v); int8:
    (k, v, k_scale, v_scale)) — _block's cache_kv tuple order."""
    if "k_scale" in cache:
        return (cache["k"], cache["v"], cache["k_scale"], cache["v_scale"])
    return (cache["k"], cache["v"])


def _cache_dict(new_kv: tuple) -> dict:
    out = {"k": new_kv[0], "v": new_kv[1]}
    if len(new_kv) == 4:
        out["k_scale"], out["v_scale"] = new_kv[2], new_kv[3]
    return out


def prefill(
    params: dict,
    cfg: GPTConfig,
    idx,
    lengths,
    cache: dict,
    *,
    compute_dtype=jnp.bfloat16,
):
    """Run the full (right-padded) prompt, fill the cache, and return the
    logits at each sequence's last valid token. idx: (B, T); lengths: (B,).

    Returns (next_logits (B, V) fp32, cache)."""
    b, t = idx.shape
    x = _embed(cfg, params, idx, compute_dtype)
    cos, sin = rope_cache(cfg, compute_dtype)

    layer_ids = jnp.arange(cfg.n_layer)

    def body(carry, scanned):
        leaves, lid = scanned[0], scanned[1]
        out, new_cache = _block(
            cfg, leaves, carry, cos, sin, lid, cache_kv=scanned[2:]
        )
        return out, new_cache

    x, new_kv = jax.lax.scan(
        body, x, (params["blocks"], layer_ids) + _cache_xs(cache)
    )
    x = _norm(cfg, params["ln_f"], x)
    # gather hidden state at the last valid prompt token per sequence
    last = jnp.take_along_axis(
        x, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    logits = _head(cfg, params, last).astype(jnp.float32)
    return logits, _cache_dict(new_kv)


def decode_step(
    params: dict,
    cfg: GPTConfig,
    token,
    positions,
    cache: dict,
    *,
    compute_dtype=jnp.bfloat16,
):
    """One autoregressive step. token: (B,) int32; positions: (B,) int32 slot
    to write (== tokens so far per sequence). Returns (logits (B, V), cache)."""
    x = _embed(cfg, params, token[:, None], compute_dtype)
    cos, sin = rope_cache(cfg, compute_dtype)
    kv_length = positions + 1

    layer_ids = jnp.arange(cfg.n_layer)

    def body(carry, scanned):
        leaves, lid = scanned[0], scanned[1]
        out, new_cache = _block(
            cfg,
            leaves,
            carry,
            cos,
            sin,
            lid,
            cache_kv=scanned[2:],
            positions=positions,
            kv_length=kv_length,
        )
        return out, new_cache

    x, new_kv = jax.lax.scan(
        body, x, (params["blocks"], layer_ids) + _cache_xs(cache)
    )
    x = _norm(cfg, params["ln_f"], x)
    logits = _head(cfg, params, x[:, 0]).astype(jnp.float32)
    return logits, _cache_dict(new_kv)


def verify_step(
    params: dict,
    cfg: GPTConfig,
    tokens,
    start,
    cache: dict,
    *,
    compute_dtype=jnp.bfloat16,
):
    """Chunked decode step for speculative verification.

    Processes K tokens per sequence at positions start..start+K-1 against
    the cache in ONE forward pass — at decode batch sizes the step is
    HBM-bound on weight streaming, so verifying K drafted tokens costs
    about the same as one `decode_step`.

    tokens: (B, K) int32; start: (B,) int32 (slot of tokens[:, 0]).
    Returns (logits (B, K, V) fp32, cache). All K tokens' KVs are written
    into their slots; rejected drafts' entries land beyond the accepted
    length and are overwritten by the next chunk / masked by the
    position-limited attention, so no rollback is needed.
    """
    x = _embed(cfg, params, tokens, compute_dtype)
    cos, sin = rope_cache(cfg, compute_dtype)

    layer_ids = jnp.arange(cfg.n_layer)

    def body(carry, scanned):
        leaves, lid = scanned[0], scanned[1]
        out, new_cache = _block(
            cfg, leaves, carry, cos, sin, lid, cache_kv=scanned[2:],
            positions=start
        )
        return out, new_cache

    x, new_kv = jax.lax.scan(
        body, x, (params["blocks"], layer_ids) + _cache_xs(cache)
    )
    x = _norm(cfg, params["ln_f"], x)
    logits = _head(cfg, params, x).astype(jnp.float32)
    return logits, _cache_dict(new_kv)


# ---------------------------------------------------------------------------
# Trainability masks and adapter filters
# ---------------------------------------------------------------------------

def _path_str(path) -> str:
    return "/".join(
        p.key if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path
    )


def trainable_mask(params: dict, cfg: GPTConfig) -> dict:
    """Pytree of bools: which leaves train.

    Equivalent to the reference's requires_grad marking:
      - LoRA: leaves named lora_* (ref: ger/lora.py:405-439)
      - adapter v1: adapter_wte / gating_factor (ref: ger/adapter.py:158-165)
      - adapter v2: + adapter_scale/adapter_bias + all norms
        (ref: ger/adapter_v2.py:31-43)
      - RelPrompt: + noise classifier subtrees + appended embedding rows
        (ref: ger/relprompt.py:79-119)
    """

    def leaf_trainable(path, leaf):
        p = _path_str(path)
        if "lora_A" in p or "lora_B" in p:
            return True
        if cfg.use_adapter and ("adapter_wte" in p or "gating_factor" in p):
            return True
        if cfg.use_adapter_v2 and (
            "adapter_scale" in p
            or "adapter_bias" in p
            or "norm_1" in p
            or "norm_2" in p
            or p.startswith("ln_f")
        ):
            return True
        if "noise_classifier" in p or "audio_proj" in p or "visual_proj" in p:
            return True
        return False

    return jax.tree_util.tree_map_with_path(leaf_trainable, params)


def full_finetune_mask(params: dict) -> dict:
    return jax.tree_util.tree_map(lambda _: True, params)


def adapter_only(params: dict, cfg: GPTConfig) -> dict:
    """Subtree of PEFT-only weights (== lora_filter/adapter_filter checkpoint
    dicts, ref: ger/lora.py:442, ger/adapter.py:164)."""
    mask = trainable_mask(params, cfg)
    return jax.tree_util.tree_map(
        lambda leaf, m: leaf if m else None, params, mask
    )


def merge_lora(params: dict, cfg: GPTConfig) -> dict:
    """Fold LoRA deltas into base weights (ref: ger/lora.py:349-365,707-711).

    Returns a new tree whose lora_B leaves are zeroed (so forward output is
    unchanged whether or not the lora branch is applied afterwards).
    Respects `lora_start_layer` gating.
    """
    new = jax.tree_util.tree_map(lambda x: x, params)  # shallow-copy leaves

    def gate_vec(extra_dims):
        g = (np.arange(cfg.n_layer) >= cfg.lora_start_layer).astype(np.float32)
        return jnp.asarray(g).reshape((cfg.n_layer,) + (1,) * extra_dims)

    def merge_plain(leaves):
        if "lora_A" not in leaves:
            return leaves
        a, b = leaves["lora_A"], leaves["lora_B"]
        if a.ndim == 3:  # stacked (L, r, in)
            delta = einsum("lor,lri->loi", b, a) * cfg.lora_scaling
            delta = delta * gate_vec(2)
        else:
            delta = (b @ a) * cfg.lora_scaling
        out = dict(leaves)
        out["weight"] = leaves["weight"] + delta
        out["lora_B"] = jnp.zeros_like(b)
        return out

    def merge_qkv(leaves):
        if "lora_A" not in leaves:
            return leaves
        shapes = lora_qkv_shapes(cfg)
        r = cfg.lora_r
        a, b = leaves["lora_A"], leaves["lora_B"]  # (L, n*r, in), (L, sum, r)
        outs = []
        row = 0
        for i, extent in enumerate(shapes):
            b_i = b[:, row : row + extent]
            a_i = a[:, i * r : (i + 1) * r]
            outs.append(einsum("lor,lri->loi", b_i, a_i))
            row += extent
        delta = jnp.concatenate(outs, axis=1) * cfg.lora_scaling
        if not all(cfg.enable_lora_qkv):
            rows = jnp.asarray(lora_qkv_row_index(cfg))
            full = jnp.zeros_like(leaves["weight"])
            delta = full.at[:, rows].set(delta)
        delta = delta * gate_vec(2)
        out = dict(leaves)
        out["weight"] = leaves["weight"] + delta
        out["lora_B"] = jnp.zeros_like(b)
        return out

    blocks = dict(new["blocks"])
    attn = dict(blocks["attn"])
    attn["qkv"] = merge_qkv(dict(attn["qkv"]))
    attn["proj"] = merge_plain(dict(attn["proj"]))
    blocks["attn"] = attn
    mlp = {k: merge_plain(dict(v)) for k, v in blocks["mlp"].items()}
    blocks["mlp"] = mlp
    new["blocks"] = blocks
    if "lora_A" in new["lm_head"]:
        new["lm_head"] = merge_plain(dict(new["lm_head"]))
    return new


def count_params(params, mask=None):
    leaves = jax.tree_util.tree_leaves(params)
    if mask is None:
        return sum(int(np.prod(l.shape)) for l in leaves)
    flags = jax.tree_util.tree_leaves(mask)
    return sum(int(np.prod(l.shape)) for l, m in zip(leaves, flags) if m)
