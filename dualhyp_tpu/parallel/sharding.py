"""Sharding rules for parameter and batch pytrees.

FSDP equivalence (ref: finetune/ger.py:67-73): stacked per-layer weights are
sharded along their largest non-layer dimension over the `fsdp` mesh axis;
XLA all-gathers them per layer inside the depth scan and reduce-scatters
gradients — the same communication schedule FSDPStrategy runs by hand.

Tensor parallelism (absent in the reference, mesh-native here): attention
QKV/MLP-in shard their output dim and proj/MLP-out shard their input dim
over `tensor`, giving the Megatron column/row pattern with XLA inserting
the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim shards over data x fsdp (fsdp ranks also consume data)."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def _leaf_spec(path: str, leaf, fsdp: int, tensor: int, expert: int = 1) -> P:
    shape = leaf.shape
    ndim = len(shape)
    stacked = path.startswith("blocks/")
    # dims eligible for sharding exclude the stacked layer axis
    first = 1 if stacked else 0

    spec = [None] * ndim

    # MoE expert-stacked weights (L, E, out, in): shard the expert axis —
    # the dense-compute top-k combine contracts over E, so each device
    # computes only its experts and XLA psums the weighted partial sums
    moe_expert = (
        ndim - first == 3
        and any(k in path for k in ("mlp/fc_1", "mlp/fc_2", "mlp/proj"))
    )
    if moe_expert:
        if expert > 1 and shape[first] % expert == 0:
            spec[first] = "expert"
        first += 1  # out/in dims follow the expert axis

    is_tensor_col = tensor > 1 and any(
        k in path for k in ("attn/qkv", "fc_1", "fc_2", "mlp/fc/", "lm_head")
    )
    is_tensor_row = tensor > 1 and ("proj/weight" in path)

    if ndim - first >= 2:
        out_dim, in_dim = first, first + 1  # torch layout (out, in)
        if is_tensor_col:
            spec[out_dim] = "tensor"
        elif is_tensor_row:
            spec[in_dim] = "tensor"
        if fsdp > 1:
            # shard the largest remaining dim over fsdp
            cand = [d for d in range(first, ndim) if spec[d] is None]
            if cand:
                d = max(cand, key=lambda i: shape[i])
                if shape[d] % fsdp == 0:
                    spec[d] = "fsdp"
    elif ndim - first == 1 and fsdp > 1 and shape[-1] % fsdp == 0 and shape[-1] >= 1024:
        spec[-1] = "fsdp"
    return P(*spec)


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a gpt.init-style param tree."""
    fsdp = mesh.shape.get("fsdp", 1)
    tensor = mesh.shape.get("tensor", 1)
    expert = mesh.shape.get("expert", 1)

    def spec_for(path, leaf):
        p = "/".join(
            k.key if hasattr(k, "key") else str(getattr(k, "idx", k)) for k in path
        )
        return NamedSharding(mesh, _leaf_spec(p, leaf, fsdp, tensor, expert))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    shardings = param_shardings(params, mesh)
    return jax.device_put(params, shardings), shardings
