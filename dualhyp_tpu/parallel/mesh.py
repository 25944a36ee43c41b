"""Device mesh construction.

One mesh with (data, fsdp, tensor, expert) axes replaces the reference's
Lightning strategy selection (DDP / FSDP / XLAStrategy,
ref: finetune/ger.py:60-78):
  * pure DP            -> mesh (n, 1, 1, 1)
  * ZeRO-3-style FSDP  -> mesh (1, n, 1, 1) (params sharded over `fsdp`)
  * tensor parallel    -> `tensor` axis for the >7B registry configs
  * expert parallel    -> `expert` axis shards MoE expert weights; the
    dense-compute top-k combine contracts over experts so XLA psums the
    partial sums (Mixtral-family configs crash in the reference)
  * sequence parallel  -> `seq` axis shards the token dim of activations;
    GSPMD partitions the causal attention (k/v all-gather) and keeps
    norms/MLP local — long-context headroom the reference lacks
The batch shards over data x fsdp; XLA inserts the all-gathers /
reduce-scatters that FSDP does manually in torch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "fsdp", "tensor", "expert", "seq")


def make_mesh(
    data: Optional[int] = None,
    fsdp: int = 1,
    tensor: int = 1,
    expert: int = 1,
    seq: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model_axes = fsdp * tensor * expert * seq
    if data is None:
        assert n % model_axes == 0, (n, fsdp, tensor, expert, seq)
        data = n // model_axes
    assert data * model_axes == n, (
        f"mesh {data}x{fsdp}x{tensor}x{expert}x{seq} != {n} devices"
    )
    grid = np.asarray(devices).reshape(data, fsdp, tensor, expert, seq)
    return Mesh(grid, AXES)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: one call per host before any jax use.

    On TPU pods jax auto-discovers everything (call with no args); args are
    for CPU/GPU multi-process runs. Replaces the NCCL/torch.distributed init
    underneath the reference's Fabric strategies."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
