from dualhyp_tpu.parallel.mesh import make_mesh
from dualhyp_tpu.parallel.pipeline import make_pipe_mesh, pipeline_logits
from dualhyp_tpu.parallel.sharding import (
    batch_sharding,
    param_shardings,
    replicated,
    shard_params,
)

__all__ = [
    "make_mesh",
    "make_pipe_mesh",
    "pipeline_logits",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "shard_params",
]
