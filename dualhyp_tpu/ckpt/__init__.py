from dualhyp_tpu.ckpt.io import (
    load_params,
    save_params,
    save_adapter_only,
    load_adapter_over,
)

__all__ = [
    "load_params",
    "save_params",
    "save_adapter_only",
    "load_adapter_over",
]
