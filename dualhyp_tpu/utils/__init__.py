from dualhyp_tpu.utils.monitor import SpeedMonitor, tpu_peak_flops, estimate_train_flops_per_token
from dualhyp_tpu.utils.logging import StepLogger, setup_run_logger

__all__ = [
    "SpeedMonitor",
    "tpu_peak_flops",
    "estimate_train_flops_per_token",
    "StepLogger",
    "setup_run_logger",
]
