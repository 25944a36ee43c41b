from dualhyp_tpu.train.trainer import TrainConfig, Trainer, lr_at_step

__all__ = ["TrainConfig", "Trainer", "lr_at_step"]
