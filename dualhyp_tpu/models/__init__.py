from dualhyp_tpu.models import gpt

__all__ = ["gpt"]
