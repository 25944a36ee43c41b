"""dualhyp_tpu: TPU-native (JAX/XLA/Pallas) generative error correction framework.

A from-scratch rebuild of the capabilities of the DualHyp reference
(sungnyun/dualhyp): a LoRA-finetuned decoder-only LLM corrects N-best
ASR/VSR transcription hypotheses, optionally guided by RelPrompt
reliability masks. See DESIGN.md for the architecture.
"""

from dualhyp_tpu.config import GPTConfig
from dualhyp_tpu.registry import config_from_name, available_configs

__version__ = "0.1.0"

__all__ = ["GPTConfig", "config_from_name", "available_configs", "__version__"]
