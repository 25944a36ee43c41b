"""TPU compute ops: Pallas kernels with pure-XLA fallbacks.

Every op here replaces a native CUDA/Triton dependency of the reference
(see SURVEY.md §2.6): flash-attn 2, the rotary_emb CUDA extension,
xformers SwiGLU, torch SDPA, and bitsandbytes quantized matmuls.

The active backend is selected via `set_backend` / the DUALHYP_OPS env var;
`'xla'` uses plain jnp implementations (XLA fuses them well), `'pallas'`
uses the hand-written TPU kernels for the hot ops.
"""

from dualhyp_tpu.ops.backend import get_backend, set_backend, use_backend
from dualhyp_tpu.ops.rmsnorm import rms_norm
from dualhyp_tpu.ops.rope import build_rope_cache, apply_rope
from dualhyp_tpu.ops.attention import causal_attention, decode_attention
from dualhyp_tpu.ops.swiglu import swiglu_mlp
from dualhyp_tpu.ops.cross_entropy import chunked_cross_entropy

__all__ = [
    "get_backend",
    "set_backend",
    "use_backend",
    "rms_norm",
    "build_rope_cache",
    "apply_rope",
    "causal_attention",
    "decode_attention",
    "swiglu_mlp",
    "chunked_cross_entropy",
]
