"""SwiGLU / gated MLPs.

Replaces the reference's LLaMAMLP (silu(x W1) * (x W2)) W3 and the imported
xformers CUDA SwiGLU (ref: ger/model.py:15, 305-316). GemmaMLP uses gelu
gating; GptNeoxMLP is the plain gelu 2-layer MLP (ref: ger/model.py:293-302).

Weights use torch layout (out_features, in_features) so converted reference
checkpoints map 1:1.
"""

from __future__ import annotations

import jax

from dualhyp_tpu.ops.linalg import einsum

from dualhyp_tpu.ops import backend


def _linear(x, w, b=None):
    y = einsum("...d,od->...o", x, w.astype(x.dtype))
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def swiglu_mlp(x, w1, w2, w3, b1=None, b2=None, b3=None, gate: str = "silu"):
    """(silu|gelu)(x @ w1.T) * (x @ w2.T) @ w3.T"""
    if backend.get_backend() == "pallas" and b1 is None and b2 is None and b3 is None:
        from dualhyp_tpu.ops.pallas import swiglu_kernel

        return swiglu_kernel.swiglu_mlp(x, w1, w2, w3, gate)
    act = jax.nn.silu if gate == "silu" else _gelu_tanh
    h = act(_linear(x, w1, b1)) * _linear(x, w2, b2)
    return _linear(h, w3, b3)


def _gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def gelu_mlp(x, w_fc, w_proj, b_fc=None, b_proj=None, approximate: str = "none"):
    """GPT-NeoX MLP: proj(gelu(fc(x))). torch.nn.functional.gelu default is
    the exact (erf) form (ref: ger/model.py:299-302)."""
    h = jax.nn.gelu(_linear(x, w_fc, b_fc), approximate=(approximate == "tanh"))
    return _linear(h, w_proj, b_proj)


def linear(x, w, b=None):
    """Plain torch-layout linear, shared helper."""
    return _linear(x, w, b)
