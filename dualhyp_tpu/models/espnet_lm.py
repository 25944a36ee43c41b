"""ESPnet TransformerLM in JAX (shallow-fusion scorer for joint decoding).

Port of the vendored LM (ref: data/raven/espnet/nets/pytorch_backend/lm/
transformer.py:80-170): token Embedding -> encoder with linear input layer
(Linear -> LayerNorm -> ReLU -> scaled sinusoidal positions) and CAUSAL
self-attention -> Linear vocabulary head. Supplies `lm_logprobs_fn` for
`infer.joint_beam_search` (weights["lm"]).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.models import raven
from dualhyp_tpu.models.raven import _linear


@dataclass(frozen=True)
class EspnetLMConfig:
    n_vocab: int = 1049
    embed_unit: int = 128
    att_unit: int = 256
    head: int = 2
    unit: int = 1024
    layer: int = 4


def lm_logprobs(params: dict, cfg: EspnetLMConfig, tokens):
    """tokens (B, T) -> (B, V) next-token log-probs (for the last position)."""
    enc_cfg = raven.RavenEncoderConfig(
        idim=cfg.embed_unit,
        attention_dim=cfg.att_unit,
        attention_heads=cfg.head,
        linear_units=cfg.unit,
        num_blocks=cfg.layer,
        attn_layer_type="mha",
    )
    emb = jnp.take(params["embed"]["weight"], tokens, axis=0)
    t = tokens.shape[1]
    # 3-D (1, T, T) so _mha cannot misread it as a (B, S) padding mask
    # when the batch size happens to equal T
    causal = jnp.tril(jnp.ones((t, t), bool))[None]
    h = raven.encode(params["encoder"], enc_cfg, emb, mask=causal)
    logits = _linear(params["decoder"], h[:, -1])
    return jax.nn.log_softmax(logits, axis=-1)


def convert_espnet_lm(state: Dict[str, np.ndarray], cfg: EspnetLMConfig) -> dict:
    enc = raven.convert_espnet_encoder(
        state,
        raven.RavenEncoderConfig(
            idim=cfg.embed_unit,
            attention_dim=cfg.att_unit,
            attention_heads=cfg.head,
            linear_units=cfg.unit,
            num_blocks=cfg.layer,
            attn_layer_type="mha",
        ),
        prefix="encoder.",
    )
    return {
        "embed": {"weight": np.asarray(state["embed.weight"])},
        "encoder": enc,
        "decoder": {
            "weight": np.asarray(state["decoder.weight"]),
            "bias": np.asarray(state["decoder.bias"]),
        },
    }
