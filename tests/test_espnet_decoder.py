import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dualhyp_tpu.models import espnet_decoder as ed

_REF = Path("/root/reference/data/raven")
if (_REF / "espnet").is_dir() and str(_REF) not in sys.path:
    sys.path.insert(0, str(_REF))

requires_espnet = pytest.mark.skipif(
    not (_REF / "espnet").is_dir(), reason="vendored espnet unavailable"
)


@requires_espnet
def test_decoder_matches_espnet(rng):
    from espnet.nets.pytorch_backend.transformer.decoder import Decoder
    from espnet.nets.pytorch_backend.transformer.mask import subsequent_mask

    torch.manual_seed(0)
    dec = Decoder(
        odim=40,
        attention_dim=32,
        attention_heads=4,
        linear_units=64,
        num_blocks=2,
        dropout_rate=0.0,
        positional_dropout_rate=0.0,
        self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0,
    )
    dec.eval()

    cfg = ed.EspnetDecoderConfig(
        odim=40, attention_dim=32, attention_heads=4, linear_units=64, num_blocks=2
    )
    state = {k: v.detach().numpy() for k, v in dec.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, ed.convert_espnet_decoder(state, cfg))

    tokens = np.asarray([[39, 5, 7, 2]], np.int64)
    memory = rng.normal(size=(1, 11, 32)).astype(np.float32)
    with torch.no_grad():
        tgt = torch.from_numpy(tokens)
        mask = subsequent_mask(tokens.shape[1]).unsqueeze(0)
        want, _ = dec(tgt, mask, torch.from_numpy(memory), None)

    got = np.asarray(
        ed.decode_logits(params, cfg, jnp.asarray(tokens, jnp.int32), jnp.asarray(memory))
    )
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-3, atol=2e-3)


@requires_espnet
def test_ctc_head_matches_espnet(rng):
    from espnet.nets.pytorch_backend.ctc import CTC

    torch.manual_seed(0)
    ctc = CTC(40, 32, 0.0, ctc_type="builtin")
    ctc.eval()
    memory = rng.normal(size=(1, 9, 32)).astype(np.float32)
    with torch.no_grad():
        want = ctc.log_softmax(torch.from_numpy(memory)).numpy()
    params = {
        "ctc_lo": {
            "weight": jnp.asarray(ctc.ctc_lo.weight.detach().numpy()),
            "bias": jnp.asarray(ctc.ctc_lo.bias.detach().numpy()),
        }
    }
    got = np.asarray(ed.ctc_log_probs(params, jnp.asarray(memory)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@requires_espnet
def test_transformer_lm_matches_espnet(rng):
    """Our causal-mask LM forward vs the vendored TransformerLM."""
    import argparse

    from espnet.nets.pytorch_backend.lm.transformer import TransformerLM

    from dualhyp_tpu.models import espnet_lm

    args = argparse.Namespace(
        layer=2, unit=32, att_unit=16, embed_unit=8, head=2,
        dropout_rate=0.0, att_dropout_rate=0.0, emb_dropout_rate=0.0,
        tie_weights=False, pos_enc="sinusoidal",
    )
    torch.manual_seed(0)
    lm = TransformerLM(20, args)
    lm.eval()

    cfg = espnet_lm.EspnetLMConfig(
        n_vocab=20, embed_unit=8, att_unit=16, head=2, unit=32, layer=2
    )
    state = {k: v.detach().numpy() for k, v in lm.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, espnet_lm.convert_espnet_lm(state, cfg))

    tokens = np.asarray([[19, 5, 7, 2, 11]], np.int64)
    with torch.no_grad():
        # batch_score path: last-position logits
        ys = torch.from_numpy(tokens)
        logp, _ = lm.batch_score(ys, [None], None)
    got = np.asarray(espnet_lm.lm_logprobs(params, cfg, jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(got, logp.numpy(), rtol=2e-3, atol=2e-3)
