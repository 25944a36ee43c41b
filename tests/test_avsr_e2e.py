"""auto_avsr end-to-end parity: conv3d+conv1d frontends -> two conformer
encoders -> MLP fusion -> joint CTC/attention beam, compared against the
vendored auto_avsr stack (ref: data/auto_avsr/espnet/nets/pytorch_backend/
e2e_asr_conformer_av.py:23-116, lightning_av.py:72-95, 151-175) with random
weights.

The raven and auto_avsr trees both vendor a top-level `espnet` package; the
fixture swaps module/path state in and out so both test families can run in
one pytest session.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

_AV_REF = Path("/root/reference/data/auto_avsr")
_available = (_AV_REF / "espnet").is_dir()

requires_auto_avsr = pytest.mark.skipif(
    not _available, reason="vendored auto_avsr unavailable"
)


def _purge_espnet():
    for k in list(sys.modules):
        if k == "espnet" or k.startswith("espnet."):
            del sys.modules[k]


@pytest.fixture()
def av_ref():
    if not _available:
        pytest.skip("vendored auto_avsr unavailable")
    _purge_espnet()
    sys.path.insert(0, str(_AV_REF))
    try:
        from espnet.nets.batch_beam_search import BatchBeamSearch
        from espnet.nets.pytorch_backend.e2e_asr_conformer_av import E2E
        from espnet.nets.scorers.ctc import CTCPrefixScorer as TorchCTCScorer
        from espnet.nets.scorers.length_bonus import LengthBonus

        yield types.SimpleNamespace(
            E2E=E2E,
            BatchBeamSearch=BatchBeamSearch,
            TorchCTCScorer=TorchCTCScorer,
            LengthBonus=LengthBonus,
        )
    finally:
        sys.path.remove(str(_AV_REF))
        _purge_espnet()


def _av_args(adim=32, heads=4, units=64, layers=1, fusion_hdim=48):
    common = dict(
        dropout_rate=0.0,
        transformer_attn_dropout_rate=0.0,
        macaron_style=True,
        use_cnn_module=True,
        cnn_module_kernel=5,
        zero_triu=False,
        a_upsample_ratio=1,
        relu_type="swish",
    )
    ns = types.SimpleNamespace(
        adim=adim, aheads=heads, eunits=units, elayers=layers,
        transformer_input_layer="conv3d",
        transformer_encoder_attn_layer_type="rel_mha",
        aux_adim=adim, aux_aheads=heads, aux_eunits=units, aux_elayers=layers,
        aux_transformer_input_layer="conv1d",
        aux_transformer_encoder_attn_layer_type="rel_mha",
        aux_dropout_rate=0.0, aux_transformer_attn_dropout_rate=0.0,
        aux_macaron_style=True, aux_use_cnn_module=True,
        aux_cnn_module_kernel=5, aux_zero_triu=False,
        aux_a_upsample_ratio=1, aux_relu_type="swish",
        fusion_hdim=fusion_hdim, fusion_norm="batchnorm",
        ddim=adim, dheads=heads, dunits=units, dlayers=1,
        mtlalpha=0.3, lsm_weight=0.1,
        transformer_length_normalized_loss=False, ctc_type="builtin",
        **common,
    )
    return ns


def _convert_all(model, enc_cfg, dec_cfg):
    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.models import avsr, espnet_decoder as ed, raven

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = {
        "video_frontend": raven.convert_conv3d_frontend(sd, "encoder.frontend."),
        "video_encoder": raven.convert_espnet_encoder(sd, enc_cfg, "encoder."),
        "audio_frontend": avsr.convert_conv1d_frontend(sd, "aux_encoder.frontend."),
        "audio_encoder": raven.convert_espnet_encoder(sd, enc_cfg, "aux_encoder."),
        "fusion": avsr.convert_mlp_head(sd, "fusion."),
    }
    dec_params = ed.convert_espnet_decoder(
        {k[len("decoder."):]: v for k, v in sd.items() if k.startswith("decoder.")},
        dec_cfg,
    )
    ctc_params = {"ctc_lo": {"weight": sd["ctc.ctc_lo.weight"],
                             "bias": sd["ctc.ctc_lo.bias"]}}
    to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return to_jnp(params), to_jnp(dec_params), to_jnp(ctc_params)


@requires_auto_avsr
@pytest.mark.slow
def test_avsr_fused_memory_matches_vendored(av_ref, rng):
    """Frontends + encoders + fusion produce the same memory as the vendored
    E2E encode path."""
    import torch

    from dualhyp_tpu.models import avsr, raven

    torch.manual_seed(0)
    args = _av_args()
    model = av_ref.E2E(odim=12, args=args).eval().float()

    t_frames = 6
    video = rng.normal(size=(t_frames, 88, 88)).astype(np.float32)
    audio = rng.normal(size=(t_frames * 640,)).astype(np.float32) * 0.1

    with torch.no_grad():
        vfeat, _ = model.encoder(
            torch.from_numpy(video).unsqueeze(1).unsqueeze(0), None
        )
        afeat, _ = model.aux_encoder(
            torch.from_numpy(audio).unsqueeze(0).unsqueeze(-1), None
        )
        fused_ref = model.fusion(torch.cat((vfeat, afeat), dim=-1)).numpy()

    enc_cfg = raven.RavenEncoderConfig(
        idim=512, attention_dim=args.adim, attention_heads=args.aheads,
        linear_units=args.eunits, num_blocks=args.elayers,
        attn_layer_type="rel_mha", macaron_style=True, use_cnn_module=True,
        cnn_module_kernel=5,
    )
    dec_cfg = None
    import jax.numpy as jnp

    params, _, _ = _convert_all(
        model, enc_cfg,
        __import__("dualhyp_tpu.models.espnet_decoder", fromlist=["x"])
        .EspnetDecoderConfig(odim=12, attention_dim=args.adim,
                             attention_heads=args.aheads,
                             linear_units=args.dunits, num_blocks=1),
    )
    video_feats = raven.conv3d_frontend(
        params["video_frontend"], jnp.asarray(video[None, None], jnp.float32)
    )
    audio_feats = avsr.conv1d_frontend(
        params["audio_frontend"], jnp.asarray(audio[None], jnp.float32)
    )
    fused = np.asarray(
        avsr.avsr_encode(params, enc_cfg, enc_cfg, video_feats, audio_feats)
    )
    np.testing.assert_allclose(fused, fused_ref, rtol=5e-4, atol=5e-4)


@requires_auto_avsr
def test_avsr_nbest_token_parity(av_ref, rng):
    """Full AV pipeline n-best: our joint CTC/attention beam returns the
    same token sequences (and ranking) as the vendored BatchBeamSearch
    driven by the vendored E2E."""
    import torch

    import jax
    import jax.numpy as jnp

    from dualhyp_tpu.infer.ctc_prefix import CTCPrefixScorer
    from dualhyp_tpu.infer.joint_beam_search import joint_beam_search
    from dualhyp_tpu.models import avsr, espnet_decoder as ed, raven

    torch.manual_seed(1)
    args = _av_args()
    odim = 12
    token_list = ["<blank>"] + [f"w{i}" for i in range(odim - 2)] + ["<sos/eos>"]
    model = av_ref.E2E(odim=odim, args=args).eval().float()

    t_frames = 6
    video = rng.normal(size=(t_frames, 88, 88)).astype(np.float32)
    audio = rng.normal(size=(t_frames * 640,)).astype(np.float32) * 0.1

    beam_size, ctc_weight = 6, 0.1
    with torch.no_grad():
        vfeat, _ = model.encoder(
            torch.from_numpy(video).unsqueeze(1).unsqueeze(0), None
        )
        afeat, _ = model.aux_encoder(
            torch.from_numpy(audio).unsqueeze(0).unsqueeze(-1), None
        )
        fused_ref = model.fusion(torch.cat((vfeat, afeat), dim=-1))
        beam = av_ref.BatchBeamSearch(
            beam_size=beam_size,
            vocab_size=odim,
            weights={"decoder": 1.0 - ctc_weight, "ctc": ctc_weight,
                     "lm": 0.0, "length_bonus": 0.0},
            scorers={
                "decoder": model.decoder,
                "ctc": av_ref.TorchCTCScorer(model.ctc, model.eos),
                "length_bonus": av_ref.LengthBonus(odim),
                "lm": None,
            },
            sos=model.sos,
            eos=model.eos,
            token_list=token_list,
            pre_beam_score_key="decoder",
        )
        ref_hyps = [h.asdict() for h in beam(fused_ref.squeeze(0))]
    ref_tokens = [list(map(int, h["yseq"][1:-1])) for h in ref_hyps]

    # ---- ours ----
    enc_cfg = raven.RavenEncoderConfig(
        idim=512, attention_dim=args.adim, attention_heads=args.aheads,
        linear_units=args.eunits, num_blocks=args.elayers,
        attn_layer_type="rel_mha", macaron_style=True, use_cnn_module=True,
        cnn_module_kernel=5,
    )
    dec_cfg = ed.EspnetDecoderConfig(
        odim=odim, attention_dim=args.ddim, attention_heads=args.dheads,
        linear_units=args.dunits, num_blocks=args.dlayers,
    )
    params, dec_params, ctc_params = _convert_all(model, enc_cfg, dec_cfg)

    video_feats = raven.conv3d_frontend(
        params["video_frontend"], jnp.asarray(video[None, None], jnp.float32)
    )
    audio_feats = avsr.conv1d_frontend(
        params["audio_frontend"], jnp.asarray(audio[None], jnp.float32)
    )
    memory = avsr.avsr_encode(params, enc_cfg, enc_cfg, video_feats, audio_feats)

    sos = eos = odim - 1
    ctc_lp = np.asarray(ed.ctc_log_probs(ctc_params, memory))[0]
    scorer = CTCPrefixScorer(ctc_lp, blank=0, eos=eos)

    step = jax.jit(
        lambda toks, mem: jax.nn.log_softmax(
            ed.decode_logits(dec_params, dec_cfg, toks, mem)[:, -1], axis=-1
        )
    )

    def att_fn(tokens):
        n = tokens.shape[0]
        mem = jnp.broadcast_to(memory, (n,) + memory.shape[1:])
        return step(jnp.asarray(tokens, jnp.int32), mem)

    hyps = joint_beam_search(
        att_fn, scorer, sos=sos, eos=eos, beam_size=beam_size,
        weights={"decoder": 1.0 - ctc_weight, "ctc": ctc_weight,
                 "length_bonus": 0.0},
        max_len=int(memory.shape[1]), blank=0,
    )
    our_tokens = [h.result_tokens(sos, eos) for h in hyps]

    assert our_tokens[0] == ref_tokens[0], (our_tokens[0], ref_tokens[0])
    # the n-best SETS must agree on the overlap
    n = min(len(our_tokens), len(ref_tokens), 5)
    assert [tuple(t) for t in our_tokens[:n]] == [
        tuple(t) for t in ref_tokens[:n]
    ]

    # the device-side lockstep beam must match the vendored reference too
    # (two copies of the utterance decode identically in one batch)
    from dualhyp_tpu.infer.joint_device_beam import joint_device_beam_batch

    mem_np = np.asarray(memory, np.float32)[0]
    dev = joint_device_beam_batch(
        dec_params, dec_cfg, [mem_np, mem_np], [ctc_lp, ctc_lp],
        sos=sos, eos=eos, beam_size=beam_size,
        weights={"decoder": 1.0 - ctc_weight, "ctc": ctc_weight,
                 "length_bonus": 0.0},
        max_len=int(memory.shape[1]), blank=0,
    )
    for dev_hyps in dev:
        dev_tokens = [h.result_tokens(sos, eos) for h in dev_hyps]
        assert [tuple(t) for t in dev_tokens[:n]] == [
            tuple(t) for t in ref_tokens[:n]
        ]
