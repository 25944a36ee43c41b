"""Bucketed batched encode == per-utterance unpadded encode, exactly.

The make_json VSR/AVSR CLIs encode right-zero-padded batches through one
jitted call (cli/make_json_vsr.encode_ctc_batch,
cli/make_json_avsr.encode_ctc_batch_av) instead of an eager
per-utterance loop. These tests prove the padding is EXACT at real
positions (not merely close): the frontends mix time only in
convolutions whose zero-tail windows match the unpadded convs' own zero
padding, and the conformer mixes positions only in masked attention and
the masked conv module (raven._conv_module mask_pad). Parity target is
the per-utterance path, which is itself parity-tested against the
vendored torch stacks (tests/test_raven.py, tests/test_avsr_e2e.py).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dualhyp_tpu.models import avsr, espnet_decoder as ed, raven

_REF = Path("/root/reference/data/raven")
_espnet_available = (_REF / "espnet").is_dir()
requires_espnet = pytest.mark.skipif(
    not _espnet_available, reason="vendored espnet reference unavailable"
)


# ---------------------------------------------------------------------------
# random param builders (pure JAX; shapes match what raven.encode reads)
# ---------------------------------------------------------------------------

def _rnd_builders(seed):
    key = jax.random.key(seed)
    counter = [0]

    def rnd(shape, scale=0.1):
        counter[0] += 1
        return jax.random.normal(
            jax.random.fold_in(key, counter[0]), shape
        ) * scale

    def lin(o, i):
        return {"weight": rnd((o, i)), "bias": rnd((o,))}

    def ln(d):
        return {"weight": 1 + rnd((d,)), "bias": rnd((d,))}

    def bn(d):
        return {"running_mean": rnd((d,)), "running_var": 1 + rnd((d,)) ** 2,
                "weight": 1 + rnd((d,)), "bias": rnd((d,))}

    return rnd, lin, ln, bn


def _enc_params(cfg: raven.RavenEncoderConfig, seed=0):
    rnd, lin, ln, bn = _rnd_builders(seed)
    d, h, lu = cfg.attention_dim, cfg.attention_heads, cfg.linear_units
    layers = {}
    for i in range(cfg.num_blocks):
        leaf = {
            "norm_mha": ln(d),
            "self_attn": {
                "linear_q": lin(d, d), "linear_k": lin(d, d),
                "linear_v": lin(d, d), "linear_out": lin(d, d),
            },
            "norm_ff": ln(d),
            "feed_forward": {"w_1": lin(lu, d), "w_2": lin(d, lu)},
        }
        if cfg.attn_layer_type in ("rel_mha", "legacy_rel_mha"):
            leaf["self_attn"].update(
                linear_pos={"weight": rnd((d, d))},
                pos_bias_u=rnd((h, d // h)), pos_bias_v=rnd((h, d // h)),
            )
        if cfg.macaron_style:
            leaf["feed_forward_macaron"] = {"w_1": lin(lu, d),
                                            "w_2": lin(d, lu)}
            leaf["norm_ff_macaron"] = ln(d)
        if cfg.use_cnn_module:
            k = cfg.cnn_module_kernel
            leaf["conv_module"] = {
                "pointwise_cov1": {"weight": rnd((2 * d, d, 1)),
                                   "bias": rnd((2 * d,))},
                "depthwise_conv": {"weight": rnd((d, 1, k)),
                                   "bias": rnd((d,))},
                "norm": bn(d),
                "pointwise_cov2": {"weight": rnd((d, d, 1)),
                                   "bias": rnd((d,))},
            }
            leaf["norm_conv"] = ln(d)
            leaf["norm_final"] = ln(d)
        layers[str(i)] = leaf
    return {
        "embed": {"linear": lin(d, cfg.idim)},
        "layers": layers,
        "after_norm": ln(d),
    }


def _conv1d_params(seed=3):
    """Random Conv1dResNet tree at the real layout (64/128/256/512)."""
    rnd, lin, ln, bn = _rnd_builders(seed)

    def block(cin, cout, downsample):
        leaf = {
            "conv1": {"weight": rnd((cout, cin, 3))}, "bn1": bn(cout),
            "conv2": {"weight": rnd((cout, cout, 3))}, "bn2": bn(cout),
        }
        if downsample:
            leaf["downsample"] = {"conv": {"weight": rnd((cout, cin, 1))},
                                  "bn": bn(cout)}
        return leaf

    params = {"conv1": {"weight": rnd((64, 1, 80))}, "bn1": bn(64)}
    chans = {"layer1": (64, 64), "layer2": (64, 128),
             "layer3": (128, 256), "layer4": (256, 512)}
    for name, (cin, cout) in chans.items():
        down = name != "layer1"
        params[name] = {"0": block(cin, cout, down),
                        "1": block(cout, cout, False)}
    return params


CFGS = {
    "braven": raven.RavenEncoderConfig(
        idim=16, attention_dim=32, attention_heads=4, linear_units=48,
        num_blocks=2),
    "conformer": raven.RavenEncoderConfig(
        idim=16, attention_dim=32, attention_heads=4, linear_units=48,
        num_blocks=2, macaron_style=True, use_cnn_module=True,
        cnn_module_kernel=5),
    "mha": raven.RavenEncoderConfig(
        idim=16, attention_dim=32, attention_heads=4, linear_units=48,
        num_blocks=2, attn_layer_type="mha"),
}


@pytest.mark.parametrize("name", sorted(CFGS))
@pytest.mark.slow
def test_encode_padded_masked_equals_unpadded(name):
    """encode() on a right-zero-padded masked batch == per-utterance
    unpadded encode at every real position."""
    cfg = CFGS[name]
    params = _enc_params(cfg)
    rng = np.random.default_rng(0)
    lengths = [9, 7, 12]
    t_pad = 16
    feats = [rng.normal(size=(t, cfg.idim)).astype(np.float32)
             for t in lengths]
    batch = np.zeros((len(lengths), t_pad, cfg.idim), np.float32)
    for i, f in enumerate(feats):
        batch[i, : len(f)] = f
    mask = (np.asarray(lengths)[:, None]
            > np.arange(t_pad)[None, :])
    got = np.asarray(raven.encode(params, cfg, jnp.asarray(batch),
                                  jnp.asarray(mask)))
    for i, f in enumerate(feats):
        want = np.asarray(raven.encode(params, cfg, jnp.asarray(f[None])))[0]
        np.testing.assert_allclose(
            got[i, : lengths[i]], want, rtol=1e-4, atol=1e-5,
            err_msg=f"{name} utt {i}")


@pytest.mark.slow
def test_conv1d_frontend_prefix_exact_and_out_len():
    """Zero right-padding the waveform leaves the unpadded output frames
    exact, and the closed-form samples // 640 frame count (which
    make_json_avsr.encode_ctc_batch_av slices outputs back with) matches
    the compiled frontend."""
    params = _conv1d_params()
    rng = np.random.default_rng(1)
    n = 3 * 640 + 640  # 4 frames of samples
    audio = rng.normal(size=(1, n)).astype(np.float32)
    want = np.asarray(avsr.conv1d_frontend(params, jnp.asarray(audio)))[0]
    out_len = n // 640
    assert out_len == want.shape[0]
    padded = np.zeros((1, 8 * 640), np.float32)
    padded[0, :n] = audio[0]
    got = np.asarray(avsr.conv1d_frontend(
        params, jnp.asarray(padded), lengths=jnp.asarray([n])))[0]
    np.testing.assert_allclose(got[:out_len], want, rtol=1e-4, atol=1e-5)


@requires_espnet
@pytest.mark.slow
def test_conv3d_frontend_prefix_exact():
    """Zero right-padding in time leaves real frames exact (time is mixed
    only by the first conv3d, whose zero-tail windows equal the unpadded
    conv's own zero padding)."""
    import torch

    sys.path.insert(0, str(_REF))
    try:
        from espnet.nets.pytorch_backend.backbones.conv3d_extractor import (
            Conv3dResNet,
        )

        torch.manual_seed(0)
        fe = Conv3dResNet(relu_type="swish")
        state = {k: v.detach().numpy() for k, v in fe.state_dict().items()}
    finally:
        sys.path.remove(str(_REF))
    params = raven.convert_conv3d_frontend(state)
    rng = np.random.default_rng(2)
    video = rng.normal(size=(1, 1, 7, 32, 32)).astype(np.float32)
    want = np.asarray(raven.conv3d_frontend(params, jnp.asarray(video)))[0]
    padded = np.zeros((1, 1, 12, 32, 32), np.float32)
    padded[0, 0, :7] = video[0, 0]
    got = np.asarray(raven.conv3d_frontend(params, jnp.asarray(padded)))[0]
    np.testing.assert_allclose(got[:7], want, rtol=1e-4, atol=1e-5)


@requires_espnet
@pytest.mark.slow
def test_encode_ctc_batch_matches_per_utterance():
    """The VSR CLI helper (pad + jit + slice) reproduces the former eager
    per-utterance loop's memory and CTC log-probs."""
    import torch

    from dualhyp_tpu.cli.make_json_vsr import encode_ctc_batch

    sys.path.insert(0, str(_REF))
    try:
        from espnet.nets.pytorch_backend.backbones.conv3d_extractor import (
            Conv3dResNet,
        )

        torch.manual_seed(0)
        fe = Conv3dResNet(relu_type="swish")
        state = {k: v.detach().numpy() for k, v in fe.state_dict().items()}
    finally:
        sys.path.remove(str(_REF))
    frontend = raven.convert_conv3d_frontend(state)
    cfg = raven.RavenEncoderConfig(idim=512, attention_dim=32,
                                   attention_heads=4, linear_units=48,
                                   num_blocks=2)
    enc_params = _enc_params(cfg, seed=5)
    _, lin, _, _ = _rnd_builders(6)
    ctc_params = {"ctc_lo": lin(11, 32)}
    rng = np.random.default_rng(3)
    videos = [rng.normal(size=(t, 32, 32)).astype(np.float32)
              for t in (6, 9, 5)]

    memories, ctc_lps = encode_ctc_batch(
        frontend, enc_params, ctc_params, cfg, videos, pad_multiple=4)

    for i, video in enumerate(videos):
        feats = raven.conv3d_frontend(
            frontend, jnp.asarray(video[None, None], jnp.float32))
        memory = raven.encode(enc_params, cfg, feats)
        want_lp = np.asarray(ed.ctc_log_probs(ctc_params, memory))[0]
        np.testing.assert_allclose(
            memories[i], np.asarray(memory, np.float32)[0],
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(ctc_lps[i], want_lp, rtol=1e-4, atol=1e-4)


@requires_espnet
@pytest.mark.slow
def test_encode_ctc_batch_av_matches_per_utterance():
    """The AVSR CLI helper reproduces the former per-utterance
    frontends -> encoders -> fusion -> CTC loop."""
    import torch

    from dualhyp_tpu.cli.make_json_avsr import encode_ctc_batch_av

    sys.path.insert(0, str(_REF))
    try:
        from espnet.nets.pytorch_backend.backbones.conv3d_extractor import (
            Conv3dResNet,
        )

        torch.manual_seed(0)
        fe = Conv3dResNet(relu_type="swish")
        state = {k: v.detach().numpy() for k, v in fe.state_dict().items()}
    finally:
        sys.path.remove(str(_REF))
    cfg = raven.RavenEncoderConfig(
        idim=512, attention_dim=32, attention_heads=4, linear_units=48,
        num_blocks=1, macaron_style=True, use_cnn_module=True,
        cnn_module_kernel=5)
    rnd, lin, ln, bn = _rnd_builders(7)
    params = {
        "video_frontend": raven.convert_conv3d_frontend(state),
        "audio_frontend": _conv1d_params(8),
        "video_encoder": _enc_params(cfg, seed=9),
        "audio_encoder": _enc_params(cfg, seed=10),
        "fusion": {"fc1": lin(24, 64), "norm": bn(24), "fc2": lin(32, 24)},
    }
    ctc_params = {"ctc_lo": lin(11, 32)}
    rng = np.random.default_rng(4)
    videos = [rng.normal(size=(t, 32, 32)).astype(np.float32)
              for t in (6, 9, 5)]
    audios = [rng.normal(size=(t * 640,)).astype(np.float32)
              for t in (6, 9, 5)]

    memories, ctc_lps = encode_ctc_batch_av(
        params, ctc_params, cfg, cfg, videos, audios, pad_multiple=4)

    for i, (video, audio) in enumerate(zip(videos, audios)):
        vfeats = raven.conv3d_frontend(
            params["video_frontend"], jnp.asarray(video[None, None],
                                                  jnp.float32))
        afeats = avsr.conv1d_frontend(
            params["audio_frontend"], jnp.asarray(audio[None], jnp.float32))
        memory = avsr.avsr_encode(params, cfg, cfg, vfeats, afeats)
        want_lp = np.asarray(ed.ctc_log_probs(ctc_params, memory))[0]
        np.testing.assert_allclose(
            memories[i], np.asarray(memory, np.float32)[0],
            rtol=1e-4, atol=1e-5, err_msg=f"utt {i}")
        np.testing.assert_allclose(ctc_lps[i], want_lp, rtol=1e-4, atol=1e-4)


@requires_espnet
def test_encode_ctc_batch_bf16_compute(monkeypatch):
    """bf16 checkpoints now ENCODE in bf16 (raven.encode_dtype — the
    whisper-encoder convention, models/whisper._encode_jit): the
    boundary outputs stay f32 and track the f32 encode within bf16
    tolerance, and DUALHYP_RAVEN_ENCODE_DTYPE=float32 restores the old
    always-f32 path EXACTLY (f32 compute over bf16-rounded weights)."""
    import torch

    from dualhyp_tpu.cli.make_json_vsr import encode_ctc_batch

    sys.path.insert(0, str(_REF))
    try:
        from espnet.nets.pytorch_backend.backbones.conv3d_extractor import (
            Conv3dResNet,
        )

        torch.manual_seed(0)
        fe = Conv3dResNet(relu_type="swish")
        state = {k: v.detach().numpy() for k, v in fe.state_dict().items()}
    finally:
        sys.path.remove(str(_REF))
    frontend = raven.convert_conv3d_frontend(state)
    cfg = raven.RavenEncoderConfig(idim=512, attention_dim=32,
                                   attention_heads=4, linear_units=48,
                                   num_blocks=2)
    enc_params = _enc_params(cfg, seed=5)
    _, lin, _, _ = _rnd_builders(6)
    ctc_params = {"ctc_lo": lin(11, 32)}
    rng = np.random.default_rng(3)
    videos = [rng.normal(size=(t, 32, 32)).astype(np.float32)
              for t in (6, 9, 5)]

    monkeypatch.delenv("DUALHYP_RAVEN_ENCODE_DTYPE", raising=False)
    to = lambda tree, dt: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x).astype(dt), tree
    )
    f32 = (to(frontend, jnp.float32), to(enc_params, jnp.float32),
           to(ctc_params, jnp.float32))
    bf16 = tuple(to(t, jnp.bfloat16) for t in f32)
    # bf16-rounded weights upcast back to f32: what the override path's
    # f32 compute reads (weight.astype(x.dtype) on bf16 leaves == this)
    rounded = tuple(to(t, jnp.float32) for t in bf16)

    ref_mem, ref_lp = encode_ctc_batch(*f32, cfg, videos, pad_multiple=4)
    got_mem, got_lp = encode_ctc_batch(*bf16, cfg, videos, pad_multiple=4)
    for i in range(len(videos)):
        assert got_mem[i].dtype == np.float32
        assert got_lp[i].dtype == np.float32
        np.testing.assert_allclose(got_mem[i], ref_mem[i],
                                   rtol=0.1, atol=0.05, err_msg=f"utt {i}")
        np.testing.assert_allclose(got_lp[i], ref_lp[i],
                                   rtol=0.1, atol=0.1, err_msg=f"utt {i}")

    monkeypatch.setenv("DUALHYP_RAVEN_ENCODE_DTYPE", "float32")
    ov_mem, ov_lp = encode_ctc_batch(*bf16, cfg, videos, pad_multiple=4)
    want_mem, want_lp = encode_ctc_batch(*rounded, cfg, videos,
                                         pad_multiple=4)
    for i in range(len(videos)):
        np.testing.assert_allclose(ov_mem[i], want_mem[i],
                                   rtol=2e-6, atol=2e-6)
        np.testing.assert_allclose(ov_lp[i], want_lp[i],
                                   rtol=2e-6, atol=2e-6)


@requires_espnet
def test_encode_ctc_batch_av_bf16_compute(monkeypatch):
    """The AVSR twin encodes both streams in the checkpoint's dtype;
    f32 boundary outputs track the f32 encode within bf16 tolerance."""
    import torch

    from dualhyp_tpu.cli.make_json_avsr import encode_ctc_batch_av

    sys.path.insert(0, str(_REF))
    try:
        from espnet.nets.pytorch_backend.backbones.conv3d_extractor import (
            Conv3dResNet,
        )

        torch.manual_seed(0)
        fe = Conv3dResNet(relu_type="swish")
        state = {k: v.detach().numpy() for k, v in fe.state_dict().items()}
    finally:
        sys.path.remove(str(_REF))
    cfg = raven.RavenEncoderConfig(
        idim=512, attention_dim=32, attention_heads=4, linear_units=48,
        num_blocks=1, macaron_style=True, use_cnn_module=True,
        cnn_module_kernel=5)
    rnd, lin, ln, bn = _rnd_builders(7)
    params = {
        "video_frontend": raven.convert_conv3d_frontend(state),
        "audio_frontend": _conv1d_params(8),
        "video_encoder": _enc_params(cfg, seed=9),
        "audio_encoder": _enc_params(cfg, seed=10),
        "fusion": {"fc1": lin(24, 64), "norm": bn(24), "fc2": lin(32, 24)},
    }
    ctc_params = {"ctc_lo": lin(11, 32)}
    rng = np.random.default_rng(4)
    videos = [rng.normal(size=(t, 32, 32)).astype(np.float32)
              for t in (6, 9)]
    audios = [rng.normal(size=(t * 640,)).astype(np.float32)
              for t in (6, 9)]

    monkeypatch.delenv("DUALHYP_RAVEN_ENCODE_DTYPE", raising=False)
    to = lambda tree, dt: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x).astype(dt), tree
    )
    ref_mem, ref_lp = encode_ctc_batch_av(
        to(params, jnp.float32), to(ctc_params, jnp.float32), cfg, cfg,
        videos, audios, pad_multiple=4)
    got_mem, got_lp = encode_ctc_batch_av(
        to(params, jnp.bfloat16), to(ctc_params, jnp.bfloat16), cfg, cfg,
        videos, audios, pad_multiple=4)
    for i in range(len(videos)):
        assert got_mem[i].dtype == np.float32
        np.testing.assert_allclose(got_mem[i], ref_mem[i],
                                   rtol=0.1, atol=0.05, err_msg=f"utt {i}")
        np.testing.assert_allclose(got_lp[i], ref_lp[i],
                                   rtol=0.1, atol=0.1, err_msg=f"utt {i}")
