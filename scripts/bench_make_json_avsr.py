"""End-to-end offline AVSR hypothesis-generation bench (L2, real TPU).

The third of the L2 triple (asr/vsr/avsr): one driver-readable number
for the FULL `cli.make_json_avsr.make_json` pipeline — wav + mouth-ROI
load -> visual occlusion with recorded replay config -> eval transforms
-> conv3d video + conv1d audio frontends -> two 12-layer conformer
encoders -> MLP fusion -> joint CTC/attention beam-40 (device-side
lockstep) -> n-best dedupe -> JSON dump — in utterances/sec at
decode_batch=16 (ref: data/make_json_avsr.py:65-175,
data/auto_avsr/lightning_av.py:72-95).

Weights are random at the public auto_avsr audiovisual sizes (adim 768,
12 layers per stream, fusion hdim 8192, 6 decoder layers, unigram5000
vocab; the hydra config carrying these is absent from the reference
checkout, so the sizes come from the public auto_avsr release), built
by instantiating the reference's own vendored torch `E2E` and running
it through the parity-tested converters (tests/test_avsr_e2e.py
recipe). Only `ckpt.io.load_params` is substituted — everything
downstream is the production pipeline.

Run: python scripts/bench_make_json_avsr.py [--utterances 32]
"""

import argparse
import json
import sys
import tempfile
import time
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

_AV_REF = Path("/root/reference/data/auto_avsr")
FPS = 25
SR = 16000

# public auto_avsr audiovisual.yaml sizes
ADIM, AHEADS, EUNITS, ELAYERS = 768, 12, 3072, 12
CNN_KERNEL = 31
FUSION_HDIM = 8192
DDIM, DHEADS, DUNITS, DLAYERS = 768, 12, 3072, 6
VOCAB = 5049  # <blank> + unigram5000_units (5047) + <sos/eos>


def _purge_espnet():
    for k in list(sys.modules):
        if k == "espnet" or k.startswith("espnet."):
            del sys.modules[k]


def _av_args():
    common = dict(
        dropout_rate=0.0,
        transformer_attn_dropout_rate=0.0,
        macaron_style=True,
        use_cnn_module=True,
        cnn_module_kernel=CNN_KERNEL,
        zero_triu=False,
        a_upsample_ratio=1,
        relu_type="swish",
    )
    return types.SimpleNamespace(
        adim=ADIM, aheads=AHEADS, eunits=EUNITS, elayers=ELAYERS,
        transformer_input_layer="conv3d",
        transformer_encoder_attn_layer_type="rel_mha",
        aux_adim=ADIM, aux_aheads=AHEADS, aux_eunits=EUNITS,
        aux_elayers=ELAYERS,
        aux_transformer_input_layer="conv1d",
        aux_transformer_encoder_attn_layer_type="rel_mha",
        aux_dropout_rate=0.0, aux_transformer_attn_dropout_rate=0.0,
        aux_macaron_style=True, aux_use_cnn_module=True,
        aux_cnn_module_kernel=CNN_KERNEL, aux_zero_triu=False,
        aux_a_upsample_ratio=1, aux_relu_type="swish",
        fusion_hdim=FUSION_HDIM, fusion_norm="batchnorm",
        ddim=DDIM, dheads=DHEADS, dunits=DUNITS, dlayers=DLAYERS,
        mtlalpha=0.3, lsm_weight=0.1,
        transformer_length_normalized_loss=False, ctc_type="builtin",
        **common,
    )


def build_weights():
    """Random weights at real sizes through the reference's own vendored
    torch E2E + the parity-tested converters (tests/test_avsr_e2e.py)."""
    if not (_AV_REF / "espnet").is_dir():
        raise SystemExit("vendored auto_avsr not found under /root/reference")
    _purge_espnet()
    sys.path.insert(0, str(_AV_REF))
    try:
        import torch
        from espnet.nets.pytorch_backend.e2e_asr_conformer_av import E2E

        from dualhyp_tpu.models import avsr, espnet_decoder as ed, raven

        torch.manual_seed(0)
        model = E2E(VOCAB, _av_args()).eval().float()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        del model

        # == raven.AUTO_AVSR_CONFORMER at the real sizes; built from the
        # module constants so the tiny-size CPU smoke path stays coherent
        enc_cfg = raven.RavenEncoderConfig(
            attention_dim=ADIM, attention_heads=AHEADS,
            linear_units=EUNITS, num_blocks=ELAYERS,
            macaron_style=True, use_cnn_module=True,
            cnn_module_kernel=CNN_KERNEL,
        )
        dec_cfg = ed.EspnetDecoderConfig(
            odim=VOCAB, attention_dim=DDIM, attention_heads=DHEADS,
            linear_units=DUNITS, num_blocks=DLAYERS,
        )
        weights = {
            "video_frontend": raven.convert_conv3d_frontend(
                sd, "encoder.frontend."),
            "video_encoder": raven.convert_espnet_encoder(
                sd, enc_cfg, "encoder."),
            "audio_frontend": avsr.convert_conv1d_frontend(
                sd, "aux_encoder.frontend."),
            "audio_encoder": raven.convert_espnet_encoder(
                sd, enc_cfg, "aux_encoder."),
            "fusion": avsr.convert_mlp_head(sd, "fusion."),
            "decoder": ed.convert_espnet_decoder(
                {k[len("decoder."):]: v for k, v in sd.items()
                 if k.startswith("decoder.")}, dec_cfg),
            "ctc": {"ctc_lo": {"weight": sd["ctc.ctc_lo.weight"],
                               "bias": sd["ctc.ctc_lo.bias"]}},
        }
    finally:
        sys.path.remove(str(_AV_REF))
        _purge_espnet()
    bf16 = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16), t
    )
    return bf16(weights)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utterances", type=int, default=32)
    ap.add_argument("--decode_batch", type=int, default=16)
    ap.add_argument("--beam", type=int, default=40)
    ap.add_argument("--max_len", type=int, default=40,
                    help="typical LRS2 caption length in unigram tokens; "
                         "random weights rarely emit eos so this bounds "
                         "the beam")
    args = ap.parse_args()

    import h5py
    from scipy.io import wavfile

    from dualhyp_tpu.ckpt import io as ckpt_io
    from dualhyp_tpu.cli import make_json_avsr

    weights = build_weights()
    token_list = (
        ["<blank>"] + [f"▁w{i}" for i in range(VOCAB - 2)] + ["<sos/eos>"]
    )

    tmp = Path(tempfile.mkdtemp(prefix="bench_makejson_avsr_"))
    rng = np.random.default_rng(0)
    n = args.utterances
    lines = []
    for i in range(n):
        seconds = rng.uniform(3.0, 5.0)
        frames = int(seconds * FPS)
        roi = tmp / f"utt{i:04d}.h5"
        with h5py.File(roi, "w") as f:
            f.create_dataset(
                "video_frames",
                data=rng.integers(0, 256, (frames, 96, 96), dtype=np.uint8),
            )
        wav = tmp / f"utt{i:04d}.wav"
        samples = (rng.normal(0, 0.05, frames * SR // FPS) * 32767)
        wavfile.write(wav, SR, samples.astype(np.int16))
        lines.append(f"utt{i:04d}\t{wav}\t{roi}\tsome spoken caption {i}")
    manifest = tmp / "manifest.tsv"
    manifest.write_text("\n".join(lines) + "\n")
    tokens_path = tmp / "tokens.txt"
    tokens_path.write_text("\n".join(token_list) + "\n")

    # substitute ONLY the checkpoint load
    real_load = ckpt_io.load_params
    ckpt_io.load_params = lambda p: weights

    # the CLI quietly falls back to per-utterance decoding on a batched
    # failure; for a bench that must measure the batched path, fail loudly
    def _no_fallback(*a, **k):
        raise RuntimeError("batched decode fell back to per-utterance")

    make_json_avsr.transcribe_avsr_nbest = _no_fallback

    enc_dict = dict(
        attention_dim=ADIM, attention_heads=AHEADS, linear_units=EUNITS,
        num_blocks=ELAYERS, macaron_style=True, use_cnn_module=True,
        cnn_module_kernel=CNN_KERNEL,
    )
    cfg = {
        "model_checkpoint": "<in-memory random auto_avsr>",
        "token_list": str(tokens_path),
        "manifest": str(manifest),
        "output_file": str(tmp / "out.json"),
        "dataset_name": "bench",
        "decode_batch": args.decode_batch,
        "beam_size": args.beam,
        "max_len": args.max_len,
        "video_encoder": enc_dict,
        "audio_encoder": enc_dict,
        "decoder": {
            "attention_dim": DDIM, "attention_heads": DHEADS,
            "linear_units": DUNITS, "num_blocks": DLAYERS,
        },
        "occ_type": "pixelate",
        "dump_every": 10_000,
        "seed": 0,
    }

    print("warmup (compile) pass...", flush=True)
    warm_manifest = tmp / "warm.tsv"
    warm_manifest.write_text("\n".join(lines[: args.decode_batch]) + "\n")
    warm = dict(cfg, manifest=str(warm_manifest),
                output_file=str(tmp / "warm.json"))
    t0 = time.perf_counter()
    make_json_avsr.make_json(warm)
    print(f"warmup done in {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    make_json_avsr.make_json(cfg)
    dt = time.perf_counter() - t0
    ckpt_io.load_params = real_load

    out = json.load(open(tmp / "out.json"))
    assert len(out) == n, (len(out), n)
    assert all(len(r["nhyps"]["hyps"]) == 5 for r in out)
    assert all(r["Visual_Corruption"] for r in out)
    ups = n / dt
    print(
        f"make_json_avsr end-to-end: {n} utterances, beam {args.beam}, "
        f"decode_batch {args.decode_batch}, max_len {args.max_len}: "
        f"{dt:.2f}s total -> {ups:.2f} utt/s ({1e3/ups:.0f} ms/utt)"
    )
    print(json.dumps({
        "metric": "make_json_avsr_beam40_utterances_per_sec",
        "value": round(ups, 3), "unit": "utt/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
