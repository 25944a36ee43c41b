"""End-to-end offline VSR hypothesis-generation bench (L2, real TPU).

The VSR twin of bench_make_json_asr: one driver-readable number for the
FULL `cli.make_json_vsr.make_json` pipeline — mouth-ROI HDF5 load ->
visual occlusion with recorded replay config -> eval transforms
(CenterCrop 88) -> Conv3D+ResNet frontend -> BRAVEn-large conformer
encode -> joint CTC/attention beam-40 (device-side lockstep) ->
n-best dedupe -> JSON dump — in utterances/sec at decode_batch=16
(ref: data/make_json_vsr.py:51-257).

Random weights at the real BRAVEn-large architecture sizes (throughput
depends on shapes, not values). The Conv3D+ResNet frontend tree is
built from the reference's own vendored torch module via the tested
converter (the same recipe as scripts/validate_relprompt_real.py);
only `ckpt.io.load_params` is substituted — everything downstream is
the production pipeline.

Run: python scripts/bench_make_json_vsr.py [--utterances 32]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

_ESPNET = Path("/root/reference/data/raven/espnet")
FPS = 25


def build_frontend():
    """Random Conv3dResNet weights through the parity-tested converter
    (needs the read-only reference checkout for the torch module)."""
    if not _ESPNET.is_dir():
        raise SystemExit(
            "reference espnet not found — the conv3d frontend tree is "
            "built from the vendored torch module"
        )
    sys.path.insert(0, str(_ESPNET.parent))
    import torch
    from espnet.nets.pytorch_backend.backbones.conv3d_extractor import (
        Conv3dResNet,
    )

    from dualhyp_tpu.models import raven

    torch.manual_seed(0)
    fe = Conv3dResNet(relu_type="swish")
    state = {k: v.detach().numpy() for k, v in fe.state_dict().items()}
    return raven.convert_conv3d_frontend(state)


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

    from bench_vsr_beam import build_decoder, build_encoder, rnd_params
    from dualhyp_tpu.ckpt import io as ckpt_io
    from dualhyp_tpu.cli import make_json_vsr
    from dualhyp_tpu.models import espnet_decoder as ed
    from dualhyp_tpu.models import raven

    vocab = 1049  # unigram1000 + specials, espnet label layout
    enc_cfg = raven.BRAVEN_LARGE
    dec_cfg = ed.EspnetDecoderConfig(
        odim=vocab, attention_dim=enc_cfg.attention_dim,
        attention_heads=16, linear_units=4096, num_blocks=6,
    )
    bf16 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), t
    )
    _, lin, _ = rnd_params(jax.random.key(2))
    weights = {
        "frontend": bf16(build_frontend()),
        "encoder": bf16(build_encoder(enc_cfg, jax.random.key(0))),
        "decoder": bf16(build_decoder(dec_cfg, jax.random.key(1))),
        "ctc": bf16({"ctc_lo": lin(vocab, enc_cfg.attention_dim)}),
    }
    token_list = (
        ["<blank>"] + [f"▁w{i}" for i in range(vocab - 2)] + ["<sos/eos>"]
    )

    tmp = Path(tempfile.mkdtemp(prefix="bench_makejson_vsr_"))
    rng = np.random.default_rng(0)
    n = args.utterances
    lines = []
    import h5py

    for i in range(n):
        frames = int(rng.uniform(3.0, 5.0) * FPS)  # LRS2-ish lengths
        roi = tmp / f"utt{i:04d}.h5"
        with h5py.File(roi, "w") as f:
            f.create_dataset(
                "video_frames",
                data=rng.integers(0, 256, (frames, 96, 96), dtype=np.uint8),
            )
        lines.append(f"utt{i:04d}\t{roi}\tsome spoken caption {i}")
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

    make_json_vsr.transcribe_vsr_nbest = _no_fallback

    cfg = {
        "model_checkpoint": "<in-memory random braven-large>",
        "token_list": str(tokens_path),
        "manifest": str(manifest),
        "output_file": str(tmp / "out.json"),
        "dataset_name": "bench",
        "decode_batch": args.decode_batch,
        "beam_size": args.beam,
        "max_len": args.max_len,
        # must match the weight tree built above (the CLI's defaults are
        # the smaller unigram-VSR decoder: dim 512 / 8 heads)
        "decoder": {
            "attention_dim": enc_cfg.attention_dim,
            "attention_heads": 16,
            "linear_units": 4096,
            "num_blocks": 6,
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
    make_json_vsr.make_json(warm)
    print(f"warmup done in {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    make_json_vsr.make_json(cfg)
    dt = time.perf_counter() - t0
    ckpt_io.load_params = real_load

    out = json.load(open(tmp / "out.json"))
    assert len(out) == n, (len(out), n)
    assert all(len(r["nhyps"]["hyps"]) == 5 for r in out)
    assert all(r["Visual_Corruption"] for r in out)
    ups = n / dt
    print(
        f"make_json_vsr end-to-end: {n} utterances, beam {args.beam}, "
        f"decode_batch {args.decode_batch}, max_len {args.max_len}: "
        f"{dt:.2f}s total -> {ups:.2f} utt/s ({1e3/ups:.0f} ms/utt)"
    )
    print(json.dumps({
        "metric": "make_json_vsr_beam40_utterances_per_sec",
        "value": round(ups, 3), "unit": "utt/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
