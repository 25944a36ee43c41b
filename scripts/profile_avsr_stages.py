"""Stage-level wall profile of the batched AVSR offline pipeline.

Splits `make_json_avsr.transcribe_avsr_nbest_batch`'s wall into
(a) the jitted AV encode (device time, synced by fetching a scalar),
(b) the (memory, ctc_log_probs) host fetch, (c) the device joint beam
(which re-uploads them), so the VSR->AVSR end-to-end delta can be
attributed before optimizing (ref pipeline: data/make_json_avsr.py:
65-175).

Run: python scripts/profile_avsr_stages.py [--utterances 16]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from bench_make_json_avsr import (  # noqa: E402
    ADIM, AHEADS, CNN_KERNEL, DDIM, DHEADS, DLAYERS, DUNITS, ELAYERS,
    EUNITS, FPS, SR, VOCAB, build_weights,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utterances", type=int, default=16)
    ap.add_argument("--beam", type=int, default=40)
    ap.add_argument("--max_len", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke (f32 weights; validates the script "
                         "end-to-end without the chip)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, str(Path(__file__).parent))

    from dualhyp_tpu.cli import make_json_avsr
    from dualhyp_tpu.infer.joint_device_beam import joint_device_beam_batch
    from dualhyp_tpu.models import espnet_decoder as ed, raven

    weights = build_weights()
    if args.cpu:
        # XLA:CPU lacks the bf16 x bf16 = f32 dot the TPU path uses
        weights = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32), weights
        )
    enc_cfg = raven.RavenEncoderConfig(
        attention_dim=ADIM, attention_heads=AHEADS, linear_units=EUNITS,
        num_blocks=ELAYERS, macaron_style=True, use_cnn_module=True,
        cnn_module_kernel=CNN_KERNEL,
    )
    dec_cfg = ed.EspnetDecoderConfig(
        odim=VOCAB, attention_dim=DDIM, attention_heads=DHEADS,
        linear_units=DUNITS, num_blocks=DLAYERS,
    )

    rng = np.random.default_rng(0)
    u = args.utterances
    videos, audios = [], []
    for _ in range(u):
        seconds = rng.uniform(3.0, 5.0)
        frames = int(seconds * FPS)
        videos.append(rng.normal(0, 1, (frames, 88, 88)).astype(np.float32))
        audios.append(rng.normal(0, 0.05, frames * SR // FPS).astype(np.float32))

    sos = eos = VOCAB - 1
    wts = {"decoder": 0.9, "ctc": 0.1, "length_bonus": 0.0}

    def encode():
        return make_json_avsr.encode_ctc_batch_av(
            weights, weights["ctc"], enc_cfg, enc_cfg, videos, audios
        )

    def beam(memories, ctc_lps):
        return joint_device_beam_batch(
            weights["decoder"], dec_cfg, memories, ctc_lps,
            sos=sos, eos=eos, beam_size=args.beam, weights=wts,
            max_len=args.max_len, blank=0,
        )

    print("warmup (compile)...", flush=True)
    t0 = time.perf_counter()
    mem, ctc = encode()
    beam(mem, ctc)
    print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)

    # encode split: device time (fetch one scalar) vs full-array fetch.
    # The jit call is async; syncing on a 4-byte fetch isolates device
    # compute + tunnel RTT from the ~40 MB array downloads.
    enc_jit = make_json_avsr._encode_jit()
    from dualhyp_tpu.cli.make_json_vsr import pad_video_batch

    alens = np.array([len(a) // 640 for a in audios], np.int32)
    vids, vlens_pad, vlens = pad_video_batch(videos, 32, min_frames=int(alens.max()))
    u_pad, t_pad = vids.shape[0], vids.shape[2]
    auds = np.zeros((u_pad, t_pad * 640), np.float32)
    asamps = np.full((u_pad,), 640, np.int32)
    for i, a in enumerate(audios):
        auds[i, : min(len(a), t_pad * 640)] = a[: t_pad * 640]
        asamps[i] = min(len(a), t_pad * 640)
    alens_pad = np.ones((u_pad,), np.int32)
    alens_pad[:u] = alens

    for rep in range(args.reps):
        t0 = time.perf_counter()
        memory, ctc_lp = enc_jit(
            weights, weights["ctc"], enc_cfg, enc_cfg,
            jnp.asarray(vids), jnp.asarray(vlens_pad),
            jnp.asarray(auds), jnp.asarray(asamps), jnp.asarray(alens_pad),
        )
        float(memory.mean())  # sync by fetching a scalar
        t1 = time.perf_counter()
        mem_np = np.asarray(memory, np.float32)
        ctc_np = np.asarray(ctc_lp, np.float32)
        t2 = time.perf_counter()
        tlens = np.minimum(vlens, alens)
        memories = [mem_np[i, :t] for i, t in enumerate(tlens)]
        ctc_lps = [ctc_np[i, :t] for i, t in enumerate(tlens)]
        beam(memories, ctc_lps)
        t3 = time.perf_counter()
        print(
            f"rep{rep}: encode_device {1e3*(t1-t0):7.1f} ms | "
            f"fetch {1e3*(t2-t1):7.1f} ms "
            f"({(mem_np.nbytes+ctc_np.nbytes)/1e6:.1f} MB) | "
            f"beam {1e3*(t3-t2):7.1f} ms | "
            f"total {1e3*(t3-t0):7.1f} ms = "
            f"{1e3*(t3-t0)/u:6.1f} ms/utt  (U={u}, T_pad={t_pad})",
            flush=True,
        )


if __name__ == "__main__":
    main()
