"""VSR n-best generation timing at BRAVEn-large shape (real TPU).

Random weights at the real architecture sizes (throughput depends on
shapes): conv3d frontend -> 24-layer rel-pos conformer encoder (dim
1024) -> joint CTC/attention beam (beam 40, unigram1000 vocab) — the
reference's make_json_vsr pipeline (ref: data/make_json_vsr.py:166-209).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")

import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.models import espnet_decoder as ed
from dualhyp_tpu.models import raven


def rnd_params(key):
    counter = [0]

    def rnd(shape, scale=0.05):
        counter[0] += 1
        return jax.random.normal(jax.random.fold_in(key, counter[0]), shape) * scale

    def lin(o, i, bias=True):
        leaf = {"weight": rnd((o, i))}
        if bias:
            leaf["bias"] = jnp.zeros((o,))
        return leaf

    def ln(d):
        return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    return rnd, lin, ln


def build_encoder(enc_cfg, key):
    rnd, lin, ln = rnd_params(key)
    d, h = enc_cfg.attention_dim, enc_cfg.attention_heads
    lu = enc_cfg.linear_units
    layers = {}
    for i in range(enc_cfg.num_blocks):
        layers[str(i)] = {
            "norm_mha": ln(d),
            "self_attn": {
                "linear_q": lin(d, d), "linear_k": lin(d, d),
                "linear_v": lin(d, d), "linear_out": lin(d, d),
                "linear_pos": {"weight": rnd((d, d))},
                "pos_bias_u": rnd((h, d // h)),
                "pos_bias_v": rnd((h, d // h)),
            },
            "norm_ff": ln(d),
            "feed_forward": {"w_1": lin(lu, d), "w_2": lin(d, lu)},
        }
    return {
        "embed": {"linear": lin(d, enc_cfg.idim), "norm": ln(d)},
        "layers": layers,
        "after_norm": ln(d),
    }


def build_decoder(dec_cfg, key):
    rnd, lin, ln = rnd_params(key)
    dd, lu = dec_cfg.attention_dim, dec_cfg.linear_units
    layers = {}
    for i in range(dec_cfg.num_blocks):
        layers[str(i)] = {
            "norm1": ln(dd), "norm2": ln(dd), "norm3": ln(dd),
            "self_attn": {"linear_q": lin(dd, dd), "linear_k": lin(dd, dd),
                          "linear_v": lin(dd, dd), "linear_out": lin(dd, dd)},
            "src_attn": {"linear_q": lin(dd, dd), "linear_k": lin(dd, dd),
                         "linear_v": lin(dd, dd), "linear_out": lin(dd, dd)},
            "feed_forward": {"w_1": lin(lu, dd), "w_2": lin(dd, lu)},
        }
    return {
        "embed": {"weight": rnd((dec_cfg.odim, dd))},
        "layers": layers,
        "after_norm": ln(dd),
        "output_layer": lin(dec_cfg.odim, dd),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--beam", type=int, default=40)
    ap.add_argument("--frames", type=int, default=100, help="~4 s at 25 fps")
    ap.add_argument("--max_len", type=int, default=40)
    ap.add_argument("--utts", type=int, default=8,
                    help="lockstep batch width for the device beam")
    ap.add_argument("--chunk_steps", type=int, default=None,
                    help="beam steps per host sync (default: adaptive)")
    ap.add_argument("--ctc_impl", default=None, choices=("seq", "assoc"),
                    help="CTC frame-recursion implementation A/B "
                         "(sets DUALHYP_CTC_IMPL; default assoc)")
    ap.add_argument("--host_beam", action="store_true",
                    help="also time the host-driven per-utterance beam")
    args = ap.parse_args()
    if args.ctc_impl:
        import os

        os.environ["DUALHYP_CTC_IMPL"] = args.ctc_impl

    from dualhyp_tpu.infer.beam_search import nbest_texts, BeamHypothesis
    from dualhyp_tpu.infer.ctc_prefix import CTCPrefixScorer
    from dualhyp_tpu.infer.joint_beam_search import (
        joint_beam_search, static_shape_att_fn,
    )

    enc_cfg = raven.BRAVEN_LARGE
    vocab = 1049
    dec_cfg = ed.EspnetDecoderConfig(
        odim=vocab, attention_dim=enc_cfg.attention_dim,
        attention_heads=16, linear_units=4096, num_blocks=6,
    )
    enc_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), build_encoder(enc_cfg, jax.random.key(0))
    )
    dec_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), build_decoder(dec_cfg, jax.random.key(1))
    )
    rnd, lin, _ = rnd_params(jax.random.key(2))
    ctc_params = {"ctc_lo": lin(vocab, enc_cfg.attention_dim)}

    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.normal(size=(1, args.frames, enc_cfg.idim)), jnp.bfloat16
    )

    encode = jax.jit(lambda p, f: raven.encode(p, enc_cfg, f))
    memory = jax.block_until_ready(encode(enc_params, feats))
    t0 = time.perf_counter()
    memory = jax.block_until_ready(encode(enc_params, feats))
    t_enc = time.perf_counter() - t0

    def run():
        ctc_lp = np.asarray(ed.ctc_log_probs(ctc_params, memory))[0]
        scorer = CTCPrefixScorer(ctc_lp, blank=0, eos=vocab - 1)
        att_fn = static_shape_att_fn(
            dec_params, dec_cfg, memory, args.beam
        )
        hyps = joint_beam_search(
            att_fn, scorer, sos=vocab - 1, eos=vocab - 1,
            beam_size=args.beam,
            weights={"decoder": 0.9, "ctc": 0.1},
            max_len=args.max_len,
        )
        return hyps

    if args.host_beam:
        hyps = run()  # compile warm
        t0 = time.perf_counter()
        hyps = run()
        t_beam = time.perf_counter() - t0
        print(
            f"BRAVEn-large VSR host beam: encode {args.frames} frames "
            f"{t_enc*1e3:.1f} ms; joint beam-{args.beam} ({args.max_len} "
            f"steps max): {t_beam*1e3:.0f} ms -> total "
            f"{(t_enc+t_beam)*1e3:.0f} ms/utterance "
            f"({len(hyps)} finished hyps)"
        )

    # lockstep device beam over --utts utterances (the production path)
    from dualhyp_tpu.infer.joint_device_beam import joint_device_beam_batch

    ctc_lp = np.asarray(ed.ctc_log_probs(ctc_params, memory))[0]
    mem_np = np.asarray(memory, np.float32)[0]
    memories = [mem_np] * args.utts
    ctc_lps = [ctc_lp] * args.utts

    def run_batched():
        return joint_device_beam_batch(
            dec_params, dec_cfg, memories, ctc_lps,
            sos=vocab - 1, eos=vocab - 1, beam_size=args.beam,
            weights={"decoder": 0.9, "ctc": 0.1}, max_len=args.max_len,
            chunk_steps=args.chunk_steps,
        )

    out = run_batched()  # compile warm
    t0 = time.perf_counter()
    out = run_batched()
    t_batch = time.perf_counter() - t0
    print(
        f"BRAVEn-large VSR device beam: {args.utts} utterances lockstep, "
        f"beam {args.beam}, {args.max_len} steps max: {t_batch*1e3:.0f} ms "
        f"-> {t_batch/args.utts*1e3:.0f} ms/utterance (+{t_enc*1e3:.1f} ms "
        f"encode); {len(out[0])} hyps/utt"
    )


if __name__ == "__main__":
    main()
