"""RelPrompt end-to-end synthetic probe (run on TPU; see BENCH_NOTES.md).

Closes the loop on the reference's headline feature
(ref: finetune/relprompt.py:347-403, inference/relprompt.py:94-173):

  synthetic corpus with KNOWN corruption spans
    -> joint classifier+LLM training (cli/finetune_relprompt)
    -> inference-time mask prediction + substitution + decode
       (cli/inference_relprompt)
    -> mask acc/P/R/F1 + WER, three ways:
       A. memorization: decode the TRAIN uids — expects ~0 WER and
          near-perfect mask metrics (the packing->train->substitute->
          decode->WER loop is consistent end to end)
       B. generalization: HELD-OUT uids — the classifiers must read the
          corruption pattern out of unseen features (mask metrics >>
          chance); WER is reported for the record
       C. ablation: the same memorized prompts decoded with WRONG
          (all-<<C>>) masks — predictions must change, proving the mask
          tokens actually condition the LLM

Features are deterministic functions of each record's corruption config
(a stand-in for the frozen Whisper/BRAVEn encoders): every feature frame
encodes whether its time span is corrupted, so bin labels are learnable
but not trivially present. Written to --feature_dir npz files, i.e. the
probe exercises the PRODUCTION feature loader, not a test shim.
"""

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")

import numpy as np

from dualhyp_tpu.data import masks as mask_lib
from dualhyp_tpu.data import synthetic

AUDIO_CHUNK = 6400   # samples per bin (0.4 s at 16 kHz)
VIDEO_CHUNK = 10     # frames per bin (0.4 s at 25 fps)
WHISPER_DIM = 24
RAVEN_DIM = 16
POOL = 2             # classifier_pool_size
SEED = 11


def write_checkpoint(ckpt_dir: Path, vocab, whisper_dim=None, raven_dim=None,
                     pool=None):
    whisper_dim = WHISPER_DIM if whisper_dim is None else whisper_dim
    raven_dim = RAVEN_DIM if raven_dim is None else raven_dim
    pool = POOL if pool is None else pool
    from tokenizers import Tokenizer as HFTok
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import WhitespaceSplit

    from dualhyp_tpu.ckpt.io import save_params
    from dualhyp_tpu.config import GPTConfig
    from dualhyp_tpu.models import gpt

    ckpt_dir.mkdir(parents=True, exist_ok=True)
    tok = HFTok(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = WhitespaceSplit()
    tok.add_special_tokens(["</s>", "<s>", "<<C>>", "<<M>>", "<<N>>"])
    tok.save(str(ckpt_dir / "tokenizer.json"))
    (ckpt_dir / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "eos_token": "</s>", "bos_token": "<s>", "model_max_length": 768,
    }))
    cfg = GPTConfig(
        name="relprompt-probe", block_size=768,
        vocab_size=len(tok.get_vocab()), padding_multiple=8,
        n_layer=4, n_head=8, n_query_groups=2, n_embd=128,
        rotary_percentage=1.0, parallel_residual=False, bias=False,
        norm_class="RMSNorm", mlp_class="LLaMAMLP", intermediate_size=256,
        lora_r=0,
        whisper_dim=whisper_dim, raven_dim=raven_dim,
        classifier_pool_size=pool, classifier_hidden_dim=64,
    )
    params = gpt.init(cfg, jax.random.key(0))
    save_params(ckpt_dir / "dualhyp_model.npz", params)
    (ckpt_dir / "dualhyp_config.json").write_text(cfg.to_json())
    return cfg


def synth_features(rec, rng):
    """Deterministic 'encoder features' that ENCODE the corruption: frame
    f's vector points along the clean or noisy direction by the corrupted
    fraction of its time span (what a real frozen encoder exposes)."""
    def frames(corr, chunk, dim, n_per_bin, force_noise):
        total = corr["total_len"]
        n_bins = -(-total // chunk)
        n_frames = n_bins * n_per_bin
        step = chunk / n_per_bin
        clean_dir = np.zeros(dim, np.float32)
        clean_dir[0] = 1.0
        noise_dir = np.zeros(dim, np.float32)
        noise_dir[1] = 1.0
        start, occ = corr["start_fr"], corr["occ_len"]
        out = np.empty((n_frames, dim), np.float32)
        for f in range(n_frames):
            lo, hi = f * step, (f + 1) * step
            ov = max(0.0, min(hi, start + occ) - max(lo, start))
            frac = ov / (hi - lo)
            vec = frac * noise_dir + (1 - frac) * clean_dir
            out[f] = vec + rng.normal(0, 0.05, dim).astype(np.float32)
        return out

    audio = frames(rec["Audio_Corruption"], AUDIO_CHUNK, WHISPER_DIM,
                   2 * POOL, False)
    visual = frames(rec["Visual_Corruption"], VIDEO_CHUNK, RAVEN_DIM,
                    POOL, True)
    return audio, visual


def write_features(feature_dir: Path, records):
    feature_dir.mkdir(parents=True, exist_ok=True)
    for rec in records:
        rng = np.random.default_rng(abs(hash(rec["Uid"])) % (2**31))
        audio, visual = synth_features(rec, rng)
        np.savez(feature_dir / f"{rec['Uid']}.npz", audio=audio, visual=visual)


def run_probe():
    from dualhyp_tpu.cli import finetune_relprompt, inference_relprompt

    tmp = Path(tempfile.mkdtemp(prefix="relprompt_probe_"))
    print(f"workdir: {tmp}", flush=True)

    vocab = {"<unk>": 0, "</s>": 1, "<s>": 2}
    for w in synthetic.word_vocabulary():
        vocab[w] = len(vocab)
    for w in ("Below", "###", "Response:", "the", "ASR", "VSR"):
        vocab.setdefault(w, len(vocab))
    ckpt = tmp / "ckpt"
    write_checkpoint(ckpt, vocab)

    train_recs = synthetic.make_records(n_uids=48, variants_per_uid=1, seed=1)
    test_recs = synthetic.make_records(n_uids=16, variants_per_uid=1, seed=2)
    for i, r in enumerate(test_recs):
        r["Uid"] = f"held{i:05d}"
    synthetic.write_json(tmp / "train.json", train_recs)
    synthetic.write_json(tmp / "val.json", train_recs[:8])
    synthetic.write_json(tmp / "test.json", test_recs)
    write_features(tmp / "features", train_recs + test_recs)

    import os
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        common_model = [
            "--llm_checkpoint", str(ckpt),
            "--feature_dir", str(tmp / "features"),
            "--prompts_format", "RelPrompt", "--dual_hypotheses",
            "--seed", str(SEED),
        ]
        finetune_relprompt.main([
            "--train_path", str(tmp / "train.json"),
            "--val_path", str(tmp / "val.json"),
            "--exp_name", "probe", "--mode", "full",
            "--batch_size", "8", "--micro_batch_size", "8",
            "--num_epochs", "80", "--lr", "1e-3",
            "--classifier_lr", "1e-3", "--mask_loss_weight", "0.05",
            "--log_interval", "60",
        ] + common_model)
        model_path = tmp / "runs" / "probe" / "model_relprompt_finetuned.npz"

        def infer(test_path, tag):
            inference_relprompt.main([
                "--test_path", str(test_path),
                "--model_path", str(model_path),
                "--decode_batch", "8", "--max_new_tokens", "20",
            ] + common_model)
            out = model_path.parent / "predictions" / (
                model_path.stem + "_relprompt.json"
            )
            rows = json.load(open(out))
            metrics = rows[-1]
            print(
                f"[{tag}] WER {metrics['WER']:.4f} "
                f"mask acc {metrics['mask_acc']:.4f} "
                f"P {metrics['mask_precision']:.4f} "
                f"R {metrics['mask_recall']:.4f} "
                f"F1 {metrics['mask_f1']:.4f}", flush=True,
            )
            return rows[:-1], metrics

        mem_records, mem = infer(tmp / "train.json", "A memorization")
        gen_records, gen = infer(tmp / "test.json", "B generalization")

        # C. ablation: decode the SAME memorized prompts with all-<<C>>
        # masks — the mask tokens must condition the output
        import jax.numpy as jnp

        from dualhyp_tpu.cli import common as cli_common
        from dualhyp_tpu.cli.inference_ger import run_inference
        from dualhyp_tpu.ckpt.io import load_params
        from dualhyp_tpu.cli.common import _overlay
        from dualhyp_tpu.data.hypotheses import DualHypothesesMaskDataset
        from dualhyp_tpu.data.prompts import MASK_TOKENS
        from dualhyp_tpu.models import relprompt as rp

        tokenizer = cli_common.load_tokenizer(ckpt)
        tokenizer.add_special_tokens({"additional_special_tokens": MASK_TOKENS})
        from dualhyp_tpu.registry import config_from_checkpoint

        model_cfg = config_from_checkpoint(
            ckpt, lora_r=0, use_relprompt=True, n_extra_tokens=3,
            whisper_dim=WHISPER_DIM, raven_dim=RAVEN_DIM,
            classifier_pool_size=POOL,
        )
        base = cli_common.load_base_params(
            ckpt, model_cfg.replace(n_extra_tokens=0, use_relprompt=False)
        )
        params = dict(base)
        params["audio_noise_classifier"] = rp.init_classifier(
            jax.random.key(0), WHISPER_DIM, model_cfg.classifier_hidden_dim
        )
        params["visual_noise_classifier"] = rp.init_classifier(
            jax.random.key(1), RAVEN_DIM, model_cfg.classifier_hidden_dim
        )
        params = rp.extend_embeddings(params, jax.random.key(2), 3)
        params = _overlay(params, load_params(model_path))

        ds = DualHypothesesMaskDataset(
            "test", str(tmp / "train.json"), tokenizer=tokenizer,
            prompts_format="RelPrompt", seed=SEED, leave_masks=True,
        )
        examples = []
        for i in range(len(ds)):
            ex = ds[i]
            prompt = ex.prompt_no_response.replace(
                "<<<ASR_MASKS>>>", "<<C>>" * len(ex.audio_bin_labels)
            ).replace("<<<VSR_MASKS>>>", "<<C>>" * len(ex.video_bin_labels))
            ex.prompt_no_response = prompt
            ex.input_ids_no_response = list(tokenizer.encode(prompt))
            examples.append(ex)

        class _L:
            def __init__(s, it):
                s.it = it
            def __len__(s):
                return len(s.it)
            def __getitem__(s, i):
                return s.it[i]

        allc_records, allc = run_inference(
            params, model_cfg, tokenizer, _L(examples), decode_batch=8,
            max_new_tokens=20, compute_dtype=jnp.bfloat16,
        )
        by_uid = {r["uid"]: r["inference"] for r in mem_records}
        changed = sum(
            1 for r in allc_records if by_uid.get(r["uid"]) != r["inference"]
        )
        print(
            f"[C ablation] all-<<C>> masks: WER {allc['WER']:.4f} "
            f"(predicted-mask WER {mem['WER']:.4f}); "
            f"{changed}/{len(allc_records)} predictions changed", flush=True,
        )
        print(json.dumps({
            "memorization": {"WER": mem["WER"], "mask_acc": mem["mask_acc"],
                             "mask_f1": mem["mask_f1"]},
            "generalization": {"WER": gen["WER"], "mask_acc": gen["mask_acc"],
                               "mask_f1": gen["mask_f1"]},
            "ablation_changed": changed,
            "ablation_WER": allc["WER"],
        }))
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    run_probe()
