"""CLI entry-point smoke tests on a tiny self-contained checkpoint dir."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from dualhyp_tpu.data import synthetic
from tests import helpers


def _write_tokenizer(ckpt_dir: Path):
    from tokenizers import Tokenizer as HFTok
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import WhitespaceSplit

    words = synthetic.word_vocabulary()
    vocab = {"<unk>": 0, "</s>": 1, "<s>": 2}
    for w in words:
        vocab[w] = len(vocab)
    # words seen in prompt templates
    for w in ("Below", "###", "Response:", "the", "ASR", "VSR"):
        vocab.setdefault(w, len(vocab))
    tok = HFTok(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = WhitespaceSplit()
    tok.add_special_tokens(["</s>", "<s>", "<<C>>", "<<M>>", "<<N>>"])
    tok.save(str(ckpt_dir / "tokenizer.json"))
    with open(ckpt_dir / "tokenizer_config.json", "w") as fp:
        json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "eos_token": "</s>",
                "bos_token": "<s>",
                "model_max_length": 512,
            },
            fp,
        )
    return len(tok.get_vocab())


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    ckpt_dir = tmp_path_factory.mktemp("ckpt") / "tiny-llama-test"
    ckpt_dir.mkdir()
    vocab_size = _write_tokenizer(ckpt_dir)

    cfg = helpers.tiny_llama_config(
        block_size=640, vocab_size=vocab_size, padding_multiple=8
    )
    from dualhyp_tpu.ckpt.io import save_params
    from dualhyp_tpu.models import gpt

    params = gpt.init(cfg, jax.random.key(0))
    save_params(ckpt_dir / "dualhyp_model.npz", params)
    with open(ckpt_dir / "dualhyp_config.json", "w") as fp:
        fp.write(cfg.to_json())
    return ckpt_dir


@pytest.fixture(scope="module")
def corpus_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    for split, seed in (("train", 1), ("val", 2), ("test", 3)):
        synthetic.write_json(
            d / f"{split}.json", synthetic.make_records(n_uids=4, seed=seed)
        )
    return d


@pytest.mark.slow
def test_finetune_and_inference_ger_cli(tiny_checkpoint, corpus_files, tmp_path,
                                        monkeypatch):
    monkeypatch.chdir(tmp_path)
    from dualhyp_tpu.cli import finetune_ger, inference_ger

    finetune_ger.main(
        [
            "--train_path", str(corpus_files / "train.json"),
            "--val_path", str(corpus_files / "val.json"),
            "--llm_checkpoint", str(tiny_checkpoint),
            "--exp_name", "smoke",
            "--dual_hypotheses", "--prompts_format", "DualHyp",
            "--batch_size", "2", "--micro_batch_size", "2",
            "--num_epochs", "1", "--log_interval", "1",
        ]
    )
    run_dir = tmp_path / "runs" / "smoke"
    assert (run_dir / "best_model.npz").is_file()
    assert (run_dir / "model_lora_finetuned.npz").is_file()
    assert (run_dir / "train.log").is_file()

    inference_ger.main(
        [
            "--test_path", str(corpus_files / "test.json"),
            "--model_path", str(run_dir / "best_model.npz"),
            "--llm_checkpoint", str(tiny_checkpoint),
            "--dual_hypotheses", "--prompts_format", "DualHyp",
            "--decode_batch", "2", "--max_new_tokens", "6",
        ]
    )
    predictions = list((run_dir / "predictions").glob("*.json"))
    assert predictions
    with open(predictions[0]) as fp:
        rows = json.load(fp)
    assert "WER" in rows[-1] and "p50_latency_s" in rows[-1]

    # hypothesis-anchored speculative decoding must be token-identical:
    # same WER through the same protocol
    inference_ger.main(
        [
            "--test_path", str(corpus_files / "test.json"),
            "--model_path", str(run_dir / "best_model.npz"),
            "--llm_checkpoint", str(tiny_checkpoint),
            "--dual_hypotheses", "--prompts_format", "DualHyp",
            "--decode_batch", "2", "--max_new_tokens", "6",
            "--speculative", "anchored", "--draft_len", "4",
        ]
    )
    spec_rows = json.load(open(sorted(
        (run_dir / "predictions").glob("*.json")
    )[-1]))
    assert spec_rows[-1]["WER"] == rows[-1]["WER"]


@pytest.mark.slow
def test_finetune_ger_cli_adapter_mode(tiny_checkpoint, corpus_files, tmp_path,
                                       monkeypatch):
    """--mode adapter must train ADAPTER leaves, not LoRA: the saved PEFT
    checkpoint carries adapter_wte/gating_factor and no lora_* (regression:
    the mode flag once never reached the model config)."""
    monkeypatch.chdir(tmp_path)
    from dualhyp_tpu.ckpt.io import load_params
    from dualhyp_tpu.cli import finetune_ger

    finetune_ger.main(
        [
            "--train_path", str(corpus_files / "train.json"),
            "--val_path", str(corpus_files / "val.json"),
            "--llm_checkpoint", str(tiny_checkpoint),
            "--exp_name", "smoke_adapter", "--mode", "adapter_v2",
            "--batch_size", "2", "--micro_batch_size", "2",
            "--num_epochs", "1", "--log_interval", "1",
        ]
    )
    run_dir = tmp_path / "runs" / "smoke_adapter"
    saved = load_params(run_dir / "best_model.npz")
    keys = []

    def visit(path, _):
        keys.append("/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        ))

    jax.tree_util.tree_map_with_path(visit, saved)
    assert any("adapter_wte" in k for k in keys)
    assert any("gating_factor" in k for k in keys)
    assert any("adapter_scale" in k for k in keys)
    assert not any("lora_A" in k for k in keys)


@pytest.mark.slow
def test_finetune_and_inference_relprompt_cli(tiny_checkpoint, corpus_files,
                                              tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from dualhyp_tpu.cli import finetune_relprompt, inference_relprompt

    common_flags = [
        "--llm_checkpoint", str(tiny_checkpoint),
        "--dual_hypotheses", "--prompts_format", "RelPrompt",
        "--synthetic_features",
    ]
    finetune_relprompt.main(
        [
            "--train_path", str(corpus_files / "train.json"),
            "--val_path", str(corpus_files / "val.json"),
            "--exp_name", "smoke_rp",
            "--micro_batch_size", "2", "--num_epochs", "1",
            "--log_interval", "1",
        ]
        + common_flags
    )
    run_dir = tmp_path / "runs" / "smoke_rp"
    assert (run_dir / "best_model.npz").is_file()

    inference_relprompt.main(
        [
            "--test_path", str(corpus_files / "test.json"),
            "--model_path", str(run_dir / "best_model.npz"),
            "--decode_batch", "2", "--max_new_tokens", "6",
        ]
        + common_flags
    )
    predictions = list((run_dir / "predictions").glob("*_relprompt.json"))
    assert predictions
    with open(predictions[0]) as fp:
        rows = json.load(fp)
    assert "mask_acc" in rows[-1]


def test_generate_cli(tiny_checkpoint, capsys):
    from dualhyp_tpu.cli import generate as gen_cli

    gen_cli.main(
        [
            "--prompt", "the quick brown",
            "--llm_checkpoint", str(tiny_checkpoint),
            "--max_new_tokens", "4",
            "--num_samples", "1",
            "--top_k", "1",
            "--quantize", "int8",
        ]
    )
    out = capsys.readouterr().out
    assert "tok/s" in out


@pytest.mark.slow
def test_finetune_ger_cli_resume_and_prefetch(tiny_checkpoint, corpus_files,
                                              tmp_path, monkeypatch):
    """--data_prefetch trains through the producer-thread pipeline, writes
    the epoch-boundary train_state, and --resume continues from it."""
    monkeypatch.chdir(tmp_path)
    from dualhyp_tpu.cli import finetune_ger

    args = [
        "--train_path", str(corpus_files / "train.json"),
        "--val_path", str(corpus_files / "val.json"),
        "--llm_checkpoint", str(tiny_checkpoint),
        "--exp_name", "resume_smoke",
        "--dual_hypotheses", "--prompts_format", "DualHyp",
        "--batch_size", "2", "--micro_batch_size", "2",
        "--num_epochs", "1", "--log_interval", "1",
        "--data_prefetch",
    ]
    finetune_ger.main(args)
    run_dir = tmp_path / "runs" / "resume_smoke"
    state = run_dir / "train_state.npz"
    assert state.is_file()

    # epoch 0 done -> a resumed 2-epoch run trains exactly epoch 1
    args_resume = [a for a in args]
    args_resume[args_resume.index("--num_epochs") + 1] = "2"
    finetune_ger.main(args_resume + ["--resume"])
    assert (run_dir / "model_lora_finetuned.npz").is_file()
