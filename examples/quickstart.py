"""End-to-end quickstart on synthetic data (no downloads needed).

Generates a synthetic DualHyp corpus, builds a tiny word-level tokenizer +
random-weight checkpoint, LoRA-finetunes for one epoch, and evaluates WER —
the full L0..L6 pipeline in one script.

  python examples/quickstart.py [workdir]

For real experiments, swap the checkpoint for a converted TinyLlama
(`python -m dualhyp_tpu.cli.download --repo_id TinyLlama/TinyLlama-1.1B-Chat-v1.0`)
and the corpus for the released DualHyp hypotheses JSONs.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def build_checkpoint(ckpt_dir: Path):
    import jax
    from tokenizers import Tokenizer as HFTok
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import WhitespaceSplit

    from dualhyp_tpu.ckpt.io import save_params
    from dualhyp_tpu.config import GPTConfig
    from dualhyp_tpu.data import synthetic
    from dualhyp_tpu.models import gpt

    ckpt_dir.mkdir(parents=True, exist_ok=True)
    vocab = {"<unk>": 0, "</s>": 1}
    for w in synthetic.word_vocabulary():
        vocab[w] = len(vocab)
    tok = HFTok(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = WhitespaceSplit()
    tok.add_special_tokens(["</s>"])
    tok.save(str(ckpt_dir / "tokenizer.json"))
    (ckpt_dir / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "PreTrainedTokenizerFast",
                    "eos_token": "</s>", "model_max_length": 512})
    )
    cfg = GPTConfig(
        name="quickstart-tiny",
        block_size=768,
        vocab_size=len(vocab),
        padding_multiple=8,
        n_layer=4,
        n_head=8,
        n_query_groups=2,
        n_embd=128,
        rotary_percentage=1.0,
        parallel_residual=False,
        bias=False,
        norm_class="RMSNorm",
        mlp_class="LLaMAMLP",
        intermediate_size=256,
    )
    save_params(ckpt_dir / "dualhyp_model.npz", gpt.init(cfg, jax.random.key(0)))
    (ckpt_dir / "dualhyp_config.json").write_text(cfg.to_json())


def main():
    workdir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/dualhyp_quickstart")
    workdir.mkdir(parents=True, exist_ok=True)

    from dualhyp_tpu.data import synthetic

    for split, seed in (("train", 1), ("val", 2), ("test", 3)):
        synthetic.write_json(
            workdir / f"{split}.json",
            synthetic.make_records(n_uids=16, variants_per_uid=2, seed=seed),
        )
    ckpt = workdir / "checkpoint"
    build_checkpoint(ckpt)

    import os

    os.chdir(workdir)
    from dualhyp_tpu.cli import finetune_ger, inference_ger

    print("== finetune (DualHyp, 1 epoch) ==")
    finetune_ger.main([
        "--train_path", str(workdir / "train.json"),
        "--val_path", str(workdir / "val.json"),
        "--llm_checkpoint", str(ckpt),
        "--exp_name", "quickstart",
        "--dual_hypotheses", "--prompts_format", "DualHyp",
        "--batch_size", "4", "--micro_batch_size", "4",
        "--num_epochs", "1", "--lr", "3e-3", "--log_interval", "4",
    ])
    print("== inference + WER ==")
    inference_ger.main([
        "--test_path", str(workdir / "test.json"),
        "--model_path", str(workdir / "runs/quickstart/best_model.npz"),
        "--llm_checkpoint", str(ckpt),
        "--dual_hypotheses", "--prompts_format", "DualHyp",
        "--decode_batch", "4", "--max_new_tokens", "16",
    ])


if __name__ == "__main__":
    main()
