"""Download a base LLM checkpoint from the HF hub and convert it.

Replaces scripts/download.py + scripts/convert_hf_checkpoint.py of the
reference in one step:

  python -m dualhyp_tpu.cli.download --repo_id TinyLlama/TinyLlama-1.1B-Chat-v1.0

Requires network access (huggingface_hub). In air-gapped environments,
place the HF files under checkpoints/<org>/<name>/ and run
`python -m dualhyp_tpu.ckpt.convert_hf --checkpoint_dir ...` directly.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--repo_id", required=True)
    parser.add_argument("--checkpoint_root", default="checkpoints")
    parser.add_argument("--dtype", default=None)
    parser.add_argument("--convert", type=bool, default=True)
    args = parser.parse_args(argv)

    target = Path(args.checkpoint_root) / args.repo_id
    target.mkdir(parents=True, exist_ok=True)
    from huggingface_hub import snapshot_download

    snapshot_download(
        args.repo_id,
        local_dir=target,
        allow_patterns=[
            "*.safetensors*",
            "tokenizer*",
            "*.json",
            "*.model",
        ],
    )
    print(f"downloaded to {target}")
    if args.convert:
        from dualhyp_tpu.ckpt.convert_hf import convert_hf_checkpoint

        out = target / "dualhyp_model.npz"
        convert_hf_checkpoint(target, target.name, out, args.dtype)
        print(f"converted -> {out}")


if __name__ == "__main__":
    main()
