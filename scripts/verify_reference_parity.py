"""Token-for-token parity check vs the torch reference (BASELINE north star).

Given a converted checkpoint dir and a hypotheses JSON, decodes every test
prompt with the reference eval protocol (greedy, temp 0.2 / top_k 1,
max_new 150, EOS stop — inference/ger.py:71-81) and either:

  * --reference_predictions <json>: compares our outputs against a
    predictions JSON produced by the torch reference, reporting exact-match
    rate and diverging uids, or
  * standalone: writes our predictions JSON in the reference's format for
    later comparison.

Usage:
  python scripts/verify_reference_parity.py \\
      --test_path test.json --llm_checkpoint checkpoints/TinyLlama/... \\
      --model_path runs/exp/best_model.npz \\
      [--reference_predictions ref_preds.json]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--test_path", required=True)
    parser.add_argument("--llm_checkpoint", required=True)
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--reference_predictions", default=None)
    parser.add_argument("--dual_hypotheses", action="store_true")
    parser.add_argument("--prompts_format", default="DualHyp")
    parser.add_argument("--out", default="our_predictions.json")
    args = parser.parse_args()

    from dualhyp_tpu.cli import common
    from dualhyp_tpu.cli.inference_ger import run_inference

    ns = argparse.Namespace(
        llm_checkpoint=args.llm_checkpoint,
        lora_r=16, lora_alpha=16, lora_dropout=0.05,
        lora_query=True, lora_key=True, lora_value=True,
        lora_projection=True, lora_mlp=False, lora_head=False,
    )
    common.check_valid_checkpoint_dir(args.llm_checkpoint)
    tokenizer = common.load_tokenizer(args.llm_checkpoint)
    cfg = common.model_config_from_args(ns)
    params = common.load_base_params(Path(args.llm_checkpoint), cfg)
    if args.model_path:
        from dualhyp_tpu.ckpt.io import load_params
        from dualhyp_tpu.cli.common import _overlay

        params = _overlay(params, load_params(args.model_path))

    ds_cls = common.dataset_class_for(
        argparse.Namespace(
            dual_hypotheses=args.dual_hypotheses, prompts_format=args.prompts_format
        )
    )
    dataset = ds_cls(
        "test", args.test_path, tokenizer=tokenizer,
        prompts_format=args.prompts_format, seed=1337,
        random_sample_nhyps=False,  # deterministic prompt for comparison
    )
    records, metrics = run_inference(
        params, cfg, tokenizer, dataset, decode_batch=8, max_new_tokens=150,
        temperature=0.2, top_k=1,
    )
    with open(args.out, "w", encoding="utf-8") as fp:
        json.dump(records + [metrics], fp, indent=4, ensure_ascii=False)
    print(f"ours: WER {metrics['WER']*100:.2f}, written to {args.out}")

    if args.reference_predictions:
        with open(args.reference_predictions, encoding="utf-8") as fp:
            ref_rows = [r for r in json.load(fp) if "inference" in r]
        ref_by_uid = {r.get("uid", i): r["inference"]
                      for i, r in enumerate(ref_rows)}
        ours_by_uid = {r["uid"]: r["inference"] for r in records}
        common_uids = set(ref_by_uid) & set(ours_by_uid)
        diverged = [
            u for u in common_uids if ref_by_uid[u].strip() != ours_by_uid[u].strip()
        ]
        n = len(common_uids)
        print(
            f"token-for-token: {n - len(diverged)}/{n} exact "
            f"({(n - len(diverged)) / max(n,1) * 100:.2f}%)"
        )
        for u in diverged[:10]:
            print(f"  uid {u}:\n    ref : {ref_by_uid[u]}\n    ours: {ours_by_uid[u]}")


if __name__ == "__main__":
    main()
