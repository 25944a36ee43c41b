"""RelPrompt inference: predict reliability masks, substitute them into the
prompt, re-encode, decode, evaluate.

Parity with the reference flow (ref: inference/relprompt.py:35-263):
dataset built with leave_masks=True keeps the `<<<ASR_MASKS>>>` /
`<<<VSR_MASKS>>>` placeholders (ref: :69); per sample the classifiers run
over frozen encoder features, argmax class ids become `<<C>>`-style strings,
the placeholders are string-replaced and the prompt RE-ENCODED
(ref: :145-157); decoding + WER protocol matches inference_ger; mask
classification metrics are reported alongside (ref: :215-257).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.cli import common
from dualhyp_tpu.cli.finetune_relprompt import feature_loader
from dualhyp_tpu.data.prompts import MASK_TOKENS

_CLASS_TOKENS = ["<<C>>", "<<M>>", "<<N>>"]


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--test_path", type=str, required=True)
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--seed", type=int, default=1337)
    parser.add_argument("--decode_batch", type=int, default=8)
    parser.add_argument("--max_new_tokens", type=int, default=150)
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--top_k", type=int, default=1)
    parser.add_argument("--speculative", action="store_true",
                        help="prompt-lookup speculative decoding (greedy "
                             "only, token-identical; see inference_ger)")
    parser.add_argument("--draft_len", type=int, default=8)
    parser.add_argument("--scheduler", choices=["lockstep", "continuous"],
                        default="lockstep")
    parser.add_argument("--mask_threshold", type=float, default=None)
    parser.add_argument("--time_window", type=float, default=0.4)
    parser.add_argument("--feature_dir", type=str, default=None)
    parser.add_argument("--synthetic_features", action="store_true")
    parser.add_argument("--whisper_checkpoint", type=str, default=None)
    common.add_model_args(parser)
    common.add_data_args(parser)
    return parser


def predict_masks(params, cfg, example, loader, rng):
    """Run both classifiers; return (audio_tokens, visual_tokens, class ids)."""
    from dualhyp_tpu.models import relprompt as rp

    audio_feats, visual_feats = loader(example, rng)
    a_logits = rp.classifier_forward(
        params["audio_noise_classifier"],
        jnp.asarray(audio_feats[None]),
        2 * cfg.classifier_pool_size,
    )
    v_logits = rp.classifier_forward(
        params["visual_noise_classifier"],
        jnp.asarray(visual_feats[None]),
        cfg.classifier_pool_size,
    )
    a_ids = np.asarray(jnp.argmax(a_logits[0], -1))
    v_ids = np.asarray(jnp.argmax(v_logits[0], -1))
    a_tokens = [_CLASS_TOKENS[i] for i in a_ids]
    v_tokens = [_CLASS_TOKENS[i] for i in v_ids]
    return a_tokens, v_tokens, a_ids, v_ids


def substitute_and_encode(tokenizer, example, a_tokens, v_tokens):
    """String-replace the mask placeholders and re-encode
    (ref: inference/relprompt.py:153-157)."""
    prompt = example.prompt_no_response.replace(
        "<<<ASR_MASKS>>>", "".join(a_tokens)
    ).replace("<<<VSR_MASKS>>>", "".join(v_tokens))
    return prompt, list(tokenizer.encode(prompt))


def main(argv=None):
    args = build_parser().parse_args(argv)

    from dualhyp_tpu.ckpt.io import load_params
    from dualhyp_tpu.cli.common import _overlay
    from dualhyp_tpu.cli.inference_ger import run_inference
    from dualhyp_tpu.data import masks as mask_lib
    from dualhyp_tpu.data.hypotheses import DualHypothesesMaskDataset
    from dualhyp_tpu.models import relprompt as rp

    checkpoint_dir = Path(args.llm_checkpoint)
    tokenizer = common.load_tokenizer(checkpoint_dir)
    try:
        tokenizer.add_special_tokens({"additional_special_tokens": MASK_TOKENS})
    except TypeError:
        tokenizer.add_special_tokens(MASK_TOKENS)

    model_cfg = common.model_config_from_args(args, relprompt=True)
    import jax

    base = common.load_base_params(
        checkpoint_dir, model_cfg.replace(n_extra_tokens=0, use_relprompt=False)
    )
    params = dict(base)
    params["audio_noise_classifier"] = rp.init_classifier(
        jax.random.key(0), model_cfg.whisper_dim, model_cfg.classifier_hidden_dim
    )
    params["visual_noise_classifier"] = rp.init_classifier(
        jax.random.key(1), model_cfg.raven_dim, model_cfg.classifier_hidden_dim
    )
    params = rp.extend_embeddings(params, jax.random.key(2), model_cfg.n_extra_tokens)
    params = _overlay(params, load_params(args.model_path))

    dataset = DualHypothesesMaskDataset(
        "test",
        args.test_path,
        tokenizer=tokenizer,
        max_nhyps=args.max_nhyps,
        prompts_format=args.prompts_format or "RelPrompt",
        apply_chat_template=args.apply_chat_template,
        language=args.language,
        seed=args.seed,
        leave_masks=True,
        mask_threshold=args.mask_threshold,
        time_window=args.time_window,
        audio_corruption_enabled=not args.audio_corruption_disabled,
        visual_corruption_enabled=not args.visual_corruption_disabled,
    )
    loader = feature_loader(args, model_cfg)
    feat_rng = np.random.default_rng(args.seed)

    # substitute predicted masks into every prompt, collect mask metrics
    all_pred, all_targ = [], []
    examples = []
    for i in range(len(dataset)):
        ex = dataset[i]
        a_tokens, v_tokens, a_ids, v_ids = predict_masks(
            params, model_cfg, ex, loader, feat_rng
        )
        prompt, ids = substitute_and_encode(tokenizer, ex, a_tokens, v_tokens)
        ex.prompt_no_response = prompt
        ex.input_ids_no_response = ids
        gt_a = mask_lib.bins_to_indices(ex.audio_bin_labels)
        gt_v = mask_lib.bins_to_indices(ex.video_bin_labels)
        ta = min(len(a_ids), len(gt_a))
        tv = min(len(v_ids), len(gt_v))
        all_pred.extend(list(a_ids[:ta]) + list(v_ids[:tv]))
        all_targ.extend(gt_a[:ta] + gt_v[:tv])
        examples.append(ex)

    class _ListDataset:
        def __init__(self, items):
            self.items = items

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    records, metrics = run_inference(
        params,
        model_cfg,
        tokenizer,
        _ListDataset(examples),
        decode_batch=args.decode_batch,
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature,
        top_k=args.top_k,
        collect_latency=True,
        speculative=args.speculative,
        draft_len=args.draft_len,
        scheduler=args.scheduler,
    )
    metrics.update(
        {f"mask_{k}": v for k, v in rp.mask_metrics(
            np.asarray(all_pred), np.asarray(all_targ)
        ).items()}
    )
    predict_dir = Path(args.model_path).parent / "predictions"
    predict_dir.mkdir(parents=True, exist_ok=True)
    out_path = predict_dir / (Path(args.model_path).stem + "_relprompt.json")
    with open(out_path, "w", encoding="utf-8") as fp:
        json.dump(records + [metrics], fp, indent=4, ensure_ascii=False)
    print(
        f"WER: {metrics['WER']*100:.2f}  mask acc: {metrics['mask_acc']*100:.2f}  "
        f"mask F1: {metrics['mask_f1']*100:.2f}"
    )
    print(f"Results in {out_path}")


if __name__ == "__main__":
    main()
