"""End-to-end slice: synthetic DualHyp corpus -> LoRA finetune -> batched
greedy correction -> WER report (the reference's minimum viable pipeline:
L0+L1+L3+L4+L5+L6)."""

import jax
import numpy as np
import pytest

from dualhyp_tpu.data import collate, hypotheses, synthetic
from dualhyp_tpu.models import gpt
from dualhyp_tpu.train import TrainConfig, Trainer
from tests import helpers
from tests.test_data import WordTokenizer


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "hyps.json"
    synthetic.write_json(path, synthetic.make_records(n_uids=6, seed=5))
    return str(path)


@pytest.mark.slow
def test_e2e_train_then_infer(corpus):
    tok = WordTokenizer()
    cfg = helpers.tiny_llama_config(
        block_size=640,
        vocab_size=len(tok.vocab),
        padding_multiple=8,
        lora_r=4,
        lora_alpha=8,
        lora_query=True,
        lora_key=True,
        lora_value=True,
        lora_projection=True,
    )
    ds = hypotheses.DualHypothesesDataset(
        "train", corpus, tok, prompts_format="DualHyp", seed=3, max_input_length=448
    )
    params = gpt.init(cfg, jax.random.key(0))
    tcfg = TrainConfig(
        learning_rate=1e-3,
        batch_size=2,
        micro_batch_size=2,
        compute_dtype="float32",
        lm_head_chunk_size=0,
    )
    trainer = Trainer(cfg, tcfg, params)
    rng = jax.random.key(1)
    losses = []
    for epoch in range(2):
        for batch in collate.epoch_batches(
            ds, 2, shuffle=True, seed=0, epoch=epoch,
            buckets=(448,),
        ):
            rng, key = jax.random.split(rng)
            loss, _ = trainer.train_step(batch, max_iters=100, warmup_steps=2, rng=key)
            losses.append(loss)
    assert np.isfinite(losses).all()

    # inference over the test split with the finetuned params
    from dualhyp_tpu.cli.inference_ger import run_inference

    test_ds = hypotheses.DualHypothesesDataset(
        "test", corpus, tok, prompts_format="DualHyp", seed=3
    )
    import jax.numpy as jnp

    records, metrics = run_inference(
        trainer.params,
        cfg,
        tok,
        test_ds,
        decode_batch=2,
        max_new_tokens=8,
        compute_dtype=jnp.float32,
        collect_latency=True,
    )
    assert len(records) == len(test_ds)
    assert {"WER", "gtms", "post_ST_wer", "post_gtms"} <= set(metrics)
    assert metrics["p50_latency_s"] > 0

    # prompt-lookup speculative decoding is token-identical end to end
    spec_records, spec_metrics = run_inference(
        trainer.params,
        cfg,
        tok,
        test_ds,
        decode_batch=2,
        max_new_tokens=8,
        compute_dtype=jnp.float32,
        speculative=True,
        draft_len=4,
    )
    assert [r["inference"] for r in spec_records] == [
        r["inference"] for r in records
    ]
    assert spec_metrics["WER"] == metrics["WER"]

    # continuous-batching scheduler end-to-end: same predictions again
    cont_records, cont_metrics = run_inference(
        trainer.params,
        cfg,
        tok,
        test_ds,
        decode_batch=2,
        max_new_tokens=8,
        compute_dtype=jnp.float32,
        scheduler="continuous",
        draft_len=4,
        collect_latency=True,
    )
    assert [r["inference"] for r in cont_records] == [
        r["inference"] for r in records
    ]
    assert cont_metrics["WER"] == metrics["WER"]
    assert cont_metrics["p50_latency_s"] > 0
    # untrained tiny model: WER is terrible but must be a valid number
    assert np.isfinite(metrics["WER"])
