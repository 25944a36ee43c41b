import json

import numpy as np
import pytest

from dualhyp_tpu.data import collate, hypotheses, masks, prompts, synthetic


class WordTokenizer:
    """Tiny whitespace tokenizer (duck-typed like HF AutoTokenizer)."""

    eos_token = "</s>"

    def __init__(self, extra=()):
        words = synthetic.word_vocabulary()
        self.vocab = {"<pad>": 0, "</s>": 1}
        for w in words:
            self.vocab[w] = len(self.vocab)
        for t in extra:
            self.vocab[t] = len(self.vocab)
        # every non-word char collapses to a single unk-ish token
        self.vocab["<other>"] = len(self.vocab)
        self.inv = {v: k for k, v in self.vocab.items()}

    @property
    def eos_token_id(self):
        return 1

    def encode(self, text):
        # real tokenizers split registered special tokens even when glued to
        # the previous word (e.g. "caption</s>"); mimic that here
        text = text.replace("</s>", " </s> ")
        ids = []
        for tok in text.replace("\n", " \n ").split(" "):
            if not tok:
                continue
            ids.append(self.vocab.get(tok, self.vocab["<other>"]))
        return ids

    def decode(self, ids):
        return " ".join(self.inv.get(int(i), "<other>") for i in ids)


@pytest.fixture
def json_path(tmp_path):
    records = synthetic.make_records(n_uids=8, variants_per_uid=2, seed=3)
    path = tmp_path / "hyps.json"
    synthetic.write_json(path, records)
    return str(path)


def test_prompt_strings_are_byte_exact_goldens():
    """Golden byte lengths / digests guard against accidental edits."""
    assert prompts.GER_PROMPTS["prompt_1"].startswith("Below is the best-hypotheses")
    assert prompts.GER_PROMPTS["prompt_2"] == "\n\n### Other-hypothesis:"
    assert prompts.GER_PROMPTS["prompt_3"] == "\n\n### Response:\n"
    assert prompts.DualHyp_PROMPTS["prompt_3"] == "\n\n### Response:\n"
    assert prompts.RelPrompt_PROMPTS["prompt_2"] == ""
    assert prompts.RelPrompt_PROMPTS["prompt_3"] == "\n\n\n### Response:\n"
    assert "<<<ASR_MASKS>>>" in prompts.RelPrompt_PROMPTS["prompt_1"]
    with pytest.raises(ValueError):
        prompts.get_prompts_format("nope")


def test_ger_dataset_packing(json_path):
    tok = WordTokenizer()
    ds = hypotheses.HypothesesDataset(
        "train", json_path, tok, prompts_format="GER", seed=7
    )
    assert len(ds) == 8  # grouped by uid
    ex = ds[0]
    # prompt structure: prompt_1 + best + prompt_2 + '\n' + others + prompt_3
    assert ex.prompt_no_response.startswith(prompts.GER_PROMPTS["prompt_1"])
    assert ex.prompt_no_response.endswith(prompts.GER_PROMPTS["prompt_3"])
    assert ex.prompt == ex.prompt_no_response + ex.ground_truth + "</s>"
    # labels: -1 over the prompt region, caption ids after
    n_prompt = len(ex.input_ids_no_response)
    assert all(l == -1 for l in ex.labels[:n_prompt])
    assert ex.labels[n_prompt:] == ex.input_ids[n_prompt:]
    assert len(ex.labels) == len(ex.input_ids)


def test_dual_dataset_replaces_both_streams(json_path):
    tok = WordTokenizer()
    ds = hypotheses.DualHypothesesDataset(
        "train", json_path, tok, prompts_format="DualHyp", seed=7
    )
    ex = ds[0]
    assert "<<<ASR_NHYPS>>>" not in ex.prompt_no_response
    assert "<<<VSR_NHYPS>>>" not in ex.prompt_no_response
    assert "### ASR Best-hypothesis:" in ex.prompt_no_response
    assert "### VSR Other-hypotheses:" in ex.prompt_no_response


def test_mask_dataset_injects_or_leaves_masks(json_path):
    tok = WordTokenizer(extra=["<<C>>", "<<M>>", "<<N>>"])
    ds = hypotheses.DualHypothesesMaskDataset(
        "train", json_path, tok, prompts_format="RelPrompt", seed=7
    )
    ex = ds[0]
    assert "<<<ASR_MASKS>>>" not in ex.prompt_no_response
    assert any(t in ex.prompt_no_response for t in ("<<C>>", "<<M>>", "<<N>>"))
    assert ex.audio_bin_labels and ex.video_bin_labels

    ds_inf = hypotheses.DualHypothesesMaskDataset(
        "test", json_path, tok, prompts_format="RelPrompt", seed=7, leave_masks=True
    )
    ex = ds_inf[0]
    assert "<<<ASR_MASKS>>>" in ex.prompt_no_response
    assert "<<<VSR_MASKS>>>" in ex.prompt_no_response


def test_mask_binning_thresholds():
    # 10-frame chunks: >0.9 clean -> C, <0.6 -> N, else M
    mask = ["C"] * 10 + ["N"] * 10 + (["C"] * 7 + ["N"] * 3)
    scores, bins = masks.chunk_reliability(mask, 10)
    assert bins == ["<<C>>", "<<N>>", "<<M>>"]
    assert scores == [1.0, 0.0, 0.7]
    assert masks.bins_to_indices(bins) == [0, 2, 1]


def test_frame_noise_mask_with_threshold():
    corr = {"total_len": 20, "start_fr": 5, "occ_len": 10, "snr": 0}
    mask = masks.frame_noise_mask(corr)
    assert mask[:5] == ["C"] * 5 and mask[5:15] == ["N"] * 10
    # snr above threshold -> span not marked noisy
    mask = masks.frame_noise_mask(corr, mask_threshold=-5)
    assert mask == ["C"] * 20


def test_ordered_sample_preserves_order():
    import random

    rng = random.Random(0)
    items = list(range(20))
    for _ in range(10):
        got = hypotheses.ordered_sample(items, 8, rng)
        assert got == sorted(got)


def test_collate_buckets_and_padding(json_path):
    tok = WordTokenizer()
    ds = hypotheses.HypothesesDataset("train", json_path, tok, seed=7)
    batches = list(
        collate.epoch_batches(ds, batch_size=3, shuffle=True, seed=1, epoch=0)
    )
    assert sum(b["valid"].sum() for b in batches) == len(ds)
    for b in batches:
        assert b["input_ids"].shape == b["labels"].shape
        assert b["input_ids"].shape[1] in collate.DEFAULT_BUCKETS
        # pad regions: ids 0, labels -1
        for i, n in enumerate(b["lengths"]):
            assert (b["input_ids"][i, n:] == 0).all()
            assert (b["labels"][i, n:] == -1).all()


def test_per_epoch_variant_resampling(json_path):
    """Different epochs should (eventually) draw different corruption
    variants per uid (ref: av_dataset.py:121-124)."""
    tok = WordTokenizer()
    ds = hypotheses.DualHypothesesDataset("train", json_path, tok, seed=11)
    draws = {tuple(id(r) for r in ds._draw("uid00000")) for _ in range(20)}
    assert len(draws) > 1


def test_prefetch_epoch_batches_matches_sync(tmp_path):
    """The threaded prefetching iterator yields byte-identical batches in
    the same order as the synchronous epoch_batches."""
    from dualhyp_tpu.data import collate, hypotheses, synthetic

    path = tmp_path / "h.json"
    synthetic.write_json(path, synthetic.make_records(n_uids=9, seed=2))
    tok = WordTokenizer()
    ds = hypotheses.DualHypothesesDataset(
        "train", str(path), tok, prompts_format="DualHyp", seed=3
    )
    kw = dict(shuffle=True, seed=5, epoch=2, buckets=(256, 512))
    sync = list(collate.epoch_batches(ds, 4, **kw))
    # dataset draws are seeded per (uid, epoch); rebuild for identical draws
    ds2 = hypotheses.DualHypothesesDataset(
        "train", str(path), tok, prompts_format="DualHyp", seed=3
    )
    pre = list(collate.prefetch_epoch_batches(ds2, 4, **kw))
    assert len(pre) == len(sync)
    for a, b in zip(sync, pre):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
