"""apply_chat_template packing path (the phi-3.5 path in the reference,
ref: data/av_dataset.py:225-239) exercised with a real transformers fast
tokenizer carrying a chat template (built offline from our word-level
tokenizer.json)."""

import json

import numpy as np
import pytest

from dualhyp_tpu.data import hypotheses, synthetic

_TEMPLATE = (
    "{% for message in messages %}"
    "{{ '<|' + message['role'] + '|>' }}{{ message['content'] }}{{ '<|end|>' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|assistant|>' }}{% endif %}"
)


@pytest.fixture
def chat_tokenizer(tmp_path):
    from tokenizers import Tokenizer as HFTok
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import WhitespaceSplit
    from transformers import PreTrainedTokenizerFast

    words = synthetic.word_vocabulary()
    vocab = {"<unk>": 0, "</s>": 1}
    for w in words:
        vocab[w] = len(vocab)
    tok = HFTok(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = WhitespaceSplit()
    tok.add_special_tokens(["<|system|>", "<|user|>", "<|assistant|>", "<|end|>"])
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="</s>", unk_token="<unk>"
    )
    fast.chat_template = _TEMPLATE
    return fast


def test_chat_template_packing(tmp_path, chat_tokenizer):
    records = synthetic.make_records(n_uids=3, seed=1)
    path = tmp_path / "hyps.json"
    synthetic.write_json(path, records)

    ds = hypotheses.DualHypothesesDataset(
        "train",
        str(path),
        chat_tokenizer,
        prompts_format="DualHyp",
        apply_chat_template=True,
        seed=2,
    )
    ex = ds[0]
    assistant_id = chat_tokenizer.convert_tokens_to_ids("<|assistant|>")
    # the no-response ids end with the generation prompt token
    assert ex.input_ids_no_response[-1] == assistant_id
    n_prompt = len(ex.input_ids_no_response)
    # prompt region masked, answer region = caption ids + eos
    assert all(l == -1 for l in ex.labels[:n_prompt])
    assert ex.labels[-1] == chat_tokenizer.eos_token_id
    answer = ex.input_ids[n_prompt:-1]
    caption_ids = chat_tokenizer(ex.ground_truth, add_special_tokens=False)[
        "input_ids"
    ]
    assert answer == caption_ids
