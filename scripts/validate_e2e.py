"""End-to-end memorization probe (run on TPU; see BENCH_NOTES.md).

Trains a tiny model to convergence on a small synthetic corpus with FIXED
prompts, then decodes the SAME examples through the batched KV-cache
decoder. Expected: WER 0.0 / exact-match 1.0 — proving the packing ->
training -> decode -> postprocess -> WER loop is bit-consistent.
"""
import sys, tempfile, json
from pathlib import Path as _P
sys.path.insert(0, str(_P(__file__).parent.parent))
import jax
jax.config.update('jax_compilation_cache_dir', '/tmp/dualhyp_jax_cache')
import numpy as np
from pathlib import Path
from dualhyp_tpu.config import GPTConfig
from dualhyp_tpu.data import collate, hypotheses, synthetic
from dualhyp_tpu.models import gpt
from dualhyp_tpu.train import TrainConfig, Trainer
from dualhyp_tpu.cli.inference_ger import run_inference
from tokenizers import Tokenizer as HFTok
from tokenizers.models import WordLevel
from tokenizers.pre_tokenizers import WhitespaceSplit

words = synthetic.word_vocabulary()
vocab = {"<unk>": 0, "</s>": 1}
for w in words: vocab[w] = len(vocab)
class Tok:
    eos_token = "</s>"; eos_token_id = 1
    def __init__(self):
        t = HFTok(WordLevel(vocab, unk_token="<unk>")); t.pre_tokenizer = WhitespaceSplit(); t.add_special_tokens(["</s>"]); self.t = t
    def encode(self, s): return self.t.encode(s).ids
    def decode(self, ids): return self.t.decode([int(i) for i in ids])
tok = Tok()
tmp = Path(tempfile.mkdtemp())
synthetic.write_json(tmp/"train.json", synthetic.make_records(n_uids=64, variants_per_uid=1, seed=1))
cfg = GPTConfig(name="memchk", block_size=768, vocab_size=len(vocab), padding_multiple=8,
    n_layer=4, n_head=8, n_query_groups=2, n_embd=128, rotary_percentage=1.0,
    parallel_residual=False, bias=False, norm_class="RMSNorm", mlp_class="LLaMAMLP",
    intermediate_size=256, lora_r=0)
# IMPORTANT: random_sample_nhyps=False so train/test prompts are IDENTICAL
train_ds = hypotheses.DualHypothesesDataset("train", str(tmp/"train.json"), tok,
    prompts_format="DualHyp", seed=3, random_sample_nhyps=False)
params = gpt.init(cfg, jax.random.key(0))
tcfg = TrainConfig(learning_rate=1e-3, batch_size=16, micro_batch_size=16,
    compute_dtype="bfloat16", lm_head_chunk_size=0, mode="full")
trainer = Trainer(cfg, tcfg, params)
rng = jax.random.key(7)
for epoch in range(80):
    for batch in collate.epoch_batches(train_ds, 16, shuffle=True, seed=0, epoch=epoch, buckets=(512,)):
        rng, k = jax.random.split(rng)
        loss, _ = trainer.train_step(batch, max_iters=2000, warmup_steps=20, rng=k)
print("final train loss", float(loss))
# decode the SAME train examples
records, m = run_inference(trainer.params, cfg, tok, train_ds, decode_batch=8, max_new_tokens=20, compute_dtype=jax.numpy.bfloat16)
print("decode-on-train WER:", m['WER'], "gtms:", m['gtms'])
for r in records[:3]:
    print("GT :", r['ground_truth'])
    print("INF:", r['inference'])
