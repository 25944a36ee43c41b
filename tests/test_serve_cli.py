"""Serving CLI: requests over a real TCP socket come back with corrected
text, identical to offline greedy decoding of the same packed prompt."""

import json
import socket
import threading

import jax
import jax.numpy as jnp
import numpy as np

from dualhyp_tpu.cli.serve_ger import Server, build_request_prompt
from dualhyp_tpu.infer.decode import generate
from dualhyp_tpu.infer.evaluate import extract_response
from dualhyp_tpu.infer.serve import ContinuousBatcher
from dualhyp_tpu.models import gpt
from tests import helpers
from tests.test_data import WordTokenizer


def test_serve_cli_roundtrip():
    tok = WordTokenizer()
    cfg = helpers.tiny_llama_config(
        block_size=640, vocab_size=len(tok.vocab), padding_multiple=8
    )
    params = gpt.init(cfg, jax.random.key(0))
    batcher = ContinuousBatcher(
        params, cfg, slots=2, max_new_tokens=6, draft_len=3, chunk_steps=2,
        eos_id=tok.eos_token_id, compute_dtype=jnp.float32,
    )
    server = Server(batcher, tok)

    port_holder = {}
    ready = threading.Event()

    def ready_cb(port):
        port_holder["port"] = port
        ready.set()

    th = threading.Thread(
        target=server.run, args=("127.0.0.1", 0, ready_cb), daemon=True
    )
    th.start()
    assert ready.wait(timeout=30)

    try:
        _roundtrip(server, tok, params, cfg, port_holder["port"])
    finally:
        # a leaked live accept loop outlives the test and keeps waking
        # for the rest of the suite
        server.stop()
        th.join(timeout=10)
        assert not th.is_alive()


def _roundtrip(server, tok, params, cfg, port):
    requests = [
        {"id": "a", "nhyps_asr": ["the cat sat", "the bat sat", "cat sat"]},
        {"id": "b", "nhyps_asr": ["dog ran fast", "dog ran"],
         "nhyps_vsr": ["dog van fast", "fog ran"]},
        {"id": "c", "prompt": build_request_prompt(
            "GER", ["many people watch", "many people talk"]
        ), "max_new": 4},
    ]
    with socket.create_connection(("127.0.0.1", port),
                                  timeout=30) as conn:
        for req in requests:
            conn.sendall((json.dumps(req) + "\n").encode())
        conn.settimeout(120)
        buf = b""
        replies = {}
        while len(replies) < len(requests):
            data = conn.recv(1 << 16)
            assert data, "server closed early"
            buf += data
            while b"\n" in buf:
                line, _, buf = buf.partition(b"\n")
                rec = json.loads(line)
                assert "error" not in rec, rec
                replies[rec["id"]] = rec

    # reply 'c' must equal offline greedy decoding of the same prompt
    prompt = requests[2]["prompt"]
    ids = tok.encode(prompt)
    toks, lens = generate(
        params, cfg, jnp.asarray([ids], jnp.int32),
        jnp.asarray([len(ids)], jnp.int32), max_new_tokens=4,
        temperature=0.2, top_k=1, eos_id=tok.eos_token_id,
        compute_dtype=jnp.float32,
    )
    seq = np.asarray(toks)[0][: int(lens[0])].tolist()
    want = extract_response(tok.decode(seq), tok.decode(ids))
    assert replies["c"]["text"] == want
    for rid in ("a", "b"):
        assert isinstance(replies[rid]["text"], str)
        assert replies[rid]["latency_s"] > 0
