"""GER correction server: continuous-batching TCP serving loop.

Newline-delimited JSON over TCP — one request per line:

    {"id": "u1", "nhyps_asr": ["best hyp", "other", ...],
     "nhyps_vsr": ["...", ...],          # optional (DualHyp prompt)
     "max_new": 64}                      # optional per-request budget

or a raw pre-built prompt: {"id": "u1", "prompt": "..."}. One response
line per completed request, in completion order:

    {"id": "u1", "text": "corrected transcript", "latency_s": 0.21}

The decode pool is `infer/serve.ContinuousBatcher` (slot refill +
prompt-lookup speculation, greedy — the eval protocol); requests enter a
slot as soon as one frees. The reference has no serving path at all
(batch=1 python decode, ref: inference/ger.py:67-94).

    python -m dualhyp_tpu.cli.serve_ger \
        --llm_checkpoint checkpoints/TinyLlama/... \
        --model_path runs/exp/best_model.npz --port 8787
"""

from __future__ import annotations

import argparse
import json
import selectors
import socket
import threading
from pathlib import Path

import jax.numpy as jnp

from dualhyp_tpu.cli import common
from dualhyp_tpu.data.prompts import get_prompts_format


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, default=None,
                        help="finetuned adapter/model npz (optional: serve "
                             "the base model when omitted)")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8787)
    parser.add_argument("--slots", type=int, default=16)
    parser.add_argument("--max_new_tokens", type=int, default=150)
    parser.add_argument("--draft_len", type=int, default=8)
    parser.add_argument("--chunk_steps", type=int, default=8)
    parser.add_argument("--draft_source", choices=["lookup", "anchored"],
                        default="anchored",
                        help="speculative draft source: 'anchored' follows "
                             "the request's best ASR hypothesis span "
                             "(nhyps_asr[0], or pass 'hypothesis' "
                             "explicitly) with a monotonic pointer — "
                             "higher acceptance on corrections; 'lookup' "
                             "is whole-buffer suffix n-grams")
    parser.add_argument("--quantize", choices=[None, "int8", "int4"],
                        default=None)
    common.add_model_args(parser)
    common.add_data_args(parser)
    common.add_mesh_args(parser)
    return parser


def build_request_prompt(fmt_name: str, nhyps_asr, nhyps_vsr=None) -> str:
    """Prompt packing for a live request (same strings the datasets use;
    hypothesis order is preserved — no train-time shuffling). A
    single-hypothesis request gets an EMPTY other-hypotheses section,
    matching the training datasets' _other_hyps -> hyps[1:] packing."""
    def others(hyps):
        return [h for h in hyps[1:]]

    fmt = get_prompts_format(fmt_name)
    if fmt_name == "DualHyp" and nhyps_vsr:
        p1 = fmt["prompt_1"].replace("<<<ASR_NHYPS>>>", nhyps_asr[0]).replace(
            "<<<VSR_NHYPS>>>", nhyps_vsr[0]
        )
        p2 = fmt["prompt_2"].replace(
            "<<<ASR_NHYPS>>>", "\n".join(others(nhyps_asr))
        ).replace("<<<VSR_NHYPS>>>", "\n".join(others(nhyps_vsr)))
        return p1 + p2 + fmt["prompt_3"]
    return (
        fmt["prompt_1"] + nhyps_asr[0] + fmt["prompt_2"] + "\n"
        + "\n".join(others(nhyps_asr)) + fmt["prompt_3"]
    )


class Server:
    def __init__(self, batcher, tokenizer):
        self.batcher = batcher
        self.tokenizer = tokenizer
        self.conn_of = {}     # request id -> connection
        self.prompt_of = {}   # request id -> decoded prompt text
        self.buffers = {}     # connection -> partial line buffer
        self._stop = threading.Event()
        self._stopped = threading.Event()

    def stop(self, timeout: float = 10.0):
        """Ask the accept loop to exit; returns once it has (tests use
        this — a leaked live loop otherwise outlives its pytest case and
        keeps waking at 50 ms for the rest of the suite)."""
        self._stop.set()
        self._stopped.wait(timeout)

    def handle_line(self, conn, line: str):
        try:
            req = json.loads(line)
            rid = req["id"]
            if "prompt" in req:
                prompt_text = req["prompt"]
            else:
                # format follows the request shape: VSR hypotheses present
                # selects the DualHyp template, else GER
                fmt = "DualHyp" if req.get("nhyps_vsr") else "GER"
                prompt_text = build_request_prompt(
                    fmt, req["nhyps_asr"], req.get("nhyps_vsr")
                )
            ids = self.tokenizer.encode(prompt_text)
            self.conn_of[rid] = conn
            self.prompt_of[rid] = prompt_text
            hyp = req.get("hypothesis")
            if hyp is None and req.get("nhyps_asr"):
                hyp = req["nhyps_asr"][0]
            if isinstance(hyp, str):
                try:  # BOS/etc would break the span match in the prompt
                    hyp_ids = self.tokenizer.encode(
                        hyp, add_special_tokens=False)
                except TypeError:
                    hyp_ids = self.tokenizer.encode(hyp)
            else:
                hyp_ids = hyp
            self.batcher.submit(rid, ids, req.get("max_new"), hyp_ids)
        except Exception as exc:
            self._send(conn, {"error": f"{type(exc).__name__}: {exc}",
                              "line": line[:200]})

    def _send(self, conn, obj):
        try:
            conn.sendall((json.dumps(obj) + "\n").encode("utf-8"))
        except OSError:
            pass

    def flush_completed(self):
        from dualhyp_tpu.infer.evaluate import extract_response

        for rec in self.batcher.poll():
            rid = rec["id"]
            conn = self.conn_of.pop(rid, None)
            prompt_text = self.prompt_of.pop(rid, "")
            full = self.tokenizer.decode(rec["tokens"])
            decoded_prompt = self.tokenizer.decode(
                rec["tokens"][: rec["prompt_len"]]
            )
            text = extract_response(full, decoded_prompt)
            if conn is not None:
                self._send(conn, {
                    "id": rid, "text": text,
                    "latency_s": round(rec["latency_s"], 4),
                })

    def run(self, host: str, port: int, ready_cb=None):
        sel = selectors.DefaultSelector()
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((host, port))
        srv.listen()
        srv.setblocking(False)
        sel.register(srv, selectors.EVENT_READ, "accept")
        self.batcher.start()
        if ready_cb is not None:
            ready_cb(srv.getsockname()[1])
        print(f"serving on {srv.getsockname()}", flush=True)
        try:
            while not self._stop.is_set():
                # short timeout when idle; zero when decoding is in flight
                timeout = 0.0 if self.batcher.pending else 0.05
                for key, _ in sel.select(timeout=timeout):
                    if key.data == "accept":
                        conn, _ = srv.accept()
                        conn.setblocking(False)
                        sel.register(conn, selectors.EVENT_READ, "read")
                        self.buffers[conn] = b""
                    else:
                        conn = key.fileobj
                        try:
                            data = conn.recv(1 << 16)
                        except OSError:
                            data = b""
                        if not data:
                            sel.unregister(conn)
                            self.buffers.pop(conn, None)
                            conn.close()
                            continue
                        self.buffers[conn] += data
                        while b"\n" in self.buffers[conn]:
                            line, _, rest = self.buffers[conn].partition(b"\n")
                            self.buffers[conn] = rest
                            if line.strip():
                                self.handle_line(
                                    conn, line.decode("utf-8")
                                )
                if self.batcher.pending:
                    self.flush_completed()
        finally:
            srv.close()
            for conn in list(self.buffers):
                try:
                    conn.close()
                except OSError:
                    pass
            self.buffers.clear()
            sel.close()
            self._stopped.set()


def main(argv=None):
    args = build_parser().parse_args(argv)

    from dualhyp_tpu.ckpt.io import load_params
    from dualhyp_tpu.cli.common import _overlay
    from dualhyp_tpu.infer.serve import ContinuousBatcher

    checkpoint_dir = Path(args.llm_checkpoint)
    tokenizer = common.load_tokenizer(checkpoint_dir)
    model_cfg = common.model_config_from_args(args)
    params = common.load_base_params(checkpoint_dir, model_cfg)
    if args.model_path:
        params = _overlay(params, load_params(args.model_path))
    if args.quantize:
        from dualhyp_tpu.models.gpt import merge_lora
        from dualhyp_tpu.ops.quant import quantize_tree

        if model_cfg.any_lora:
            params = merge_lora(params, model_cfg)
        params = quantize_tree(params, mode=args.quantize)

    mesh = None
    import jax

    if (args.fsdp > 1 or args.tensor > 1 or args.expert > 1 or args.seq > 1
            or (args.dp or 0) > 1 or jax.device_count() > 1):
        from dualhyp_tpu.parallel import make_mesh, shard_params

        mesh = make_mesh(data=args.dp, fsdp=args.fsdp, tensor=args.tensor,
                         expert=args.expert, seq=args.seq)
        params, _ = shard_params(params, mesh)

    batcher = ContinuousBatcher(
        params, model_cfg, slots=args.slots,
        max_new_tokens=args.max_new_tokens, draft_len=args.draft_len,
        chunk_steps=args.chunk_steps,
        eos_id=getattr(tokenizer, "eos_token_id", None),
        mesh=mesh, draft_source=args.draft_source,
    )
    Server(batcher, tokenizer).run(args.host, args.port)


if __name__ == "__main__":
    main()
