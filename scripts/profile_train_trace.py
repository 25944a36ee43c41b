"""Op-level profiler trace of the headline train step (real TPU).

Captures a jax.profiler trace of bench.py's exact configuration
(TinyLlama-1.1B LoRA, mb=6, seq 1024, bf16, no remat) and aggregates
device-plane event durations per fusion/op name — the op-level evidence
for the MFU-0.50 diagnosis (BENCH_NOTES.md).

    python scripts/profile_train_trace.py [--steps 4] [--mb 6] [--remat]
"""

import argparse
import collections
import glob
import os
import sys
import tempfile
from pathlib import Path

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualhyp_jax_cache")
jax.config.update("jax_default_prng_impl", "rbg")

import numpy as np


def capture(mb: int, steps: int, remat: bool) -> str:
    from bench import build_trainer
    from dualhyp_tpu.registry import config_from_name

    cfg = config_from_name(
        "tiny-llama-1.1b-chat",
        lora_r=16, lora_alpha=16, lora_dropout=0.05,
        lora_query=True, lora_key=True, lora_value=True, lora_projection=True,
    )
    trainer, batch = build_trainer(cfg, mb, 1024, remat=remat)
    key = jax.random.key(1)
    for _ in range(3):  # compile + warm
        loss, _ = trainer.train_step(batch, max_iters=1000, warmup_steps=10,
                                     rng=key)
    jax.block_until_ready(loss)

    trace_dir = tempfile.mkdtemp(prefix="dualhyp_trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            loss, _ = trainer.train_step(batch, max_iters=1000,
                                         warmup_steps=10, rng=key)
        jax.block_until_ready(loss)
    return trace_dir


def analyze(trace_dir: str, steps: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as fp:
        space.ParseFromString(fp.read())

    print("planes:", [p.name for p in space.planes], flush=True)
    device_planes = [
        p for p in space.planes
        if "TPU" in p.name or "device" in p.name.lower()
    ]
    if not device_planes:
        device_planes = space.planes

    for plane in device_planes:
        meta = {m.id: (m.display_name or m.name)
                for m in plane.event_metadata.values()}
        smeta = {m.id: m.name for m in plane.stat_metadata.values()}
        # stats (hlo category, flops, bytes) live on the event metadata
        estats = {}
        for m in plane.event_metadata.values():
            d = {}
            for st in m.stats:
                key = smeta.get(st.metadata_id, "")
                val = (st.str_value or st.int64_value or st.uint64_value
                       or st.double_value or st.ref_value)
                if key in ("hlo_category", "flops", "bytes_accessed",
                           "tf_op", "hlo_op"):
                    if key != "hlo_category" and st.ref_value:
                        val = smeta.get(st.ref_value, val)
                    elif st.ref_value and not st.str_value:
                        val = smeta.get(st.ref_value, val)
                    d[key] = val
            estats[m.id] = d

        for line in plane.lines:
            totals = collections.Counter()
            counts = collections.Counter()
            cats = {}
            line_total = 0
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                totals[name] += ev.duration_ps
                counts[name] += 1
                cats[name] = estats.get(ev.metadata_id, {})
                line_total += ev.duration_ps
            if not totals:
                continue
            print(f"\n== {plane.name} / line '{line.display_name or line.name}' "
                  f"({line_total/1e12*1e3/steps:.2f} ms/step busy) ==")
            for name, ps in totals.most_common(20):
                extra = cats.get(name, {})
                cat = extra.get("hlo_category", "")
                flops = extra.get("flops", 0) or 0
                gflops_s = (
                    float(flops) * counts[name] / (ps / 1e12) / 1e9
                    if flops and ps else 0
                )
                print(f"  {ps/1e12*1e3/steps:9.3f} ms/step "
                      f"{ps/max(line_total,1)*100:5.1f}% x{counts[name]:<4d} "
                      f"[{cat}] {gflops_s:8.0f} GF/s  {name[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--mb", type=int, default=6)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()
    trace_dir = capture(args.mb, args.steps, args.remat)
    print("trace dir:", trace_dir, flush=True)
    analyze(trace_dir, args.steps)


if __name__ == "__main__":
    main()
