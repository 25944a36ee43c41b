"""Compare xla vs pallas ops backends on the real chip (dev utility)."""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from dualhyp_tpu import ops
from dualhyp_tpu.registry import config_from_name
from bench import build_trainer, time_steps


def main():
    cfg = config_from_name(
        "tiny-llama-1.1b-chat",
        lora_r=16,
        lora_alpha=16,
        lora_dropout=0.05,
        lora_query=True,
        lora_key=True,
        lora_value=True,
        lora_projection=True,
    )
    mb, sl = (int(a) for a in (sys.argv[1:3] or (8, 1024)))
    for backend in ("xla", "pallas"):
        ops.set_backend(backend)
        try:
            trainer, batch = build_trainer(cfg, mb, sl)
            st = time_steps(trainer, batch, n_warmup=2, n_measure=6)
            print(f"{backend}: mb={mb} sl={sl} step={st:.4f}s "
                  f"tok/s={mb*sl/st:,.0f}", flush=True)
            del trainer, batch
        except Exception as exc:
            print(f"{backend}: FAILED {type(exc).__name__}: {exc}", flush=True)


if __name__ == "__main__":
    main()
