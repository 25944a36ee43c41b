"""Checkpoint save/load.

Replaces the reference's zip-pickle lazy loader + incremental saver
(ref: ger/utils.py:98-236, 273-418) with Orbax (async-capable, sharding
aware) and a dependency-free npz fallback for flat trees.

The "base weights + adapter delta" split survives: `save_adapter_only`
writes just the PEFT subtree (== lora_filter dicts, ref: ger/lora.py:442)
and `load_adapter_over` applies it over base params (== the strict=False
re-load in inference, ref: inference/ger.py:32-35).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

from dualhyp_tpu.models import gpt

SEP = "::"
_BF16_TAG = "@bf16"  # numpy can't serialise bfloat16; store the bit pattern


def _flatten(params) -> dict:
    flat = {}

    def visit(path, leaf):
        key = SEP.join(
            p.key if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path
        )
        arr = np.asarray(leaf)
        if arr.dtype.name == "bfloat16":
            flat[key + _BF16_TAG] = arr.view(np.uint16)
        else:
            flat[key] = arr

    jax.tree_util.tree_map_with_path(visit, params)
    return flat


def _undo_bf16(key: str, value: np.ndarray):
    if key.endswith(_BF16_TAG):
        import ml_dtypes

        return key[: -len(_BF16_TAG)], value.view(ml_dtypes.bfloat16)
    return key, value


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for key, value in flat.items():
        key, value = _undo_bf16(key, value)
        node = tree
        parts = key.split(SEP)
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return tree


def save_params(path, params, metadata: dict | None = None) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten(params)
    np.savez(path, **flat)
    if metadata is not None:
        with open(path.with_suffix(".json"), "w", encoding="utf-8") as fp:
            json.dump(metadata, fp, indent=2)


def load_params(path) -> dict:
    path = Path(path)
    with np.load(path if path.suffix == ".npz" else path.with_suffix(".npz")) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten(flat)


def save_adapter_only(path, params, cfg) -> None:
    """Persist only the trainable (PEFT) leaves."""
    adapter = gpt.adapter_only(params, cfg)
    flat = {k: v for k, v in _flatten(adapter).items() if v is not None}
    # adapter_only leaves None for frozen leaves; np flatten skips None via
    # tree traversal (None = empty subtree), so flat is already minimal
    np.savez(Path(path), **flat)


def load_adapter_over(params, path) -> dict:
    """Overlay a saved adapter subtree onto a full param tree
    (strict=False semantics: missing keys keep base values)."""
    overlay = _flatten_loaded(path)
    flat = dict(_undo_bf16(k, v) for k, v in _flatten(params).items())
    unknown = set(overlay) - set(flat)
    if unknown:
        raise KeyError(f"adapter checkpoint has unknown keys: {sorted(unknown)[:5]}")
    flat.update(overlay)
    return _unflatten(flat)


def _flatten_loaded(path) -> dict:
    with np.load(Path(path)) as z:
        return dict(_undo_bf16(k, z[k]) for k in z.files)


# ---- Orbax (async, sharded) path for large checkpoints ----

def save_params_orbax(directory, params) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(directory).absolute(), params, force=True)
    ckptr.wait_until_finished()


def load_params_orbax(directory, like=None) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(Path(directory).absolute(), target=like)
    return ckptr.restore(Path(directory).absolute())
