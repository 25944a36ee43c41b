"""Large registry configs must LOWER for multi-chip training without any
real memory: abstract (ShapeDtypeStruct) parameter trees with their
NamedShardings drive `jax.jit(...).lower(...)` over the virtual 8-device
mesh. Proves the sharding rules and the train-step graph handle the 7B+
and Mixtral-MoE registry entries (the reference crashes on its Mixtral
configs; its 7B path was never exercised beyond DDP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualhyp_tpu.models import gpt
from dualhyp_tpu.ops.cross_entropy import chunked_cross_entropy
from dualhyp_tpu.parallel import batch_sharding, make_mesh, param_shardings
from dualhyp_tpu.registry import config_from_name
from dualhyp_tpu.train.trainer import combine, partition


def _abstract_train_lowering(cfg, mesh, batch=8, seq=1024):
    """Lower loss+grad over abstract sharded params; returns the Lowered."""
    shapes = jax.eval_shape(lambda k: gpt.init(cfg, k), jax.random.key(0))
    shardings = param_shardings(shapes, mesh)
    mask = gpt.trainable_mask(shapes, cfg)
    tr_shapes, fr_shapes = partition(shapes, mask)
    tr_sh, fr_sh = partition(shardings, mask)

    def as_abstract(tree, shs):
        return jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16,
                                               sharding=sh),
            tree, shs,
        )

    b_sh = batch_sharding(mesh)
    ids = jax.ShapeDtypeStruct((batch, seq), jnp.int32, sharding=b_sh)
    labels = jax.ShapeDtypeStruct((batch, seq), jnp.int32, sharding=b_sh)

    def loss(trainable, frozen, ids, labels):
        params = combine(trainable, jax.lax.stop_gradient(frozen))
        hidden = gpt.forward(params, cfg, ids, compute_dtype=jnp.bfloat16,
                             remat=True, return_hidden=True)
        return chunked_cross_entropy(
            hidden[:, :-1], params["lm_head"]["weight"], labels[:, 1:],
            chunk_size=128,
        )

    grad_fn = jax.jit(jax.value_and_grad(loss))
    return grad_fn.lower(
        as_abstract(tr_shapes, tr_sh), as_abstract(fr_shapes, fr_sh),
        ids, labels,
    )


def test_llama2_7b_lora_fsdp_lowering():
    cfg = config_from_name(
        "Llama-2-7b-hf", lora_r=16, lora_alpha=16,
        lora_query=True, lora_key=True, lora_value=True, lora_projection=True,
    )
    mesh = make_mesh(data=1, fsdp=8)
    lowered = _abstract_train_lowering(cfg, mesh)
    text = lowered.as_text()
    assert "stablehlo" in text[:2000] or "module" in text[:200]


def test_mixtral_8x7b_expert_parallel_lowering():
    """The reference's Mixtral configs crash (no LLaMAMoE class); ours
    lowers the full MoE train step with experts sharded over `expert`
    and params over `fsdp`."""
    cfg = config_from_name("Mixtral-8x7B-v0.1")
    mesh = make_mesh(data=1, fsdp=4, expert=2)
    lowered = _abstract_train_lowering(cfg, mesh, batch=4, seq=512)
    assert lowered is not None
