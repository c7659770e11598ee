"""Train state: one pytree holding everything a train step needs.

Replaces the reference's scattered mutable state (module buffers, optimizer
object, iteration counters in Configer — segmentor/tools/module_runner.py:31-41,
nets/hrnet.py:165-171) with a single donated flax PyTreeNode.  The memory
bank lives here, so queue updates are pure and mesh-consistent.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from contrastiveseg_tpu.ops.queue import MemoryBank, init_memory_bank


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    bank: Optional[MemoryBank]
    rng: jax.Array

    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, **changes) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            **changes,
        )


def create_train_state(
    cfg,
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    input_shape: tuple[int, ...],
) -> TrainState:
    """Initialize params/batch_stats/opt_state (+ bank if with_memory)."""
    k_params, k_drop, k_bank, k_state = jax.random.split(rng, 4)
    variables = model.init(
        {"params": k_params, "dropout": k_drop},
        jnp.zeros(input_shape, jnp.float32),
        train=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    bank = None
    if cfg.get("contrast.with_memory", default=False):
        bank = init_memory_bank(
            k_bank,
            cfg.get("data.num_classes"),
            cfg.get("contrast.memory_size", default=5000),
            cfg.get("contrast.proj_dim", default=256),
        )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        bank=bank,
        rng=k_state,
        tx=tx,
    )
