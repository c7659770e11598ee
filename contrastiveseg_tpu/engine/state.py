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
    # EMA copy of params for MoCo-style keys (contrast.momentum_encoder).
    # The reference sketches this (HRNet_W48_MEM._momentum_update_key_encoder,
    # nets/hrnet.py:173-176) but never instantiates encoder_k, so the
    # published runs enqueue q.detach(); None keeps that default.
    key_params: Any = None

    def apply_gradients(self, grads, **changes) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            **changes,
        )


def restore_eval_state(
    cfg,
    model,
    input_hw: tuple[int, int],
    checkpoint: str | None = None,
    batch: int = 1,
) -> TrainState:
    """A TrainState for inference/export: init at ``input_hw``, then
    restore ``checkpoint`` (an orbax dir written by CheckpointManager) if
    given.  The optimizer is built from cfg so the checkpoint's opt_state
    template matches even though eval never uses it."""
    import os

    from contrastiveseg_tpu.engine.optim import build_optimizer

    k_params, k_drop, k_bank, k_state = jax.random.split(
        jax.random.PRNGKey(0), 4)
    variables = model.init(
        {"params": k_params, "dropout": k_drop},
        jnp.zeros((batch, *input_hw, 3), jnp.float32), train=True)
    params = variables["params"]
    try:
        tx = build_optimizer(cfg, params)
    except KeyError:
        # Config without a solver block (random-init export): the
        # opt_state template only matters when restoring a training
        # checkpoint, which always carries full solver config.
        if checkpoint:
            raise
        tx = optax.identity()
    bank = None
    if cfg.get("contrast.with_memory", default=False):
        bank = init_memory_bank(
            k_bank,
            cfg.get("data.num_classes"),
            cfg.get("contrast.memory_size", default=5000),
            cfg.get("contrast.proj_dim", default=256),
        )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        bank=bank,
        rng=k_state,
        tx=tx,
    )
    if checkpoint:
        from contrastiveseg_tpu.engine.checkpoint import CheckpointManager

        name = cfg.get("checkpoints.checkpoints_name", default="model")
        if os.path.basename(checkpoint).startswith(f"{name}_"):
            mgr = CheckpointManager(os.path.dirname(checkpoint), name)
            state = mgr.restore(state, path=checkpoint)
        else:
            mgr = CheckpointManager(checkpoint, name)
            state = mgr.restore(state)
    return state


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
    key_params = None
    if cfg.get("contrast.momentum_encoder", default=False):
        key_params = jax.tree.map(jnp.array, params)  # EMA starts at q
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        bank=bank,
        rng=k_state,
        tx=tx,
        key_params=key_params,
    )
