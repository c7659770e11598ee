"""Checkpoint save/restore (orbax-backed).

Replaces ModuleRunner.save_net/load_net
(/root/reference/segmentor/tools/module_runner.py:78-226) with a full-state
checkpoint: params + batch_stats + optimizer state + step + memory bank +
config — unlike the reference, which drops optimizer/scheduler state and
iteration counters on resume (SURVEY.md §5 Checkpoint/resume).

Save modes mirror the reference: `latest` always, plus `performance` /
`val_loss` / `iters` / `epoch` variants.  Only process 0 writes.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from contrastiveseg_tpu.engine.state import TrainState


def _state_to_pytree(state: TrainState) -> dict:
    tree = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": jax.random.key_data(state.rng),
    }
    if state.bank is not None:
        tree["bank"] = state.bank._asdict()
    if state.key_params is not None:
        tree["key_params"] = state.key_params
    return tree


class CheckpointManager:
    def __init__(self, checkpoints_dir: str, checkpoints_name: str,
                 config_dict: Optional[dict] = None):
        self.dir = os.path.abspath(checkpoints_dir)
        self.name = checkpoints_name
        self.config_dict = config_dict or {}
        self.best_performance = -np.inf
        self.min_val_loss = np.inf
        self._ckptr = ocp.StandardCheckpointer()
        if jax.process_index() == 0:
            os.makedirs(self.dir, exist_ok=True)

    def _path(self, tag: str) -> str:
        return os.path.join(self.dir, f"{self.name}_{tag}")

    def save(self, state: TrainState, tag: str = "latest") -> str:
        path = self._path(tag)
        if jax.process_index() == 0:
            tree = jax.device_get(_state_to_pytree(state))
            self._ckptr.save(path, tree, force=True)
            self._ckptr.wait_until_finished()
            with open(path + ".config.json", "w") as f:
                json.dump(self.config_dict, f, indent=2)
        return path

    def save_by_mode(self, state: TrainState, save_mode: str,
                     performance: float = None, val_loss: float = None,
                     iters: int = None, epoch: int = None) -> None:
        """module_runner.py:186-214 semantics."""
        self.save(state, "latest")
        if save_mode == "performance" and performance is not None:
            if performance > self.best_performance:
                self.best_performance = performance
                self.save(state, "max_performance")
        elif save_mode == "val_loss" and val_loss is not None:
            if val_loss < self.min_val_loss:
                self.min_val_loss = val_loss
                self.save(state, "min_loss")
        elif save_mode == "iters" and iters is not None:
            self.save(state, f"iters{iters}")
        elif save_mode == "epoch" and epoch is not None:
            self.save(state, f"epoch{epoch}")

    def restore(self, state: TrainState, tag: str = "latest",
                path: Optional[str] = None) -> TrainState:
        """Restore into the structure of `state` (shapes must match)."""
        path = path or self._path(tag)
        template = jax.device_get(_state_to_pytree(state))
        tree = self._ckptr.restore(path, template)
        bank = state.bank
        if bank is not None and "bank" in tree:
            from contrastiveseg_tpu.ops.queue import MemoryBank

            bank = MemoryBank(**tree["bank"])
        return state.replace(
            step=tree["step"],
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            bank=bank,
            rng=jax.random.wrap_key_data(tree["rng"]),
            key_params=tree.get("key_params", state.key_params),
        )

    def has(self, tag: str = "latest") -> bool:
        return os.path.exists(self._path(tag))
