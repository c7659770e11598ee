"""Stochastic Weight Averaging.

Reference: OptimScheduler's swa_lambda_poly/swa_lambda_cosine policies wrap
torchcontrib's SWA optimizer (segmentor/tools/optim_scheduler.py:99-131) and
the trainer calls swap_swa_sgd at the end (trainer_contrastive.py:291-296).
Here SWA is a pure running average of params with a cyclic trigger — one
tree_map per update, no optimizer wrapper."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class SWAState(NamedTuple):
    avg_params: Any
    n_averaged: jnp.ndarray  # scalar int32


def init_swa(params) -> SWAState:
    return SWAState(
        avg_params=jax.tree_util.tree_map(jnp.zeros_like, params),
        n_averaged=jnp.zeros((), jnp.int32),
    )


def maybe_update_swa(
    swa: SWAState, params, step, swa_start: int, swa_freq: int
) -> SWAState:
    """Average params into the SWA state when step >= start and on-cycle.
    Pure function; safe inside the jitted train step."""
    do = (step >= swa_start) & ((step - swa_start) % swa_freq == 0)
    n = swa.n_averaged
    new_n = jnp.where(do, n + 1, n)

    def upd(avg, p):
        merged = (avg * n + p) / jnp.maximum(n + 1, 1)
        return jnp.where(do, merged, avg)

    return SWAState(
        avg_params=jax.tree_util.tree_map(upd, swa.avg_params, params),
        n_averaged=new_n,
    )


def update_swa(swa: SWAState, params) -> SWAState:
    """Unconditional running-average update (torchcontrib SWA.update_swa);
    the trainer computes the reference's trigger schedule on the host
    (trainer_contrastive.py:185-187,291-296)."""
    n = swa.n_averaged

    def upd(avg, p):
        return (avg * n + p) / (n + 1)

    return SWAState(
        avg_params=jax.tree_util.tree_map(upd, swa.avg_params, params),
        n_averaged=n + 1,
    )


def swap_to_swa(state, swa: SWAState):
    """Return the train state with SWA-averaged params (for final eval;
    BN statistics should be re-estimated with a few forward passes)."""
    return state.replace(params=swa.avg_params)
