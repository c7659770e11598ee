"""Lovász-Softmax loss, static-shape JAX formulation.

Re-implements lovasz_softmax_flat / lovasz_grad / flatten_probas
(/root/reference/lib/loss/lovasz_loss.py:216-260).  The reference compacts
valid pixels with boolean indexing; here ignored pixels keep their slot
with error forced to 0 and fg=0 — they sort into the zero-error tail where
every term contributes exactly 0 to the dot product, so the value matches
the compacted computation bit-for-bit in exact arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lovasz_grad(fg_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t sorted errors.  [C, P] -> [C, P]."""
    gts = jnp.sum(fg_sorted, axis=-1, keepdims=True)
    intersection = gts - jnp.cumsum(fg_sorted, axis=-1)
    union = gts + jnp.cumsum(1.0 - fg_sorted, axis=-1)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate(
        [jaccard[..., :1], jaccard[..., 1:] - jaccard[..., :-1]], axis=-1
    )


def lovasz_softmax(
    probs: jnp.ndarray,  # [B, H, W, C] softmax probabilities
    labels: jnp.ndarray,  # [B, H, W] int
    ignore_index: int = -1,
    only_present: bool = True,
) -> jnp.ndarray:
    B, H, W, C = probs.shape
    p = probs.reshape(-1, C).astype(jnp.float32)
    y = labels.reshape(-1)
    valid = y != ignore_index

    fg = (y[None, :] == jnp.arange(C)[:, None]) & valid[None, :]  # [C, P]
    fg = fg.astype(jnp.float32)
    errors = jnp.abs(fg - p.T)
    errors = jnp.where(valid[None, :], errors, 0.0)

    order = jnp.argsort(-errors, axis=-1)
    errors_sorted = jnp.take_along_axis(errors, order, axis=-1)
    fg_sorted = jnp.take_along_axis(fg, order, axis=-1)
    grad = jax.lax.stop_gradient(_lovasz_grad(fg_sorted))
    per_class = jnp.sum(errors_sorted * grad, axis=-1)  # [C]

    if only_present:
        present = jnp.sum(fg, axis=-1) > 0
        return jnp.sum(jnp.where(present, per_class, 0.0)) / jnp.maximum(
            jnp.sum(present), 1
        )
    return jnp.mean(per_class)


def ce_lovasz_loss(
    logits: jnp.ndarray,  # [B, H, W, C]
    labels: jnp.ndarray,
    class_weight=None,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """FSCELOVASZLoss (loss_helper.py:77-130): CE + Lovász(present)."""
    from contrastiveseg_tpu.losses.ce import cross_entropy
    from contrastiveseg_tpu.ops.resize import scale_target_nearest

    if logits.shape[1:3] != labels.shape[1:3]:
        labels = scale_target_nearest(labels, (logits.shape[1], logits.shape[2]))
    ce = cross_entropy(logits, labels, class_weight, ignore_index)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return ce + lovasz_softmax(probs, labels, ignore_index, only_present=True)
