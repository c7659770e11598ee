"""Cross-entropy loss family with exact torch semantics.

Re-implements FSCELoss / FSOhemCELoss / FSAuxCELoss
(/root/reference/lib/loss/loss_helper.py:169-313) as pure functions.

Torch semantics preserved:
  * per-class weights: mean reduction divides by the *sum of weights* of
    the contributing pixels (``nn.CrossEntropyLoss(weight=w)``);
  * ignore_index pixels contribute neither numerator nor denominator;
  * targets are nearest-downscaled to logits size (``_scale_target``,
    loss_helper.py:208-212) — here the caller passes logits already at
    label resolution or we rescale internally.

All functions take NHWC logits [B, H, W, C] and integer labels [B, H, W].
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from contrastiveseg_tpu.ops.resize import scale_target_nearest


def _per_pixel_ce(
    logits: jnp.ndarray, labels: jnp.ndarray, class_weight: Optional[jnp.ndarray],
    ignore_index: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (weighted_ce [B,H,W], weight [B,H,W], valid [B,H,W])."""
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe = jnp.clip(labels, 0, num_classes - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        w = jnp.asarray(class_weight, jnp.float32)[safe]
    else:
        w = jnp.ones_like(nll)
    w = jnp.where(valid, w, 0.0)
    return nll * w, w, valid


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weight: Optional[Sequence[float]] = None,
    ignore_index: int = -1,
    reduction: str = "mean",
) -> jnp.ndarray:
    """FSCELoss: weighted CE, ignore-index, torch 'mean' normalization."""
    if logits.shape[1:3] != labels.shape[1:3]:
        labels = scale_target_nearest(labels, (logits.shape[1], logits.shape[2]))
    wce, w, _ = _per_pixel_ce(logits, labels, class_weight, ignore_index)
    if reduction == "sum":
        return jnp.sum(wce)
    return jnp.sum(wce) / jnp.maximum(jnp.sum(w), 1e-12)


def ohem_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    thresh: float = 0.9,
    min_kept: int = 100000,
    class_weight: Optional[Sequence[float]] = None,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """FSOhemCELoss (loss_helper.py:215-261): online hard-example mining.

    Keeps pixels whose predicted prob of the true class is below
    ``max(thresh, prob of the min_kept-th hardest pixel)`` and takes the
    *unweighted* mean of their (class-weighted) CE values, exactly like the
    reference.  Static-shape formulation: the k-th order statistic is found
    with a full sort over the (masked) flat prob vector — no boolean
    compaction, so the whole loss stays inside one jit.
    """
    if logits.shape[1:3] != labels.shape[1:3]:
        labels = scale_target_nearest(labels, (logits.shape[1], logits.shape[2]))
    num_classes = logits.shape[-1]
    valid = (labels != ignore_index).reshape(-1)
    safe = jnp.clip(labels, 0, num_classes - 1)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    p_true = jnp.take_along_axis(probs, safe[..., None], axis=-1)[..., 0].reshape(-1)
    # Invalid pixels -> prob 2.0: sorted last, never below any threshold <= 1.
    p_masked = jnp.where(valid, p_true, 2.0)
    sorted_p = jnp.sort(p_masked)
    n_valid = jnp.sum(valid)
    k = jnp.minimum(jnp.int32(min_kept), jnp.maximum(n_valid - 1, 0))
    min_threshold = sorted_p[k]
    threshold = jnp.maximum(min_threshold, thresh)

    wce, _, _ = _per_pixel_ce(
        logits, labels, class_weight, ignore_index
    )
    keep = valid & (p_masked < threshold)
    wce = wce.reshape(-1)
    return jnp.sum(jnp.where(keep, wce, 0.0)) / jnp.maximum(jnp.sum(keep), 1)


def aux_cross_entropy(
    seg_logits: jnp.ndarray,
    aux_logits: jnp.ndarray,
    labels: jnp.ndarray,
    seg_weight: float = 1.0,
    aux_weight: float = 0.4,
    class_weight: Optional[Sequence[float]] = None,
    ignore_index: int = -1,
) -> jnp.ndarray:
    """FSAuxCELoss (loss_helper.py:301-313)."""
    return seg_weight * cross_entropy(
        seg_logits, labels, class_weight, ignore_index
    ) + aux_weight * cross_entropy(aux_logits, labels, class_weight, ignore_index)
