"""Jittable confusion matrix for segmentation metrics.

Replaces both the reference's numpy ``_fast_hist`` bincount
(lib/metrics/running_score.py:121-160) and its C/Cython
``addToConfusionMatrix`` inner loop (SURVEY.md §2.10): on TPU a one-pass
scatter-add (``.at[].add`` lowers to an XLA scatter) does the whole image in
one fused op, and the matrix is ``psum``-reducible across the mesh — the
moral equivalent of the reference's ``all_reduce_numpy``
(lib/utils/distributed.py:22-25).
"""

from __future__ import annotations

import jax.numpy as jnp


def confusion_matrix(
    pred: jnp.ndarray, label: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """[num_classes, num_classes] matrix; rows = ground truth, cols = pred.

    Pixels whose label is outside [0, num_classes) (e.g. ignore -1 / 255)
    are dropped, matching the reference mask
    (running_score.py: ``(label_true >= 0) & (label_true < n_class)``).
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    label = label.reshape(-1).astype(jnp.int32)
    valid = (label >= 0) & (label < num_classes)
    # Route invalid pixels to an extra trash row, then slice it off: keeps the
    # scatter shape static with no host-side boolean indexing.
    idx = jnp.where(valid, label * num_classes + jnp.clip(pred, 0, num_classes - 1),
                    num_classes * num_classes)
    flat = jnp.zeros(num_classes * num_classes + 1, dtype=jnp.int32)
    flat = flat.at[idx].add(1)
    return flat[:-1].reshape(num_classes, num_classes)
