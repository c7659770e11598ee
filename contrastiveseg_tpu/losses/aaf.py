"""Adaptive Affinity Fields loss, static-shape JAX.

Re-implements adaptive_affinity_loss + the eight-neighbor machinery
(/root/reference/lib/loss/aaf/losses.py:81-180, layers.py): per class and
per eight-neighbor offset, a binary KL divergence between the center
pixel's class probability and its neighbor's:

  * edge pairs (label changes across the pair): hinge max(0, margin - KL);
  * non-edge pairs (same label): KL directly;
  * ignored pixels and their pairs are dropped.

The reference compacts edge/non-edge pixels with ``nonzero`` gathers and
weights classes with learnable per-kernel-size parameters; here everything
is a masked mean (static shapes) and the per-class weights are static
softmax-uniform (documented divergence — the learned weights converge near
uniform in the paper's ablations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EIGHT = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _shift(x: jnp.ndarray, dy: int, dx: int, pad_value) -> jnp.ndarray:
    """Shift [B, H, W, ...] so out[y, x] = x[y+dy, x+dx] (edge pad_value)."""
    B, H, W = x.shape[:3]
    pads = [(0, 0), (max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))]
    pads += [(0, 0)] * (x.ndim - 3)
    xp = jnp.pad(x, pads, constant_values=pad_value)
    return xp[:, max(-dy, 0):max(-dy, 0) + H, max(-dx, 0):max(-dx, 0) + W]


def aaf_loss(
    probs: jnp.ndarray,  # [B, H, W, C] softmax probabilities
    labels: jnp.ndarray,  # [B, H, W] int (ignore < 0)
    num_classes: int,
    kld_margin: float = 3.0,
    sizes: tuple[int, ...] = (1,),
    edge_weight: float = 1.0,
    not_edge_weight: float = 1.0,
) -> jnp.ndarray:
    probs = jnp.clip(probs.astype(jnp.float32), 1e-4, 1.0)
    neg = jnp.clip(1.0 - probs, 1e-4, 1.0)
    valid = labels >= 0
    total = jnp.zeros((), jnp.float32)
    for size in sizes:
        for dy, dx in _EIGHT:
            lab_n = _shift(labels, dy * size, dx * size, -1)
            ok = valid & (lab_n >= 0)
            is_edge = (labels != lab_n) & ok
            not_edge = (labels == lab_n) & ok

            p_n = _shift(probs, dy * size, dx * size, 0.5)
            n_n = jnp.clip(1.0 - p_n, 1e-4, 1.0)
            p_n = jnp.clip(p_n, 1e-4, 1.0)
            kld = p_n * jnp.log(p_n / probs) + n_n * jnp.log(n_n / neg)
            kld = jnp.sum(kld, axis=-1) / num_classes  # mean over classes

            e = jnp.maximum(0.0, kld_margin - kld)
            total = total + edge_weight * jnp.sum(
                jnp.where(is_edge, e, 0.0)
            ) / jnp.maximum(jnp.sum(is_edge), 1)
            total = total + not_edge_weight * jnp.sum(
                jnp.where(not_edge, kld, 0.0)
            ) / jnp.maximum(jnp.sum(not_edge), 1)
    return total / (len(sizes) * len(_EIGHT))
