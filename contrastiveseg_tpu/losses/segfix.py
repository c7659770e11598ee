"""SegFix loss: class-balanced boundary mask CE + masked direction CE.

Re-implements SegFixLoss (/root/reference/lib/loss/loss_helper.py:372-431)
as a pure function.  The ground-truth mask/direction labels are produced on
the host (utils/offset_helper.py) by the DTOffset data loader; the loss
itself runs jitted.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from contrastiveseg_tpu.losses.ce import cross_entropy
from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners


def _balanced_weights(label_map: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """w_c = 1 - count_c / total (SegFixLoss.calc_weights)."""
    counts = jnp.stack(
        [jnp.sum(label_map == i) for i in range(num_classes)]
    ).astype(jnp.float32)
    return 1.0 - counts / jnp.maximum(jnp.sum(counts), 1.0)


def _weighted_ce(logits, labels, weights, ignore_index=-1):
    """CE with a *traced* class-weight vector (losses/ce.py requires static
    weights, the SegFix weights are data-dependent)."""
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe = jnp.clip(labels, 0, num_classes - 1)
    onehot = safe[..., None] == jnp.arange(num_classes, dtype=safe.dtype)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)
    w = jnp.sum(jnp.where(onehot, weights, 0.0), axis=-1)
    w = jnp.where(valid, w, 0.0)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


@dataclasses.dataclass(frozen=True)
class SegFixLoss:
    num_directions: int = 8
    mask_threshold: float = 0.5
    mask_weight: float = 1.0
    direction_weight: float = 1.0

    def __call__(
        self,
        key,
        outputs: dict,
        targets: dict,
        with_embed=True,
        bank=None,
    ) -> tuple[jnp.ndarray, dict]:
        """outputs: {'mask': [B,h,w,2], 'dir': [B,h,w,D]};
        targets: {'mask_label': [B,H,W], 'dir_label': [B,H,W]} where the
        labels were built host-side with distance_to_mask_label /
        angle_to_direction_label (ignore = -1)."""
        gt_mask = targets["mask_label"]
        gt_dir = targets["dir_label"]
        h, w = gt_mask.shape[1], gt_mask.shape[2]
        pred_mask = resize_bilinear_align_corners(outputs["mask"], (h, w))
        pred_dir = resize_bilinear_align_corners(outputs["dir"], (h, w))

        mask_w = _balanced_weights(gt_mask, 2)
        mask_loss = _weighted_ce(pred_mask, gt_mask, mask_w)

        # Direction supervised only where the predicted mask fires
        # (loss_helper.py:409-415).
        mask_prob = jax.nn.softmax(pred_mask.astype(jnp.float32), axis=-1)
        fire = mask_prob[..., 1] > self.mask_threshold
        gt_dir = jnp.where(fire, gt_dir, -1)
        dir_w = _balanced_weights(
            jnp.where(gt_dir >= 0, gt_dir, self.num_directions),
            self.num_directions,
        )
        dir_loss = _weighted_ce(pred_dir, gt_dir, dir_w)

        total = self.mask_weight * mask_loss + self.direction_weight * dir_loss
        return total, {
            "loss_mask": mask_loss,
            "loss_direction": dir_loss,
            "loss": total,
        }
