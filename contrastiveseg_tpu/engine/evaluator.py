"""Validation evaluator: jitted forward + confusion accumulation.

Re-implements the reference __val path (trainer_contrastive.py:306-401 +
segmentor/tools/evaluator/*): per batch, logits are upsampled (bilinear
align_corners) to label resolution, argmaxed, and scored into a confusion
matrix.  The matrix is computed on device (ops/confusion.py) per batch; the
host accumulates int64.  Under a mesh the batch is sharded and the device
matrix already aggregates globally (XLA psum).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveseg_tpu.metrics.running_score import RunningScore
from contrastiveseg_tpu.ops.confusion import confusion_matrix
from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners


def make_val_step(model, num_classes: int):
    """Returns jitted (params, batch_stats, images, labels) -> confusion."""

    def val_step(params, batch_stats, images, labels):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, images, train=False)
        seg = out["seg"] if isinstance(out, dict) else out
        seg = resize_bilinear_align_corners(
            seg, (labels.shape[1], labels.shape[2])
        )
        pred = jnp.argmax(seg, axis=-1).astype(jnp.int32)
        return confusion_matrix(pred, labels, num_classes)

    return jax.jit(val_step)


class Evaluator:
    def __init__(self, model, num_classes: int, shard_fn: Optional[Callable] = None):
        self.num_classes = num_classes
        self.val_step = make_val_step(model, num_classes)
        self.score = RunningScore(num_classes)
        self.shard_fn = shard_fn

    def run(self, params, batch_stats, batches) -> dict:
        self.score.reset()
        n_images = 0
        t0 = time.time()
        for batch in batches:
            b = {"image": batch["image"], "label": batch["label"]}
            if self.shard_fn is not None:
                b = self.shard_fn(b)
            cm = self.val_step(params, batch_stats, b["image"], b["label"])
            self.score.update_confusion(np.asarray(cm))
            n_images += batch["image"].shape[0]
        scores = self.score.get_scores()
        scores["images_per_sec"] = n_images / max(time.time() - t0, 1e-9)
        return scores
