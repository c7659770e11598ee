"""Validation evaluators: jitted forward + task-specific scoring.

Re-implements the reference __val path (trainer_contrastive.py:306-401) and
its evaluator task plugins (segmentor/tools/evaluator/tasks.py:22-246):

  * ``Evaluator`` — the seg task: upsampled argmax into a device confusion
    matrix (SegTask);
  * LIP flip-average eval (``flip_average`` + ``flip_pairs``): average the
    logits of the image and its horizontal flip with left/right channel
    swaps (trainer_contrastive.py:320-346, data_helper.py:69-91);
  * diverse-size (ADE20K) eval: per-image forward at the image's own
    padded shape (trainer_contrastive.py:348-360's scatter, reshaped for
    XLA's per-shape program cache);
  * ``SegFixEvaluator`` — the mask + direction tasks (MaskTask /
    DirectionTask): boundary-mask accuracy and direction accuracy under
    both predicted-mask and GT-mask gating.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveseg_tpu.metrics.running_score import RunningScore
from contrastiveseg_tpu.ops.confusion import confusion_matrix
from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners


def _swap_channels(seg: jnp.ndarray, pairs: Sequence[tuple[int, int]]):
    """Swap left/right class channels of flipped logits (LIP eval)."""
    perm = np.arange(seg.shape[-1])
    for a, b in pairs:
        perm[a], perm[b] = perm[b], perm[a]
    return seg[..., perm]


def make_val_step(model, num_classes: int, flip_average: bool = False,
                  flip_pairs: Sequence[tuple[int, int]] = ()):
    """Returns jitted (params, batch_stats, images, labels) -> confusion."""

    def forward(variables, images):
        out = model.apply(variables, images, train=False)
        return out["seg"] if isinstance(out, dict) else out

    def val_step(params, batch_stats, images, labels):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        seg = forward(variables, images)
        if flip_average:
            seg_f = forward(variables, images[:, :, ::-1, :])[:, :, ::-1, :]
            if flip_pairs:
                seg_f = _swap_channels(seg_f, flip_pairs)
            seg = 0.5 * (seg + seg_f)
        seg = resize_bilinear_align_corners(
            seg, (labels.shape[1], labels.shape[2])
        )
        pred = jnp.argmax(seg, axis=-1).astype(jnp.int32)
        return confusion_matrix(pred, labels, num_classes)

    return jax.jit(val_step)


class Evaluator:
    def __init__(self, model, num_classes: int,
                 shard_fn: Optional[Callable] = None,
                 flip_average: bool = False,
                 flip_pairs: Sequence[tuple[int, int]] = (),
                 batch_multiple: int = 1):
        self.num_classes = num_classes
        self.val_step = make_val_step(model, num_classes,
                                      flip_average=flip_average,
                                      flip_pairs=flip_pairs)
        self.score = RunningScore(num_classes)
        self.shard_fn = shard_fn
        # Mesh-sharded validation: batches must divide over the data axis.
        # Short batches are padded with zero images + ignore(-1) labels —
        # confusion_matrix drops label<0, so padding adds exactly nothing
        # (the reference instead all-reduces per-rank partial matrices,
        # running_score.py:163-168; same math, one global program here).
        self.batch_multiple = max(1, int(batch_multiple))

    def _pad_batch(self, b: dict) -> dict:
        n = b["image"].shape[0]
        k = (-n) % self.batch_multiple
        if k == 0:
            return b
        img = np.concatenate(
            [b["image"],
             np.zeros((k, *b["image"].shape[1:]), np.asarray(b["image"]).dtype)])
        lab = np.concatenate(
            [b["label"],
             np.full((k, *b["label"].shape[1:]), -1,
                     np.asarray(b["label"]).dtype)])
        return {"image": img, "label": lab}

    def run(self, params, batch_stats, batches) -> dict:
        from collections import deque

        self.score.reset()
        n_images = 0
        t0 = time.time()
        # jax dispatch is async: keep a couple of confusion matrices in
        # flight so the device computes batch i+1 while the host reads
        # and accumulates batch i (np.asarray is the sync point).
        pending: deque = deque()

        def drain(limit: int) -> None:
            nonlocal n_images
            while len(pending) > limit:
                cm, k = pending.popleft()
                self.score.update_confusion(np.asarray(cm))
                n_images += k

        for batch in batches:
            if isinstance(batch["image"], (list, tuple)):
                # diverse_size: one program per padded image shape.
                for img, lab in zip(batch["image"], batch["label"]):
                    pending.append(
                        (self.val_step(params, batch_stats,
                                       img[None], lab[None]), 1))
                    drain(2)
                continue
            b = {"image": batch["image"], "label": batch["label"]}
            if self.shard_fn is not None:
                b = self.shard_fn(self._pad_batch(b))
            pending.append(
                (self.val_step(params, batch_stats, b["image"], b["label"]),
                 batch["image"].shape[0]))
            drain(2)
        drain(0)
        scores = self.score.get_scores()
        scores["images_per_sec"] = n_images / max(time.time() - t0, 1e-9)
        return scores


class SegFixEvaluator:
    """MaskTask + DirectionTask validation (tasks.py:47-152).

    The model outputs stride-level ``mask`` (2ch) and ``dir``
    (num_directions ch); ground truth mask/dir labels ride in the batch
    (data/loaders_extra.DTOffsetDataset).  Reports:
      * ``mask_acc``   — boundary-mask pixel accuracy;
      * ``dir_acc_mask`` — direction accuracy on pixels the *predicted*
        mask marks as boundary ('dir (mask)');
      * ``dir_acc_gt``   — direction accuracy with wrong-mask pixels
        counted as an extra error class ('dir (GT)', the headline metric).
    """

    def __init__(self, model, num_directions: int = 8,
                 shard_fn: Optional[Callable] = None):
        self.num_directions = num_directions
        self.shard_fn = shard_fn

        def val_step(params, batch_stats, images, hw):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out = model.apply(variables, images, train=False)
            mask = resize_bilinear_align_corners(out["mask"], hw)
            direction = resize_bilinear_align_corners(out["dir"], hw)
            return (jnp.argmax(mask, -1).astype(jnp.int32),
                    jnp.argmax(direction, -1).astype(jnp.int32))

        self._val_step = jax.jit(val_step, static_argnums=(3,))
        self.reset()

    def reset(self):
        self.mask_score = RunningScore(2)
        self.dir_mask_score = RunningScore(self.num_directions)
        self.dir_gt_score = RunningScore(self.num_directions + 1)

    def run(self, params, batch_stats, batches) -> dict:
        self.reset()
        n_images = 0
        t0 = time.time()
        for batch in batches:
            if self.shard_fn is not None:
                batch = {**batch, **self.shard_fn(
                    {"image": batch["image"]})}
            gt_mask = np.asarray(batch["mask_label"])
            gt_dir = np.asarray(batch["dir_label"])
            hw = (gt_mask.shape[1], gt_mask.shape[2])
            mask_pred, dir_pred = self._val_step(
                params, batch_stats, batch["image"], hw)
            mask_pred = np.asarray(mask_pred)
            dir_pred = np.asarray(dir_pred)

            self.mask_score.update(mask_pred, gt_mask)  # -1 gt is ignored

            # 'dir (mask)': GT direction, ignored where predicted mask = 0.
            dir_gt_masked = np.where(mask_pred == 1, gt_dir, -1)
            self.dir_mask_score.update(dir_pred, dir_gt_masked)

            # 'dir (GT)': predicted direction, with non-boundary
            # predictions mapped to the extra class (tasks.py:139-149).
            dir_pred_gt = np.where(mask_pred == 1, dir_pred,
                                   self.num_directions)
            self.dir_gt_score.update(dir_pred_gt, gt_dir)
            n_images += np.asarray(batch["image"]).shape[0]

        scores = {
            "mask_acc": self.mask_score.get_scores()["pixel_acc"],
            "dir_acc_mask": self.dir_mask_score.get_scores()["pixel_acc"],
            "dir_acc_gt": self.dir_gt_score.get_scores()["pixel_acc"],
            "images_per_sec": n_images / max(time.time() - t0, 1e-9),
        }
        # Headline metric for checkpoint save_by_mode parity with seg.
        scores["miou"] = scores["dir_acc_gt"]
        scores["pixel_acc"] = scores["mask_acc"]
        return scores


class MLDirectionEvaluator:
    """MLDirectionTask (reference tasks.py:155-246): multi-label direction
    validation for sliding-window offset models.

    The model outputs ``mask`` (2ch) and ``ml_dir`` (8ch logits read as
    per-direction scores); ground truth arrives bit-packed in
    ``ml_dir_label`` (decoded via encode_multi_labels) plus ``mask_label``.
    Reports two MultiLabelRunningScore accuracies — against the predicted
    boundary mask ('ML dir (mask)') and against the GT mask ('ML dir
    (GT)', the headline metric).
    """

    def __init__(self, model, shard_fn: Optional[Callable] = None,
                 topk: int = 8):
        self.shard_fn = shard_fn
        self.topk = topk

        def val_step(params, batch_stats, images, hw):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out = model.apply(variables, images, train=False)
            mask = resize_bilinear_align_corners(out["mask"], hw)
            ml = resize_bilinear_align_corners(
                out["ml_dir"] if "ml_dir" in out else out["dir"], hw)
            return jnp.argmax(mask, -1).astype(jnp.int32), ml

        self._val_step = jax.jit(val_step, static_argnums=(3,))
        self.reset()

    def reset(self):
        from contrastiveseg_tpu.metrics.counters import (
            MultiLabelRunningScore,
        )

        self.score_mask = MultiLabelRunningScore()
        self.score_gt = MultiLabelRunningScore()

    def run(self, params, batch_stats, batches) -> dict:
        from contrastiveseg_tpu.utils.offset_helper import (
            encode_multi_labels,
            multilabel_direction_prediction,
        )

        self.reset()
        n_images = 0
        t0 = time.time()
        for batch in batches:
            if self.shard_fn is not None:
                batch = {**batch, **self.shard_fn({"image": batch["image"]})}
            gt_mask = np.asarray(batch["mask_label"])
            gt_ml = encode_multi_labels(
                np.asarray(batch["ml_dir_label"]).astype(np.int64))
            hw = (gt_mask.shape[1], gt_mask.shape[2])
            mask_pred, ml_logits = self._val_step(
                params, batch_stats, batch["image"], hw)
            mask_pred = np.asarray(mask_pred)
            ml_logits = np.asarray(ml_logits)
            for b in range(mask_pred.shape[0]):
                dir_pred = multilabel_direction_prediction(
                    ml_logits[b], no_offset_mask=mask_pred[b] == 0,
                    topk=self.topk)
                valid_gt = gt_ml[b].sum(-1) > 0
                self.score_mask.update(
                    dir_pred.reshape(-1), gt_ml[b].reshape(-1, 8),
                    ((mask_pred[b] == 1) & valid_gt).reshape(-1))
                self.score_gt.update(
                    dir_pred.reshape(-1), gt_ml[b].reshape(-1, 8),
                    ((gt_mask[b] == 1) & valid_gt).reshape(-1))
            n_images += mask_pred.shape[0]
        scores = {
            "ml_dir_acc_mask": self.score_mask.get_mean_acc(),
            "ml_dir_acc_gt": self.score_gt.get_mean_acc(),
            "images_per_sec": n_images / max(time.time() - t0, 1e-9),
        }
        scores["miou"] = scores["ml_dir_acc_gt"]  # headline (tasks.py:171)
        scores["pixel_acc"] = scores["ml_dir_acc_mask"]
        return scores


def build_evaluator(cfg, model, shard_fn=None, batch_multiple: int = 1):
    """Pick the task evaluator from config (evaluator/__init__.py:11)."""
    kind = cfg.get("val.evaluator", default=None)
    if kind is None:
        kind = ("segfix" if cfg.get("network.model_name", default="")
                .startswith("segfix") else "seg")
    if kind in ("ml_dir", "ml_direction"):
        return MLDirectionEvaluator(model, shard_fn=shard_fn)
    if kind == "segfix":
        return SegFixEvaluator(
            model,
            num_directions=cfg.get("segfix.num_directions", default=8),
            shard_fn=shard_fn,
        )
    return Evaluator(
        model,
        cfg.get("data.num_classes"),
        shard_fn=shard_fn,
        flip_average=cfg.get("val.flip_average", default=False),
        flip_pairs=[tuple(p) for p in
                    cfg.get("data.label_pairs", default=[]) or []],
        batch_multiple=batch_multiple,
    )
