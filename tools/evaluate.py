#!/usr/bin/env python
"""Offline evaluator: compare prediction PNGs against ground-truth PNGs.

Replaces the reference's cityscapes-scripts port
(lib/metrics/cityscapes_evaluator.py + the C/Cython confusion inner loop):
the histogram runs through the native C kernel (native/segdata.cpp) with a
numpy fallback.  Predictions and ground truth may be raw label ids (they
are remapped with --label_list, the cityscapes default) or train ids.

Usage:
    python tools/evaluate.py --pred_dir out/label --gt_dir data/val/label \
        [--dataset cityscapes] [--num_classes 19] [--train_ids]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contrastiveseg_tpu.data.datasets import (  # noqa: E402
    CITYSCAPES_LABEL_LIST,
    encode_label_map,
)
from contrastiveseg_tpu.metrics.running_score import RunningScore  # noqa: E402

CITYSCAPES_CLASSES = [
    "road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic light", "traffic sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
]


def evaluate_dirs(pred_dir: str, gt_dir: str, num_classes: int,
                  label_list=None, train_ids=False) -> dict:
    from contrastiveseg_tpu.data import native

    score = RunningScore(num_classes)
    n = 0
    for name in sorted(os.listdir(pred_dir)):
        if not name.endswith(".png"):
            continue
        gt_path = os.path.join(gt_dir, name)
        if not os.path.exists(gt_path):
            continue
        pred = np.asarray(Image.open(os.path.join(pred_dir, name))).astype(np.int64)
        gt = np.asarray(Image.open(gt_path)).astype(np.int64)
        if pred.ndim == 3:
            pred = pred[..., 0]
        if gt.ndim == 3:
            gt = gt[..., 0]
        if not train_ids and label_list is not None:
            pred = encode_label_map(pred, label_list)
            gt = encode_label_map(gt, label_list)
            pred = np.where(pred == 255, -1, pred)
            gt = np.where(gt == 255, -1, gt)
        cm = native.confusion_matrix_i64(
            pred.astype(np.int32), gt.astype(np.int32), num_classes
        )
        if cm is None:
            from contrastiveseg_tpu.ops.confusion import confusion_matrix

            cm = np.asarray(confusion_matrix(
                pred.astype(np.int32), gt.astype(np.int32), num_classes))
        score.update_confusion(cm)
        n += 1
    scores = score.get_scores()
    scores["num_images"] = n
    return scores


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred_dir", required=True)
    ap.add_argument("--gt_dir", required=True)
    ap.add_argument("--dataset", default="cityscapes")
    ap.add_argument("--num_classes", type=int, default=19)
    ap.add_argument("--train_ids", action="store_true",
                    help="inputs already use train ids")
    args = ap.parse_args()

    from contrastiveseg_tpu.metrics.dataset_evaluators import EVALUATORS

    if args.dataset in EVALUATORS:
        # Per-dataset conventions (ade20k/pascal_context shift-by-one,
        # coco_stuff id remap + gt void) — reference
        # lib/metrics/{ade20k,cocostuff,pascal_context}_evaluator.py.
        ev = EVALUATORS[args.dataset](args.num_classes)
        r = ev.evaluate(args.pred_dir, args.gt_dir)
        print(f"evaluated {r['images']} images")
        for i, iou in enumerate(r["cls_iou"]):
            print(f"  class{i:<11} IoU {iou:.4f}")
        print(f"mIoU: {r['miou']:.4f}  pixelAcc: {r['pixel_acc']:.4f}")
        return

    label_list = CITYSCAPES_LABEL_LIST if args.dataset == "cityscapes" else None
    scores = evaluate_dirs(
        args.pred_dir, args.gt_dir, args.num_classes, label_list,
        args.train_ids,
    )
    names = (
        CITYSCAPES_CLASSES
        if args.dataset == "cityscapes" and args.num_classes == 19
        else [f"class{i}" for i in range(args.num_classes)]
    )
    print(f"evaluated {scores['num_images']} images")
    for name, iou in zip(names, scores["cls_iou"]):
        print(f"  {name:<16} IoU {iou:.4f}")
    print(f"mIoU: {scores['miou']:.4f}  pixelAcc: {scores['pixel_acc']:.4f}")


if __name__ == "__main__":
    main()
