#!/usr/bin/env python
"""Convert official Cityscapes (leftImg8bit/gtFine) into the framework's
directory layout: {out}/{split}/image/*.png + {out}/{split}/label/*.png.

Replaces the reference's preprocessing scripts
(lib/datasets/preprocess/cityscapes/*): copies images (or symlinks) and
the *_labelIds.png ground truth; the train-id remapping stays at load time
(data.label_list), so labels remain submission-compatible raw ids.

Usage:
    python tools/prepare_cityscapes.py --root /data/cityscapes_raw \
        --out /data/cityscapes [--link]
"""

from __future__ import annotations

import argparse
import os
import shutil


def prepare(root: str, out: str, link: bool = True,
            instance: bool = False) -> dict:
    """``instance=True`` additionally lays out `{split}/instance/` from the
    `*_gtFine_instanceIds.png` maps — the reference's
    cityscapes_instance_generator.py, which feeds the instance-boundary
    SegFix ground truth (data.dt_boundary="instance") and the
    instance-level AP evaluator."""
    counts = {}
    for split in ("train", "val", "test"):
        img_src = os.path.join(root, "leftImg8bit", split)
        lab_src = os.path.join(root, "gtFine", split)
        if not os.path.isdir(img_src):
            continue
        img_dst = os.path.join(out, split, "image")
        lab_dst = os.path.join(out, split, "label")
        ins_dst = os.path.join(out, split, "instance")
        os.makedirs(img_dst, exist_ok=True)
        os.makedirs(lab_dst, exist_ok=True)
        if instance:
            os.makedirs(ins_dst, exist_ok=True)
        n = 0
        for city in sorted(os.listdir(img_src)):
            for name in sorted(os.listdir(os.path.join(img_src, city))):
                if not name.endswith("_leftImg8bit.png"):
                    continue
                stem = name[: -len("_leftImg8bit.png")]
                src = os.path.join(img_src, city, name)
                dst = os.path.join(img_dst, stem + ".png")
                (os.symlink if link else shutil.copy2)(src, dst)
                lab = os.path.join(lab_src, city, stem + "_gtFine_labelIds.png")
                if os.path.exists(lab):
                    (os.symlink if link else shutil.copy2)(
                        lab, os.path.join(lab_dst, stem + ".png")
                    )
                if instance:
                    ins = os.path.join(
                        lab_src, city, stem + "_gtFine_instanceIds.png"
                    )
                    if os.path.exists(ins):
                        (os.symlink if link else shutil.copy2)(
                            ins, os.path.join(ins_dst, stem + ".png")
                        )
                n += 1
        counts[split] = n
    return counts


def generate_edge(label, edge_width: int = 3):
    """Semantic-boundary map: 255 on (dilated) class boundaries, 0 off.

    Vectorized counterpart of the reference's
    lib/datasets/preprocess/cityscapes/edge_generator.py `generate_edge`:
    the same four pairwise comparisons (right / up / upright /
    bottomright, marking the same member of each pair, ignoring 255) and
    a square dilation of ``edge_width`` (the reference's cv2.dilate with
    a MORPH_RECT kernel; callers pass kernel_size=10)."""
    import numpy as np
    from scipy import ndimage

    label = np.asarray(label)
    valid = label != 255
    edge = np.zeros(label.shape, bool)
    d = (label[1:, :] != label[:-1, :]) & valid[1:, :] & valid[:-1, :]
    edge[1:, :] |= d
    d = (label[:, :-1] != label[:, 1:]) & valid[:, :-1] & valid[:, 1:]
    edge[:, :-1] |= d
    d = (label[:-1, :-1] != label[1:, 1:]) & valid[:-1, :-1] & valid[1:, 1:]
    edge[:-1, :-1] |= d
    d = (label[:-1, 1:] != label[1:, :-1]) & valid[:-1, 1:] & valid[1:, :-1]
    edge[:-1, 1:] |= d
    if edge_width > 1:
        # cv2.dilate's even-kernel anchor is floor(k/2) from the top-left;
        # mirror it so a k=10 kernel reaches [-5, 4] around each pixel.
        k = edge_width
        edge = ndimage.binary_dilation(
            edge, structure=np.ones((k, k), bool),
            origin=((k - 1) // 2 - k // 2,) * 2,
        )
    return (edge.astype("uint8")) * 255


def generate_edge_void(out: str, edge_width: int = 10,
                       splits=("train", "val")) -> dict:
    """Lay out `{split}/edge/`, `{split}/label_edge_void/` (edge pixels ->
    255: train without boundary supervision, R_101_D_8_EDGE_VOID.json) and
    `{split}/label_non_edge_void/` (non-edge -> 255: evaluate only on
    boundary pixels, R_101_D_8_NON_EDGE_VOID.json) from `{split}/label/`
    — edge_generator.py's generate_train_val_edge / label_edge2void /
    label_nedge2void in one pass."""
    import numpy as np
    from PIL import Image

    counts = {}
    for split in splits:
        lab_dir = os.path.join(out, split, "label")
        if not os.path.isdir(lab_dir):
            continue
        dirs = {
            name: os.path.join(out, split, name)
            for name in ("edge", "label_edge_void", "label_non_edge_void")
        }
        for d in dirs.values():
            os.makedirs(d, exist_ok=True)
        n = 0
        for fn in sorted(os.listdir(lab_dir)):
            if not fn.endswith(".png"):
                continue
            label = np.asarray(
                Image.open(os.path.join(lab_dir, fn)).convert("P")
            )
            edge = generate_edge(label, edge_width)
            # Grayscale, not "P": PIL palette optimization would remap
            # 255 -> index 1 on save and break the == 255 convention.
            Image.fromarray(edge).save(os.path.join(dirs["edge"], fn))
            ev = label.copy()
            ev[edge == 255] = 255
            Image.fromarray(ev).save(
                os.path.join(dirs["label_edge_void"], fn))
            nv = label.copy()
            nv[edge == 0] = 255
            Image.fromarray(nv).save(
                os.path.join(dirs["label_non_edge_void"], fn))
            n += 1
        counts[split] = n
    return counts


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root")
    ap.add_argument("--out", required=True)
    ap.add_argument("--link", action="store_true", default=True)
    ap.add_argument("--copy", dest="link", action="store_false")
    ap.add_argument("--instance", action="store_true",
                    help="also lay out {split}/instance/ from "
                         "*_gtFine_instanceIds.png (instance-boundary "
                         "SegFix + instance AP eval)")
    ap.add_argument("--edge-void", action="store_true",
                    help="generate {split}/{edge,label_edge_void,"
                         "label_non_edge_void}/ from {split}/label/ "
                         "(data.label_edge2void / label_non_edge2void)")
    ap.add_argument("--edge-width", type=int, default=10,
                    help="boundary dilation width (reference kernel_size)")
    args = ap.parse_args()
    if args.root:
        print(prepare(args.root, args.out, args.link, args.instance))
    if args.edge_void:
        print(generate_edge_void(args.out, args.edge_width))
    elif not args.root:
        ap.error("need --root and/or --edge-void")
