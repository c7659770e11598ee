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


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--link", action="store_true", default=True)
    ap.add_argument("--copy", dest="link", action="store_false")
    ap.add_argument("--instance", action="store_true",
                    help="also lay out {split}/instance/ from "
                         "*_gtFine_instanceIds.png (instance-boundary "
                         "SegFix + instance AP eval)")
    args = ap.parse_args()
    print(prepare(args.root, args.out, args.link, args.instance))
