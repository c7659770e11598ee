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


def prepare(root: str, out: str, link: bool = True) -> dict:
    counts = {}
    for split in ("train", "val", "test"):
        img_src = os.path.join(root, "leftImg8bit", split)
        lab_src = os.path.join(root, "gtFine", split)
        if not os.path.isdir(img_src):
            continue
        img_dst = os.path.join(out, split, "image")
        lab_dst = os.path.join(out, split, "label")
        os.makedirs(img_dst, exist_ok=True)
        os.makedirs(lab_dst, exist_ok=True)
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
                n += 1
        counts[split] = n
    return counts


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--link", action="store_true", default=True)
    ap.add_argument("--copy", dest="link", action="store_false")
    args = ap.parse_args()
    print(prepare(args.root, args.out, args.link))
