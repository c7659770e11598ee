#!/usr/bin/env python
"""Dataset converters: original layouts -> {out}/{split}/{image,label}.

Replaces the reference's per-dataset preprocess scripts
(lib/datasets/preprocess/{ade20k,coco_stuff,lip,pascal_context}/**):

    python tools/prepare_datasets.py ade20k --root ADEChallengeData2016 --out /data/ade20k
    python tools/prepare_datasets.py coco_stuff --root cocostuff-10k --out /data/coco_stuff
    python tools/prepare_datasets.py lip --root LIP --out /data/lip
    python tools/prepare_datasets.py pascal_context --root VOC2010+trainval --out /data/pascal_context

All converters copy (or symlink with --link) images and write label PNGs;
train-id shifts stay at load time (data.reduce_zero_label / label_list),
so labels remain raw-id compatible like the reference generators.
"""

from __future__ import annotations

import argparse
import os
import shutil


def _place(src: str, dst: str, link: bool) -> None:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if link:
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(os.path.abspath(src), dst)
    else:
        shutil.copyfile(src, dst)


def prepare_ade20k(root: str, out: str, link: bool) -> dict:
    """ADEChallengeData2016: images/{training,validation}/*.jpg +
    annotations/*.png (ade20k_generator.py:40-80)."""
    counts = {}
    for split, sub in (("train", "training"), ("val", "validation")):
        img_dir = os.path.join(root, "images", sub)
        lab_dir = os.path.join(root, "annotations", sub)
        n = 0
        for f in sorted(os.listdir(img_dir)):
            if not f.endswith(".jpg"):
                continue
            base = os.path.splitext(f)[0]
            lab = os.path.join(lab_dir, base + ".png")
            if not os.path.exists(lab):
                continue
            _place(os.path.join(img_dir, f),
                   os.path.join(out, split, "image", f), link)
            _place(lab, os.path.join(out, split, "label", base + ".png"), link)
            n += 1
        counts[split] = n
    return counts


def prepare_coco_stuff(root: str, out: str, link: bool) -> dict:
    """COCO-Stuff 10k: imageLists/{train,test}.txt + annotations/*.mat
    ('S' matrix) + images/*.jpg (coco_stuff_generator.py:16-65)."""
    import numpy as np
    from PIL import Image
    from scipy import io as sio

    counts = {}
    for split, listfile in (("train", "train.txt"), ("val", "test.txt")):
        n = 0
        with open(os.path.join(root, "imageLists", listfile)) as f:
            names = [ln.strip() for ln in f if ln.strip()]
        for name in names:
            _place(os.path.join(root, "images", name + ".jpg"),
                   os.path.join(out, split, "image", name + ".jpg"), link)
            mat = sio.loadmat(
                os.path.join(root, "annotations", name + ".mat"))
            lab = mat["S"].astype(np.uint8)
            dst = os.path.join(out, split, "label", name + ".png")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            Image.fromarray(lab).save(dst)
            n += 1
        counts[split] = n
    return counts


def prepare_lip(root: str, out: str, link: bool) -> dict:
    """LIP single-person: {split}_images/*.jpg +
    {split}_segmentations/*.png (TrainVal_images/TrainVal_parsing
    layouts both accepted)."""
    counts = {}
    layouts = [
        ("train", ["train_images", "TrainVal_images/train_images"],
         ["train_segmentations", "TrainVal_parsing_annotations/train_segmentations"]),
        ("val", ["val_images", "TrainVal_images/val_images"],
         ["val_segmentations", "TrainVal_parsing_annotations/val_segmentations"]),
    ]
    for split, img_cands, lab_cands in layouts:
        img_dir = next((os.path.join(root, c) for c in img_cands
                        if os.path.isdir(os.path.join(root, c))), None)
        lab_dir = next((os.path.join(root, c) for c in lab_cands
                        if os.path.isdir(os.path.join(root, c))), None)
        if img_dir is None or lab_dir is None:
            counts[split] = 0
            continue
        n = 0
        for f in sorted(os.listdir(img_dir)):
            if not f.endswith(".jpg"):
                continue
            base = os.path.splitext(f)[0]
            lab = os.path.join(lab_dir, base + ".png")
            if not os.path.exists(lab):
                continue
            _place(os.path.join(img_dir, f),
                   os.path.join(out, split, "image", f), link)
            _place(lab, os.path.join(out, split, "label", base + ".png"), link)
            n += 1
        counts[split] = n
    return counts


def prepare_pascal_context(root: str, out: str, link: bool) -> dict:
    """PASCAL-Context: VOC2010 JPEGImages + trainval/*.mat
    ('LabelMap') + ImageSets splits (pascal_context_generator.py)."""
    import numpy as np
    from PIL import Image
    from scipy import io as sio

    img_dir = os.path.join(root, "JPEGImages")
    mat_dir = os.path.join(root, "trainval")
    counts = {}
    for split, listname in (("train", "train.txt"), ("val", "val.txt")):
        listfile = os.path.join(root, "ImageSets", "Main", listname)
        if not os.path.exists(listfile):
            counts[split] = 0
            continue
        with open(listfile) as f:
            names = [ln.split()[0] for ln in f if ln.strip()]
        n = 0
        for name in names:
            mat_path = os.path.join(mat_dir, name + ".mat")
            if not os.path.exists(mat_path):
                continue
            _place(os.path.join(img_dir, name + ".jpg"),
                   os.path.join(out, split, "image", name + ".jpg"), link)
            lab = sio.loadmat(mat_path)["LabelMap"].astype(np.uint16)
            dst = os.path.join(out, split, "label", name + ".png")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            Image.fromarray(lab.astype(np.int32), mode="I").save(dst)
            n += 1
        counts[split] = n
    return counts


CONVERTERS = {
    "ade20k": prepare_ade20k,
    "coco_stuff": prepare_coco_stuff,
    "lip": prepare_lip,
    "pascal_context": prepare_pascal_context,
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset", choices=sorted(CONVERTERS))
    ap.add_argument("--root", required=True, help="original dataset root")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--link", action="store_true",
                    help="symlink instead of copying")
    args = ap.parse_args()
    counts = CONVERTERS[args.dataset](args.root, args.out, args.link)
    for split, n in counts.items():
        print(f"{args.dataset} {split}: {n} samples -> {args.out}/{split}")


if __name__ == "__main__":
    main()
