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
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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


def prepare_camvid(root: str, out: str, link: bool) -> dict:
    """CamVid: {root}/{split}/{image,label} pairs copied through
    (camvid_generator.py:60-95).  Divergence: the reference renames labels
    to `{stem}_1_1.png` while leaving images unrenamed, which breaks its
    own DefaultLoader stem-pairing — we keep matching stems instead."""
    counts = {}
    for split in ("train", "val", "test"):
        img_dir = os.path.join(root, split, "image")
        lab_dir = os.path.join(root, split, "label")
        n = 0
        if not os.path.isdir(img_dir):
            counts[split] = 0
            continue
        for f in sorted(os.listdir(img_dir)):
            stem, ext = os.path.splitext(f)
            if ext.lower() not in (".png", ".jpg", ".jpeg", ".bmp"):
                continue
            lab = os.path.join(lab_dir, f)
            if not os.path.exists(lab):
                lab = os.path.join(lab_dir, stem + ".png")
            if not os.path.exists(lab):
                continue
            _place(os.path.join(img_dir, f),
                   os.path.join(out, split, "image", f), link)
            _place(lab, os.path.join(out, split, "label", stem + ".png"),
                   link)
            n += 1
        counts[split] = n
    return counts


# Cityscapes raw-id by class name (mapillary_generator.py:70-76).
_CITY_NAME_TO_ID = {
    "road": 7, "sidewalk": 8, "building": 11, "wall": 12, "fence": 13,
    "pole": 17, "trafficlight": 19, "trafficsign": 20, "vegetation": 21,
    "terrain": 22, "sky": 23, "person": 24, "rider": 25, "car": 26,
    "truck": 27, "bus": 28, "train": 31, "motorcycle": 32, "bicycle": 33,
}


def mapillary_to_cityscapes_table(labels: list[dict]) -> "np.ndarray":
    """Mapillary label list (config.json) -> cityscapes raw ids, with the
    reference's name-matching fallbacks (mapillary_generator.py:78-115)."""
    import numpy as np

    table = np.full(len(labels), 255, np.uint8)
    for i, label in enumerate(labels):
        name = label["readable"].lower().replace(" ", "").replace("-", "")
        if name in _CITY_NAME_TO_ID:
            table[i] = _CITY_NAME_TO_ID[name]
        elif "trafficsign" in name or "front" in name or "back" in name:
            table[i] = _CITY_NAME_TO_ID["trafficsign"]
        elif "onrail" in name:
            table[i] = _CITY_NAME_TO_ID["train"]
        elif "cyclist" in name or "rider" in name:
            table[i] = _CITY_NAME_TO_ID["rider"]
        elif "pole" in name or "streetlight" in name:
            table[i] = _CITY_NAME_TO_ID["pole"]
        elif "curb" in name or "pedestrianarea" in name:
            table[i] = _CITY_NAME_TO_ID["sidewalk"]
        elif ("crosswalkplain" in name or "parking" in name
              or "bikelane" in name or "servicelane" in name
              or "lanemarking" in name):
            table[i] = _CITY_NAME_TO_ID["road"]
    return table


def prepare_mapillary(root: str, out: str, link: bool) -> dict:
    """Mapillary Vistas -> cityscapes-raw-id labels
    (mapillary_generator.py): reads {root}/config.json for the label
    names, remaps {root}/{split}/label/*.png through the name-match
    table, passes images through.  Output labels pair with
    `data.label_list` (cityscapes raw ids) or the only_mapillary extra
    set."""
    import json

    import numpy as np
    from PIL import Image

    with open(os.path.join(root, "config.json")) as f:
        labels = json.load(f)["labels"]
    table = mapillary_to_cityscapes_table(labels)

    counts = {}
    for split in ("train", "val"):
        img_dir = os.path.join(root, split, "image")
        lab_dir = os.path.join(root, split, "label")
        n = 0
        if not os.path.isdir(lab_dir):
            counts[split] = 0
            continue
        for f in sorted(os.listdir(lab_dir)):
            if not f.endswith(".png"):
                continue
            mask = np.asarray(Image.open(os.path.join(lab_dir, f)))
            if mask.ndim == 3:
                mask = mask[..., 0]
            remapped = table[mask]
            dst = os.path.join(out, split, "label", f)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            Image.fromarray(remapped).save(dst)
            stem = os.path.splitext(f)[0]
            for ext in (".jpg", ".png", ".jpeg"):
                src_img = os.path.join(img_dir, stem + ext)
                if os.path.exists(src_img):
                    _place(src_img,
                           os.path.join(out, split, "image", stem + ext),
                           link)
                    break
            n += 1
        counts[split] = n
    return counts


# CelebAMask-HQ part order (celebmask_label_generator.py:18-19): part i
# gets label id i+1; 0 is background.
CELEBA_PARTS = [
    "skin", "nose", "eye_g", "l_eye", "r_eye", "l_brow", "r_brow", "l_ear",
    "r_ear", "mouth", "u_lip", "l_lip", "hair", "hat", "ear_r", "neck_l",
    "neck", "cloth",
]


def prepare_celeba(root: str, out: str, link: bool,
                   val_frac: float = 0.05, test_frac: float = 0.05) -> dict:
    """CelebAMask-HQ: combine the per-part binary masks
    ({root}/CelebAMask-HQ-mask-anno/{k//2000}/{k:05d}_{part}.png) into one
    label map per face (celebmask_label_generator.py:25-44) and partition
    with the images ({root}/CelebA-HQ-img/{k}.jpg) into train/val/test
    (celebmask_partition.py; deterministic tail split here instead of the
    CelebA mapping table, documented divergence)."""
    import numpy as np
    from PIL import Image

    anno = os.path.join(root, "CelebAMask-HQ-mask-anno")
    img_root = os.path.join(root, "CelebA-HQ-img")
    ks = set()
    for sub in sorted(os.listdir(anno)):
        d = os.path.join(anno, sub)
        if not os.path.isdir(d):
            continue
        for f in os.listdir(d):
            if f.endswith(".png") and "_" in f:
                ks.add(int(f.split("_")[0]))
    ks = sorted(ks)
    n_test = max(int(len(ks) * test_frac), 1)
    n_val = max(int(len(ks) * val_frac), 1)
    counts = {"train": 0, "val": 0, "test": 0}
    for pos, k in enumerate(ks):
        split = ("test" if pos >= len(ks) - n_test
                 else "val" if pos >= len(ks) - n_test - n_val else "train")
        label = None
        for idx, part in enumerate(CELEBA_PARTS):
            p = os.path.join(anno, str(k // 2000), f"{k:05d}_{part}.png")
            if not os.path.exists(p):
                continue
            im = np.asarray(Image.open(p))
            if im.ndim == 3:
                im = im[..., 0]
            if label is None:
                label = np.zeros(im.shape, np.uint8)
            label[im != 0] = idx + 1
        if label is None:
            continue
        dst = os.path.join(out, split, "label", f"{k}.png")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        Image.fromarray(label).save(dst)
        for ext in (".jpg", ".png"):
            src_img = os.path.join(img_root, f"{k}{ext}")
            if os.path.exists(src_img):
                img_dst = os.path.join(out, split, "image", f"{k}{ext}")
                im = Image.open(src_img)
                if im.size != label.shape[::-1]:
                    # CelebA-HQ images are 1024x1024 but the part masks
                    # are 512x512 — downsize to the mask resolution
                    # (celebmask_resize.py:28-35's Image.ANTIALIAS).
                    os.makedirs(os.path.dirname(img_dst), exist_ok=True)
                    im.resize(label.shape[::-1],
                              Image.LANCZOS).save(img_dst)
                else:
                    _place(src_img, img_dst, link)
                break
        counts[split] += 1
    return counts


def prepare_pascal_voc(root: str, out: str, link: bool) -> dict:
    """PASCAL VOC 2012: JPEGImages + SegmentationClass +
    ImageSets/Segmentation/{train,val,trainval}.txt.  The reference's
    generator (preprocess/pascal_voc/pascal_voc_generator.py) instead
    unpacks a PytorchEncoding .pth mask dump (the SBD-augmented set);
    this converter takes the standard VOC layout — same output tree, and
    the trainval split feeds data.include_val's pascal_voc swap."""
    img_dir = os.path.join(root, "JPEGImages")
    lab_dir = os.path.join(root, "SegmentationClass")
    counts = {}
    for split in ("train", "val", "trainval"):
        listfile = os.path.join(root, "ImageSets", "Segmentation",
                                f"{split}.txt")
        if not os.path.exists(listfile):
            counts[split] = 0
            continue
        with open(listfile) as f:
            names = [ln.strip() for ln in f if ln.strip()]
        n = 0
        for name in names:
            img = os.path.join(img_dir, name + ".jpg")
            lab = os.path.join(lab_dir, name + ".png")
            if not (os.path.exists(img) and os.path.exists(lab)):
                continue
            _place(img, os.path.join(out, split, "image", name + ".jpg"),
                   link)
            _place(lab, os.path.join(out, split, "label", name + ".png"),
                   link)
            n += 1
        counts[split] = n
    return counts


def prepare_woodscape(root: str, out: str, link: bool) -> dict:
    """WoodScape fisheye -> rectified pinhole (calibrate_to_rect.py):
    images named *_{FV,RV,MVL,MVR}.png under {root}/{split}/image with
    per-camera calibration JSONs in {root}/calib/ (falling back to the
    reference's bundled JSONs); images remap bilinear, labels nearest.
    The projection math lives in data/woodscape.py (golden-matched to
    the vendored Valeo pipeline sub-pixel)."""
    import numpy as np
    from PIL import Image

    from contrastiveseg_tpu.data.woodscape import (
        WoodscapeCamera,
        rectification_maps,
        remap,
    )

    ref_calib = "/root/reference/lib/datasets/preprocess/woodscape"
    maps_cache: dict[str, tuple] = {}

    def maps_for(cam_name: str):
        if cam_name not in maps_cache:
            for base in (os.path.join(root, "calib"), root, ref_calib):
                p = os.path.join(base, f"{cam_name}.json")
                if os.path.exists(p):
                    cam = WoodscapeCamera.from_json(p)
                    maps_cache[cam_name] = rectification_maps(cam)
                    break
            else:
                maps_cache[cam_name] = None
        return maps_cache[cam_name]

    counts = {}
    for split in ("train", "val", "test"):
        img_dir = os.path.join(root, split, "image")
        lab_dir = os.path.join(root, split, "label")
        n = 0
        if not os.path.isdir(img_dir):
            counts[split] = 0
            continue
        for f in sorted(os.listdir(img_dir)):
            if not f.endswith(".png"):
                continue
            cam_name = os.path.splitext(f)[0].split("_")[-1]
            m = maps_for(cam_name)
            if m is None:
                continue
            mx, my = m
            img = np.asarray(Image.open(os.path.join(img_dir, f)))
            dst = os.path.join(out, split, "image", f)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            Image.fromarray(
                remap(img.astype(np.float32), mx, my).clip(0, 255)
                .astype(np.uint8)).save(dst)
            lab_path = os.path.join(lab_dir, f)
            if os.path.exists(lab_path):
                lab = np.asarray(Image.open(lab_path))
                dstl = os.path.join(out, split, "label", f)
                os.makedirs(os.path.dirname(dstl), exist_ok=True)
                Image.fromarray(
                    remap(lab, mx, my, order=0).astype(lab.dtype)).save(dstl)
            n += 1
        counts[split] = n
    return counts


def prepare_woodscape_cyl2fisheye(root: str, out: str, link: bool) -> dict:
    """Render fisheye frames from cylindrical ones
    (preprocess/woodscape/cylindrical_to_fisheye.py): same layout and
    calibration lookup as prepare_woodscape, but remapping through
    cylindrical_to_fisheye_maps (the reference's
    create_img_projection_maps(make_cylindrical_cam(cam), cam))."""
    import numpy as np
    from PIL import Image

    from contrastiveseg_tpu.data.woodscape import (
        WoodscapeCamera,
        cylindrical_to_fisheye_maps,
        remap,
    )

    ref_calib = "/root/reference/lib/datasets/preprocess/woodscape"
    maps_cache: dict[str, tuple] = {}

    def maps_for(cam_name: str):
        if cam_name not in maps_cache:
            for base in (os.path.join(root, "calib"), root, ref_calib):
                p = os.path.join(base, f"{cam_name}.json")
                if os.path.exists(p):
                    cam = WoodscapeCamera.from_json(p)
                    maps_cache[cam_name] = cylindrical_to_fisheye_maps(cam)
                    break
            else:
                maps_cache[cam_name] = None
        return maps_cache[cam_name]

    counts = {}
    for split in ("train", "val", "test"):
        img_dir = os.path.join(root, split, "image")
        n = 0
        if not os.path.isdir(img_dir):
            counts[split] = 0
            continue
        for f in sorted(os.listdir(img_dir)):
            if not f.endswith(".png"):
                continue
            m = maps_for(os.path.splitext(f)[0].split("_")[-1])
            if m is None:
                continue
            mx, my = m
            img = np.asarray(Image.open(os.path.join(img_dir, f)))
            dst = os.path.join(out, split, "image", f)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            Image.fromarray(
                remap(img.astype(np.float32), mx, my).clip(0, 255)
                .astype(np.uint8)).save(dst)
            n += 1
        counts[split] = n
    return counts


CONVERTERS = {
    "ade20k": prepare_ade20k,
    "coco_stuff": prepare_coco_stuff,
    "lip": prepare_lip,
    "pascal_context": prepare_pascal_context,
    "camvid": prepare_camvid,
    "mapillary": prepare_mapillary,
    "celeba": prepare_celeba,
    "pascal_voc": prepare_pascal_voc,
    "woodscape": prepare_woodscape,
    "woodscape_cyl2fisheye": prepare_woodscape_cyl2fisheye,
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
