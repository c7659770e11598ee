#!/usr/bin/env python
"""SegFix offline refinement: shift boundary-pixel labels along predicted
offsets.

Re-implements scripts/cityscapes/segfix.py from the reference: for each
predicted label PNG, load the matching offset prediction (direction labels
or (dy, dx) vectors), and replace each boundary pixel's label with the
label at ``(y+dy, x+dx)``.

Usage:
    python tools/segfix.py --input_dir pred/label --offset_dir offsets \
        --out_dir refined [--scale 2] [--num_classes 8]

Offset files: ``{name}.npz`` with either ``dir_label`` [H, W] (+ optional
``mask`` [H, W]) or ``offset`` [H, W, 2].
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contrastiveseg_tpu.utils.offset_helper import (  # noqa: E402
    DTOffsetConfig,
    label_to_vector,
)


def apply_offsets(label: np.ndarray, offset: np.ndarray,
                  scale: int = 1) -> np.ndarray:
    """label [H, W]; offset [H, W, 2] int (dy, dx); returns refined label."""
    h, w = label.shape
    dy = (offset[..., 0] * scale).astype(np.int64)
    dx = (offset[..., 1] * scale).astype(np.int64)
    ys = np.clip(np.arange(h)[:, None] + dy, 0, h - 1)
    xs = np.clip(np.arange(w)[None, :] + dx, 0, w - 1)
    return label[ys, xs]


def shift_instance_masks(masks: np.ndarray, offset: np.ndarray,
                         scale: float = 1.0) -> np.ndarray:
    """Bilinearly resample binary instance masks along (dy, dx) offsets.

    Mirrors the reference's instance refinement
    (scripts/cityscapes/segfix_instance.py `shift`): each mask is sampled
    at ``(y + dy, x + dx)`` with border padding and re-thresholded at 0.5.
    The reference normalizes the sampling grid by ``(len-1)/2`` but calls
    ``grid_sample`` with its default ``align_corners=False``, which lands
    on pixel coordinate ``(p + dp) * len/(len-1) - 0.5`` — reproduced
    exactly so refined masks match pixel-for-pixel.

    masks: [N, H, W] (0/1 or bool); offset: [H, W, 2] float (dy, dx).
    """
    from scipy import ndimage

    n, h, w = masks.shape
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    sy = (yy + offset[..., 0] * scale) * h / (h - 1) - 0.5
    sx = (xx + offset[..., 1] * scale) * w / (w - 1) - 0.5
    coords = np.stack([sy, sx])
    out = np.empty((n, h, w), np.float64)
    for i in range(n):
        ndimage.map_coordinates(
            masks[i].astype(np.float64), coords, output=out[i],
            order=1, mode="nearest",
        )
    return (out > 0.5).astype(np.uint8)


def refine_instances(input_dir: str, offset_dir: str, out_dir: str,
                     scale: float = 1.0) -> int:
    """Instance-submission refinement (segfix_instance.py:66-94): for each
    ``*_pred.txt`` (cityscapes instance format: lines ``mask.png class
    score``), shift every listed binary mask along the image's offsets and
    re-save masks as 0/255 PNGs alongside a copy of the index file."""
    import shutil

    n_imgs = 0
    for fn in sorted(os.listdir(input_dir)):
        if not fn.endswith("_pred.txt"):
            continue
        names = []
        masks = []
        with open(os.path.join(input_dir, fn)) as f:
            for line in f:
                if not line.strip():
                    continue
                name = line.strip().split()[0]
                names.append(name)
                masks.append(np.asarray(
                    Image.open(os.path.join(input_dir, name)).convert("P")
                ))
        shutil.copy(os.path.join(input_dir, fn), out_dir)
        if masks:
            stem = fn[: -len("_pred.txt")]
            off_path = os.path.join(offset_dir, stem + ".npz")
            stack = (np.stack(masks, 0) > 0).astype(np.uint8)
            if os.path.exists(off_path):
                data = np.load(off_path)
                offset = data["offset"].astype(np.float32)
                stack = shift_instance_masks(stack, offset, scale)
            for name, mask in zip(names, stack):
                out_path = os.path.join(out_dir, name)
                os.makedirs(os.path.dirname(out_path) or out_dir,
                            exist_ok=True)
                Image.fromarray(mask * 255).save(out_path)
        n_imgs += 1
    return n_imgs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--offset_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--scale", type=float, default=2)
    ap.add_argument("--num_classes", type=int, default=8)
    ap.add_argument("--c4_align_axis", action="store_true",
                    help="axis-aligned 4-direction mapping (reference "
                         "c4_align_axis env flag)")
    ap.add_argument("--mode", choices=["semantic", "instance"],
                    default="semantic",
                    help="instance: refine cityscapes instance submissions "
                         "(*_pred.txt + binary mask PNGs) along offsets — "
                         "scripts/cityscapes/segfix_instance.py")
    args = ap.parse_args()

    cfg = DTOffsetConfig(num_classes=args.num_classes,
                         c4_align_axis=args.c4_align_axis)
    os.makedirs(args.out_dir, exist_ok=True)
    if args.mode == "instance":
        n = refine_instances(args.input_dir, args.offset_dir, args.out_dir,
                             args.scale)
        print(f"refined {n} instance submissions -> {args.out_dir}")
        return
    n = 0
    for name in sorted(os.listdir(args.input_dir)):
        if not name.endswith(".png"):
            continue
        stem = os.path.splitext(name)[0]
        off_path = os.path.join(args.offset_dir, stem + ".npz")
        label = np.asarray(
            Image.open(os.path.join(args.input_dir, name))
        ).astype(np.int64)
        if not os.path.exists(off_path):
            out = label
        else:
            data = np.load(off_path)
            if "offset" in data:
                offset = data["offset"].astype(np.int64)
            else:
                dir_label = data["dir_label"].astype(np.int64)
                if "mask" in data:
                    dir_label = np.where(data["mask"] > 0, dir_label, -1)
                offset = label_to_vector(dir_label, cfg)
            out = apply_offsets(label, offset, args.scale)
        Image.fromarray(out.astype(np.uint8)).save(
            os.path.join(args.out_dir, name)
        )
        n += 1
    print(f"refined {n} label maps -> {args.out_dir}")


if __name__ == "__main__":
    main()
