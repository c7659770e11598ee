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
    dy = offset[..., 0] * scale
    dx = offset[..., 1] * scale
    ys = np.clip(np.arange(h)[:, None] + dy, 0, h - 1)
    xs = np.clip(np.arange(w)[None, :] + dx, 0, w - 1)
    return label[ys, xs]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--offset_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--num_classes", type=int, default=8)
    args = ap.parse_args()

    cfg = DTOffsetConfig(num_classes=args.num_classes)
    os.makedirs(args.out_dir, exist_ok=True)
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
