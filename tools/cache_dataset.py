#!/usr/bin/env python
"""Decode a dataset's PNGs once into mmap-able .npy sidecars.

PNG decode of a 1024x2048 Cityscapes frame costs 50-100 ms on one host
core and the reference re-pays it every epoch (cv2.imread per __getitem__,
default_loader.py).  This tool walks `{root}/{split}/image` and every
label dir, decodes each file once, and writes the raw array next to it in
a `.npy_cache/` subdirectory; `DirectorySegDataset` then reads the cache
via np.load(mmap_mode='r') (~0.2 ms) whenever it is at least as new as
the source.  Images cache as the RGB uint8 array, labels as their raw
decoded form — every downstream semantic (label_list remap,
reduce_zero_label, ignore relabel) is applied after the read, unchanged.

    python tools/cache_dataset.py --root /data/cityscapes --splits train,val

Re-run after changing source files (stale caches are ignored, not
auto-rebuilt).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contrastiveseg_tpu.data.datasets import IMG_EXTS  # noqa: E402


def cache_dir_files(d: str, as_rgb: bool) -> tuple[int, int]:
    """Cache every image file directly inside `d`; returns (new, kept)."""
    if not os.path.isdir(d):
        return (0, 0)
    out_dir = os.path.join(d, ".npy_cache")
    os.makedirs(out_dir, exist_ok=True)
    new = kept = 0
    for name in sorted(os.listdir(d)):
        if not name.lower().endswith(IMG_EXTS):
            continue
        src = os.path.join(d, name)
        dst = os.path.join(out_dir, name + ".npy")
        if os.path.exists(dst) and os.path.getmtime(dst) >= os.path.getmtime(
                src):
            kept += 1
            continue
        im = Image.open(src)
        arr = np.asarray(im.convert("RGB")) if as_rgb else np.asarray(im)
        np.save(dst, arr)
        new += 1
    return (new, kept)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True, help="dataset root "
                    "({root}/{split}/image + label layout)")
    ap.add_argument("--splits", default="train,val")
    args = ap.parse_args()

    total_new = total_kept = 0
    for split in args.splits.split(","):
        base = os.path.join(args.root, split)
        if not os.path.isdir(base):
            print(f"skip {base}: not a directory")
            continue
        for sub in sorted(os.listdir(base)):
            d = os.path.join(base, sub)
            if not os.path.isdir(d) or sub.startswith("."):
                continue
            as_rgb = sub == "image"
            new, kept = cache_dir_files(d, as_rgb)
            if new or kept:
                print(f"{d}: {new} cached, {kept} fresh")
            total_new += new
            total_kept += kept
    print(f"done: {total_new} decoded, {total_kept} already fresh")


if __name__ == "__main__":
    main()
