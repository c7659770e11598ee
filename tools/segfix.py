#!/usr/bin/env python
"""SegFix offline refinement: shift boundary-pixel labels along predicted
offsets.

Re-implements the reference apply scripts
(scripts/cityscapes/{segfix,segfix_ade20k,segfix_instance}.py): for each
predicted label PNG, load the matching offset prediction (direction labels
or (dy, dx) vectors; ``.npz`` from our Tester or the reference's released
``.mat`` files), and replace each boundary pixel's label with the label at
``(y+dy, x+dx)``.  ``--dataset cityscapes|ade20k`` handles raw submission
ids (encode -> shift -> decode, the LabelTransformer in both scripts);
``--interp bilinear`` reproduces their grid_sample+round path exactly.

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


def grid_sample_shift(stack: np.ndarray, offset: np.ndarray,
                      scale: float = 1.0) -> np.ndarray:
    """Bilinearly resample [N, H, W] float maps along (dy, dx) offsets.

    Reproduces the reference apply scripts' torch ``shift`` exactly
    (scripts/cityscapes/{segfix,segfix_instance,segfix_ade20k}.py): the
    sampling grid is normalized by ``(len-1)/2`` but ``grid_sample`` runs
    with its default ``align_corners=False``, which lands on pixel
    coordinate ``(p + dp) * len/(len-1) - 0.5`` — kept so refined outputs
    match the reference pixel-for-pixel.  Border padding.
    """
    from scipy import ndimage

    n, h, w = stack.shape
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    sy = (yy + offset[..., 0] * scale) * h / (h - 1) - 0.5
    sx = (xx + offset[..., 1] * scale) * w / (w - 1) - 0.5
    coords = np.stack([sy, sx])
    out = np.empty((n, h, w), np.float64)
    for i in range(n):
        ndimage.map_coordinates(
            stack[i].astype(np.float64), coords, output=out[i],
            order=1, mode="nearest",
        )
    return out


def shift_instance_masks(masks: np.ndarray, offset: np.ndarray,
                         scale: float = 1.0) -> np.ndarray:
    """Binary instance masks shifted along offsets, re-thresholded at 0.5
    (scripts/cityscapes/segfix_instance.py `shift`).

    masks: [N, H, W] (0/1 or bool); offset: [H, W, 2] float (dy, dx).
    """
    out = grid_sample_shift(masks.astype(np.float64), offset, scale)
    return (out > 0.5).astype(np.uint8)


# Raw-submission label encodings used by the reference apply scripts:
# cityscapes labelIds (scripts/cityscapes/segfix.py LabelTransformer) and
# ade20k 1-based ids (scripts/cityscapes/segfix_ade20k.py).  "trainid"
# means the labels are already contiguous train ids (our Tester output).
RAW_ID_LISTS = {
    "cityscapes": [7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26,
                   27, 28, 31, 32, 33],
    "ade20k": list(range(1, 151)),
}


def encode_raw_labels(label: np.ndarray, dataset: str) -> np.ndarray:
    """Raw submission ids -> contiguous train ids (255 = unlabeled)."""
    lut = np.full(256, 255, np.int64)
    for i, raw in enumerate(RAW_ID_LISTS[dataset]):
        lut[raw] = i
    return lut[label.astype(np.int64)]


def decode_raw_labels(label: np.ndarray, dataset: str) -> np.ndarray:
    """Contiguous train ids -> raw submission ids (255 = unlabeled)."""
    lut = np.full(256, 255, np.uint8)
    for i, raw in enumerate(RAW_ID_LISTS[dataset]):
        lut[i] = raw
    return lut[np.clip(label, 0, 255).astype(np.int64)]


def shift_labels_bilinear(label: np.ndarray, offset: np.ndarray,
                          scale: float = 1.0) -> np.ndarray:
    """The reference semantic apply path (segfix.py `shift` + np.round):
    bilinear grid-sample of the (encoded) id map, rounded to the nearest
    integer id.  Matches the reference including its quirk of
    interpolating across numeric id values at boundaries."""
    out = grid_sample_shift(label[None].astype(np.float64), offset, scale)
    return np.round(out[0]).astype(np.int64)


def load_offset(path: str) -> tuple[np.ndarray | None, np.ndarray | None]:
    """Load an offset file -> (offset [H, W, 2] or None, dir_label or None).

    ``.npz``: our Tester's test_offset output (``offset`` or ``dir_label``
    + optional ``mask``).  ``.mat``: the reference's released offset files
    (key ``mat``, [H, W, 2] (dy, dx) — scripts/cityscapes/segfix.py
    get_offset)."""
    if path.endswith(".mat"):
        import scipy.io as sio

        return sio.loadmat(path)["mat"].astype(np.float64), None
    data = np.load(path)
    if "offset" in data:
        return data["offset"].astype(np.float64), None
    dir_label = data["dir_label"].astype(np.int64)
    if "mask" in data:
        dir_label = np.where(data["mask"] > 0, dir_label, -1)
    return None, dir_label


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
    ap.add_argument("--dataset", choices=["trainid", "cityscapes", "ade20k"],
                    default="trainid",
                    help="label encoding of the input PNGs: 'trainid' "
                         "(our Tester output, contiguous ids) or raw "
                         "submission ids ('cityscapes' labelIds / 'ade20k' "
                         "1-based) as consumed by the reference apply "
                         "scripts, which encode -> shift -> decode")
    ap.add_argument("--interp", choices=["nearest", "bilinear"],
                    default="nearest",
                    help="bilinear: the reference scripts' grid_sample + "
                         "round path (needed for exact submission parity "
                         "with float .mat offsets); nearest: integer "
                         "gather (identical for integer offsets)")
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
        off_path = None
        for ext in (".npz", ".mat"):
            p = os.path.join(args.offset_dir, stem + ext)
            if os.path.exists(p):
                off_path = p
                break
        label = np.asarray(
            Image.open(os.path.join(args.input_dir, name)).convert("P")
        ).astype(np.int64)
        if args.dataset != "trainid":
            label = encode_raw_labels(label, args.dataset)
        if off_path is None:
            out = label
        else:
            offset, dir_label = load_offset(off_path)
            if offset is None:
                offset = label_to_vector(dir_label, cfg).astype(np.float64)
            if args.interp == "bilinear":
                out = shift_labels_bilinear(label, offset, args.scale)
            else:
                out = apply_offsets(label, offset.astype(np.int64),
                                    int(args.scale))
        if args.dataset != "trainid":
            out = decode_raw_labels(out, args.dataset)
        Image.fromarray(out.astype(np.uint8)).save(
            os.path.join(args.out_dir, name)
        )
        n += 1
    print(f"refined {n} label maps -> {args.out_dir}")


if __name__ == "__main__":
    main()
