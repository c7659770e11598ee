"""Instance-boundary SegFix: GT generation + instance-mask refinement.

Reference counterparts:
  * lib/datasets/preprocess/cityscapes/cityscapes_instance_generator.py
    (instance map layout -> tools/prepare_cityscapes.py --instance)
  * lib/datasets/preprocess/cityscapes/instance_dt_offset_generator.py
    (instance-boundary DT offsets -> DTOffsetDataset boundary_source)
  * scripts/cityscapes/segfix_instance.py (mask shift -> tools/segfix.py
    --mode instance), oracle-tested against the reference's exact
    grid_sample formulation.
"""

import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), os.pardir, "tools")
)

from contrastiveseg_tpu.data.loaders_extra import DTOffsetDataset  # noqa: E402
from segfix import refine_instances, shift_instance_masks  # noqa: E402


def _reference_shift(masks: np.ndarray, offset: np.ndarray,
                     scale: float) -> np.ndarray:
    """The reference's torch shift (segfix_instance.py:28-60), re-typed:
    grid = (coord + offset*scale) / ((len-1)/2) - 1, grid_sample bilinear
    with border padding and default align_corners=False, threshold 0.5."""
    import torch
    import torch.nn.functional as F

    c, h, w = masks.shape
    coord_h, coord_w = torch.meshgrid(
        torch.arange(h, dtype=torch.float),
        torch.arange(w, dtype=torch.float),
        indexing="ij",
    )
    off = torch.from_numpy(offset).float().permute(2, 0, 1) * scale
    grid_h = off[0] + coord_h
    grid_w = off[1] + coord_w
    norm = torch.tensor([(w - 1) / 2.0, (h - 1) / 2.0])
    grid = torch.stack([grid_w, grid_h], dim=-1) / norm - 1
    x = torch.from_numpy(masks).unsqueeze(0).float()
    out = F.grid_sample(
        x, grid.unsqueeze(0), padding_mode="border", mode="bilinear"
    )
    return (out.squeeze(0).numpy() > 0.5).astype(np.uint8)


def test_shift_matches_reference_grid_sample():
    torch = pytest.importorskip("torch")  # noqa: F841
    from scipy import ndimage

    rng = np.random.default_rng(0)
    h, w = 17, 23
    masks = (rng.random((3, h, w)) > 0.6).astype(np.uint8)
    offset = rng.integers(-3, 4, size=(h, w, 2)).astype(np.float32)
    for scale in (1.0, 2.0):
        ours = shift_instance_masks(masks, offset, scale)
        ref = _reference_shift(masks, offset, scale)
        # Exclude exact-0.5 bilinear ties (e.g. 0.6875 * 8/11): there the
        # > 0.5 threshold is decided by fp32-vs-fp64 rounding, not math.
        yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                             np.arange(w, dtype=np.float64), indexing="ij")
        sy = (yy + offset[..., 0] * scale) * h / (h - 1) - 0.5
        sx = (xx + offset[..., 1] * scale) * w / (w - 1) - 0.5
        vals = np.stack([
            ndimage.map_coordinates(m.astype(np.float64),
                                    np.stack([sy, sx]), order=1,
                                    mode="nearest")
            for m in masks
        ])
        decided = np.abs(vals - 0.5) > 1e-9
        assert decided.mean() > 0.95
        assert (ours == ref)[decided].all(), (
            f"scale={scale}: {np.sum((ours != ref) & decided)} mismatches"
        )


def _write_seg_tree(root, label, instance=None, split="val"):
    h, w = label.shape
    for sub in ("image", "label") + (("instance",) if instance is not None else ()):
        os.makedirs(os.path.join(root, split, sub), exist_ok=True)
    img = np.zeros((h, w, 3), np.uint8)
    Image.fromarray(img).save(os.path.join(root, split, "image", "a.png"))
    Image.fromarray(label.astype(np.uint8)).save(
        os.path.join(root, split, "label", "a.png")
    )
    if instance is not None:
        Image.fromarray(instance.astype(np.uint8)).save(
            os.path.join(root, split, "instance", "a.png")
        )


def test_instance_boundary_supervises_touching_instances(tmp_path):
    # One semantic class filling the image, split into two instances at
    # column w//2: semantic mode sees no boundary, instance mode must
    # supervise one (instance_dt_offset_generator.py's whole point).
    h, w = 24, 32
    label = np.full((h, w), 1, np.uint8)
    instance = np.full((h, w), 26000, np.int32)
    instance[:, w // 2:] = 26001
    # PNG fixture is uint8; use small distinct ids instead.
    instance = (instance - 26000 + 10).astype(np.uint8)
    _write_seg_tree(tmp_path, label, instance)

    sem = DTOffsetDataset(str(tmp_path), split="val")[0]
    inst = DTOffsetDataset(
        str(tmp_path), split="val", boundary_source="instance"
    )[0]
    mid = slice(w // 2 - 1, w // 2 + 1)
    assert (sem["mask_label"][:, mid] == 0).all()
    assert (inst["mask_label"][:, mid] == 1).all()
    # Direction labels near the internal boundary are supervised (not -1).
    assert (inst["dir_label"][:, mid] >= 0).all()
    # Away from every boundary both agree (image border excluded).
    assert (inst["mask_label"][h // 2, 2] == sem["mask_label"][h // 2, 2])


def test_instance_boundary_falls_back_without_instance_map(tmp_path):
    label = np.zeros((8, 8), np.uint8)
    label[:, 4:] = 1
    _write_seg_tree(tmp_path, label, instance=None)
    ds = DTOffsetDataset(str(tmp_path), split="val",
                         boundary_source="instance")
    sample = ds[0]
    assert (sample["mask_label"][:, 3:5] == 1).all()


def test_refine_instances_roundtrip(tmp_path):
    # A 1-px-wide sliver of mask next to the true boundary moves onto it.
    in_dir = tmp_path / "pred"
    off_dir = tmp_path / "offset"
    out_dir = tmp_path / "out"
    for d in (in_dir, off_dir, out_dir):
        os.makedirs(d)
    h, w = 16, 16
    mask = np.zeros((h, w), np.uint8)
    mask[4:12, 4:8] = 255
    Image.fromarray(mask).save(in_dir / "frame_mask0.png")
    (in_dir / "frame_pred.txt").write_text("frame_mask0.png 26 0.9\n")
    offset = np.zeros((h, w, 2), np.float32)
    offset[:, :, 1] = 1.0  # shift everything +1 in x
    np.savez(off_dir / "frame.npz", offset=offset)

    n = refine_instances(str(in_dir), str(off_dir), str(out_dir), scale=1.0)
    assert n == 1
    assert (out_dir / "frame_pred.txt").exists()
    out = np.asarray(Image.open(out_dir / "frame_mask0.png"))
    assert set(np.unique(out)) <= {0, 255}
    ref = _reference_shift(
        (mask[None] > 0).astype(np.uint8), offset, 1.0
    )[0]
    assert ((out > 0).astype(np.uint8) == ref).all()


def test_prepare_cityscapes_instance_layout(tmp_path):
    raw = tmp_path / "raw"
    out = tmp_path / "out"
    city = "lindau"
    stem = "lindau_000000_000019"
    (raw / "leftImg8bit" / "val" / city).mkdir(parents=True)
    (raw / "gtFine" / "val" / city).mkdir(parents=True)
    img = np.zeros((8, 8, 3), np.uint8)
    Image.fromarray(img).save(
        raw / "leftImg8bit" / "val" / city / f"{stem}_leftImg8bit.png"
    )
    lab = np.full((8, 8), 7, np.uint8)
    Image.fromarray(lab).save(
        raw / "gtFine" / "val" / city / f"{stem}_gtFine_labelIds.png"
    )
    Image.fromarray(lab).save(
        raw / "gtFine" / "val" / city / f"{stem}_gtFine_instanceIds.png"
    )

    from prepare_cityscapes import prepare

    counts = prepare(str(raw), str(out), link=False, instance=True)
    assert counts["val"] == 1
    assert (out / "val" / "image" / f"{stem}.png").exists()
    assert (out / "val" / "label" / f"{stem}.png").exists()
    assert (out / "val" / "instance" / f"{stem}.png").exists()
