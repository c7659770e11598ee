"""Reference-submission SegFix apply path: raw-id encode/decode, .mat
offsets, and the bilinear grid_sample+round label shift.

Reference counterparts: scripts/cityscapes/segfix.py (cityscapes labelIds
LabelTransformer, .mat offsets, torch shift) and
scripts/cityscapes/segfix_ade20k.py (1-based ade20k ids).
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), os.pardir, "tools")
)

from segfix import (  # noqa: E402
    RAW_ID_LISTS,
    decode_raw_labels,
    encode_raw_labels,
    load_offset,
    shift_labels_bilinear,
)


def _reference_label_shift(label: np.ndarray, offset: np.ndarray,
                           scale: float) -> np.ndarray:
    """scripts/cityscapes/segfix.py `shift` re-typed: grid_sample bilinear
    (border padding, default align_corners=False) on the float id map,
    then np.round."""
    import torch
    import torch.nn.functional as F

    h, w = label.shape
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
    x = torch.from_numpy(label).float()[None, None]
    out = F.grid_sample(
        x, grid.unsqueeze(0), padding_mode="border", mode="bilinear"
    ).squeeze().numpy()
    return np.round(out).astype(np.int64)


def test_encode_decode_roundtrip():
    for dataset, ids in RAW_ID_LISTS.items():
        extras = [i for i in (0, 255, 4, 200) if i not in ids][:3]
        raw = np.array(ids + extras, np.uint8).reshape(-1, 1)
        enc = encode_raw_labels(raw, dataset)
        # listed ids map to contiguous train ids, unlisted to 255
        assert enc[: len(ids), 0].tolist() == list(range(len(ids)))
        assert (enc[len(ids):, 0] == 255).all()
        dec = decode_raw_labels(enc, dataset)
        assert dec[: len(ids), 0].tolist() == ids
        assert (dec[len(ids):, 0] == 255).all()


def test_bilinear_shift_matches_torch_grid_sample():
    pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    h, w = 19, 29
    label = rng.integers(0, 19, (h, w)).astype(np.int64)
    offset = rng.uniform(-2.0, 2.0, (h, w, 2))
    ours = shift_labels_bilinear(label, offset, scale=2.0)
    ref = _reference_label_shift(label, offset, scale=2.0)
    # Excluding exact .5 rounding ties (float32 vs float64 land on
    # different sides), every pixel must match.
    sampled = ours.astype(np.float64)
    ref_f = ref.astype(np.float64)
    ties = np.abs(ours - ref) == 1
    mismatch = (ours != ref) & ~ties
    assert not mismatch.any()
    assert ties.mean() < 0.02  # ties are rare
    assert (sampled != ref_f).mean() < 0.02


def test_mat_offset_loading(tmp_path):
    import scipy.io as sio

    off = np.stack(
        [np.full((5, 7), 1.5), np.full((5, 7), -0.5)], -1
    )
    sio.savemat(tmp_path / "x.mat", {"mat": off})
    loaded, dir_label = load_offset(str(tmp_path / "x.mat"))
    assert dir_label is None
    np.testing.assert_allclose(loaded, off)


def test_cli_raw_cityscapes_submission(tmp_path):
    """End-to-end: raw-labelId PNG + .mat offsets -> refined raw PNG."""
    pytest.importorskip("scipy")
    in_dir = tmp_path / "in"
    off_dir = tmp_path / "off"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    off_dir.mkdir()

    # Two vertical halves: road (7) | building (11); shift everything
    # one pixel right -> the boundary column moves left by one.
    h, w = 16, 16
    raw = np.full((h, w), 7, np.uint8)
    raw[:, 8:] = 11
    Image.fromarray(raw).save(in_dir / "frankfurt_000000_000294.png")
    import scipy.io as sio

    off = np.zeros((h, w, 2))
    off[..., 1] = 1.0  # dx = +1 (sample from the right)
    sio.savemat(off_dir / "frankfurt_000000_000294.mat", {"mat": off})

    repo = os.path.join(os.path.dirname(__file__), os.pardir)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "segfix.py"),
         "--input_dir", str(in_dir), "--offset_dir", str(off_dir),
         "--out_dir", str(out_dir), "--scale", "1",
         "--dataset", "cityscapes", "--interp", "bilinear"],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr
    out = np.asarray(Image.open(out_dir / "frankfurt_000000_000294.png"))
    # Still raw ids, boundary moved from column 8 to column 7.
    assert set(np.unique(out)) == {7, 11}
    assert (out[:, 7:] == 11).all()
    assert (out[:, :7] == 7).all()
