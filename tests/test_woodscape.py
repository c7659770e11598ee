"""WoodScape rectification vs the reference's vendored Valeo projection.

Golden check: build the reference Camera stack from the actual FV.json
calibration shipped in the reference tree, reproduce make_rect_cam
(calibrate_to_rect.py:20-37 — the script itself executes hard-coded
/raid paths at import, so its 15-line function is re-stated here as the
oracle), generate the projection map with the reference's per-column
loop, and demand our vectorized rectification_maps agree sub-pixel.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
sys.path.insert(0, "/root/reference/lib/datasets/preprocess/woodscape")

from contrastiveseg_tpu.data.woodscape import (  # noqa: E402
    WoodscapeCamera,
    rectification_maps,
    remap,
)

CALIB = "/root/reference/lib/datasets/preprocess/woodscape/FV.json"


def _reference_maps(sub: int = 16):
    """Reference u/v maps (pre-cv2.convertMaps), subsampled columns."""
    pytest.importorskip("cv2")
    pytest.importorskip("scipy")
    from scipy.spatial.transform import Rotation as SciRot

    import projection as ref  # the vendored Valeo module

    cam = ref.read_cam_from_json(CALIB)

    # make_rect_cam, calibrate_to_rect.py:20-37.
    lens = ref.PinholeLens(cam.lens.coefficients[0])
    rot_zxz = SciRot.from_matrix(cam.rotation).as_euler("zxz")
    rot_zxz = np.round(rot_zxz / (np.pi / 2)) * (np.pi / 2)
    rot_zxz[1] = np.pi / 2
    rect = ref.Camera(
        rotation=SciRot.from_euler(angles=rot_zxz, seq="zxz").as_matrix(),
        translation=cam.translation,
        lens=lens,
        size=cam.size,
        principle_point=(cam.cx_offset, cam.cy_offset),
        aspect_ratio=cam.aspect_ratio,
    )

    h, w = rect.height, rect.width
    rows = np.arange(h)
    u_map = np.zeros((h, w // sub), np.float64)
    v_map = np.zeros((h, w // sub), np.float64)
    for i, u_px in enumerate(range(0, w - (w % sub), sub)):
        dest = np.vstack((np.ones(h) * u_px, rows)).T
        src = cam.project_3d_to_2d(
            rect.project_2d_to_3d(dest, norm=np.array([1])))
        u_map[:, i] = src.T[0]
        v_map[:, i] = src.T[1]
    return u_map, v_map, sub


def test_rectification_maps_match_reference():
    ref_u, ref_v, sub = _reference_maps()
    cam = WoodscapeCamera.from_json(CALIB)
    mx, my = rectification_maps(cam)
    ours_u = mx[:, ::sub][:, : ref_u.shape[1]]
    ours_v = my[:, ::sub][:, : ref_v.shape[1]]
    # NaN (behind-camera) positions must coincide; valid ones sub-pixel.
    ref_nan = ~np.isfinite(ref_u)
    assert (ref_nan == ~np.isfinite(ours_u)).mean() > 0.999
    ok = ~ref_nan & np.isfinite(ours_u)
    assert ok.mean() > 0.5  # most of the frame maps somewhere real
    np.testing.assert_allclose(ours_u[ok], ref_u[ok], atol=1e-2)
    np.testing.assert_allclose(ours_v[ok], ref_v[ok], atol=1e-2)


def test_remap_roundtrip_and_labels():
    pytest.importorskip("scipy")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 48, 3)).astype(np.float32)
    ident_x, ident_y = np.meshgrid(np.arange(48, dtype=np.float32),
                                   np.arange(32, dtype=np.float32))
    np.testing.assert_allclose(remap(img, ident_x, ident_y), img, atol=1e-5)
    lab = rng.integers(0, 12, (32, 48)).astype(np.int32)
    out = remap(lab, ident_x + 0.4, ident_y, order=0)
    assert out.dtype == lab.dtype
    assert set(np.unique(out)) <= set(np.unique(lab)) | {0}


def test_prepare_woodscape_fixture(tmp_path):
    """End-to-end converter on a tiny fixture using the reference's
    bundled FV calibration (full-size maps, small interior crop checked)."""
    import os

    from PIL import Image

    sys.path.insert(0, "tools")
    import prepare_datasets as prep

    root = tmp_path / "ws"
    (root / "train" / "image").mkdir(parents=True)
    (root / "train" / "label").mkdir(parents=True)
    rng = np.random.default_rng(0)
    # Full sensor size from FV.json: 1280x966.
    img = rng.integers(0, 255, (966, 1280, 3)).astype(np.uint8)
    lab = rng.integers(0, 10, (966, 1280)).astype(np.uint8)
    Image.fromarray(img).save(root / "train" / "image" / "0001_FV.png")
    Image.fromarray(lab).save(root / "train" / "label" / "0001_FV.png")
    out = tmp_path / "ws_out"
    counts = prep.prepare_woodscape(str(root), str(out), link=False)
    assert counts["train"] == 1
    rect = np.asarray(Image.open(out / "train" / "image" / "0001_FV.png"))
    rlab = np.asarray(Image.open(out / "train" / "label" / "0001_FV.png"))
    assert rect.shape == img.shape and rlab.shape == lab.shape
    assert rect.any() and set(np.unique(rlab)) <= set(range(10))


def _reference_cyl_maps(sub: int = 64, row_sub: int = 8):
    """Reference cylindrical->fisheye u/v maps
    (cylindrical_to_fisheye.py: create_img_projection_maps(cyl, fisheye)),
    subsampled — the fisheye 2d->3d side calls np.roots per pixel."""
    pytest.importorskip("cv2")
    pytest.importorskip("scipy")
    from scipy.spatial.transform import Rotation as SciRot

    import projection as ref

    cam = ref.read_cam_from_json(CALIB)
    # make_cylindrical_cam (cylindrical_to_fisheye.py:18-35).
    lens = ref.CylindricalProjection(cam.lens.coefficients[0])
    rot_zxz = SciRot.from_matrix(cam.rotation).as_euler("zxz")
    rot_zxz = np.round(rot_zxz / (np.pi / 2)) * (np.pi / 2)
    rot_zxz[1] = np.pi / 2
    cyl = ref.Camera(
        rotation=SciRot.from_euler(angles=rot_zxz, seq="zxz").as_matrix(),
        translation=cam.translation,
        lens=lens,
        size=cam.size,
        principle_point=(cam.cx_offset, cam.cy_offset),
        aspect_ratio=cam.aspect_ratio,
    )
    h, w = cam.height, cam.width
    rows = np.arange(0, h - (h % row_sub), row_sub)
    u_map = np.zeros((len(rows), w // sub), np.float64)
    v_map = np.zeros((len(rows), w // sub), np.float64)
    for i, u_px in enumerate(range(0, w - (w % sub), sub)):
        dest = np.vstack((np.ones(len(rows)) * u_px, rows)).T
        src = cyl.project_3d_to_2d(
            cam.project_2d_to_3d(dest, norm=np.array([1])))
        u_map[:, i] = src.T[0]
        v_map[:, i] = src.T[1]
    return u_map, v_map, sub, row_sub


def test_cylindrical_to_fisheye_maps_match_reference():
    from contrastiveseg_tpu.data.woodscape import cylindrical_to_fisheye_maps

    ref_u, ref_v, sub, row_sub = _reference_cyl_maps()
    cam = WoodscapeCamera.from_json(CALIB)
    mx, my = cylindrical_to_fisheye_maps(cam)
    ours_u = mx[::row_sub, ::sub][: ref_u.shape[0], : ref_u.shape[1]]
    ours_v = my[::row_sub, ::sub][: ref_v.shape[0], : ref_v.shape[1]]
    ok = np.isfinite(ref_u)
    assert ok.all()  # every fisheye pixel has a cylindrical source
    np.testing.assert_allclose(ours_u[ok], ref_u[ok], atol=2e-2)
    np.testing.assert_allclose(ours_v[ok], ref_v[ok], atol=2e-2)
