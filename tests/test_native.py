"""Native C kernels vs torch/numpy references."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from contrastiveseg_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_bicubic_matches_torch(lib):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(37, 53, 3)).astype(np.uint8)
    for size_wh in [(100, 80), (20, 15), (53, 37)]:
        ours = native.resize_bicubic_u8(img, size_wh)
        ref = F.interpolate(
            torch.from_numpy(img).permute(2, 0, 1)[None].float(),
            size=(size_wh[1], size_wh[0]), mode="bicubic",
            align_corners=False, antialias=False,
        )[0].permute(1, 2, 0)
        ref = ref.round().clamp(0, 255).byte().numpy()
        diff = np.abs(ours.astype(int) - ref.astype(int))
        # Same kernel; allow 1 LSB for float rounding order.
        assert diff.max() <= 1, (size_wh, diff.max())
        assert (diff > 0).mean() < 0.02


def test_nearest_matches_numpy(lib):
    rng = np.random.default_rng(1)
    lab = rng.integers(-1, 19, size=(33, 47)).astype(np.int32)
    for size_wh in [(13, 9), (100, 70)]:
        ours = native.resize_nearest_i32(lab, size_wh)
        w, h = size_wh
        rows = np.floor(np.arange(h) * 33 / h).astype(int)
        cols = np.floor(np.arange(w) * 47 / w).astype(int)
        np.testing.assert_array_equal(ours, lab[rows][:, cols])


def test_normalize_pad(lib):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(10, 12, 3)).astype(np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    out = native.normalize_pad_f32(img, (16, 20), (3, 4), 255.0, mean, std)
    expect = (img.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(out[3:13, 4:16], expect, atol=1e-5)
    assert np.all(out[:3] == 0) and np.all(out[:, :4] == 0)


def test_confusion_matches_jax(lib):
    rng = np.random.default_rng(3)
    pred = rng.integers(0, 19, size=(2, 64, 64)).astype(np.int32)
    gt = rng.integers(-1, 19, size=(2, 64, 64)).astype(np.int32)
    ours = native.confusion_matrix_i64(pred, gt, 19)
    from contrastiveseg_tpu.ops.confusion import confusion_matrix

    ref = np.asarray(confusion_matrix(pred, gt, 19))
    np.testing.assert_array_equal(ours, ref)
