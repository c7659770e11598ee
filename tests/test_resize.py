"""Resize ops vs torch F.interpolate (the reference's semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from contrastiveseg_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_nearest,
    scale_target_nearest,
)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((16, 32), (64, 128)), ((17, 13), (33, 40)), ((64, 128), (16, 32)), ((8, 8), (8, 8))],
)
def test_bilinear_align_corners_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 5), dtype=np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out_hw))
    ref = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_hw,
            mode="bilinear",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=5e-5)


@pytest.mark.parametrize(
    "in_hw,out_hw", [((16, 32), (7, 9)), ((9, 7), (16, 32)), ((64, 64), (16, 16))]
)
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    ref = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="nearest"
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_scale_target_nearest_matches_torch():
    rng = np.random.default_rng(2)
    lab = rng.integers(-1, 19, size=(2, 33, 47)).astype(np.int32)
    out_hw = (9, 13)
    ours = np.asarray(scale_target_nearest(jnp.asarray(lab), out_hw))
    ref = (
        F.interpolate(
            torch.from_numpy(lab).unsqueeze(1).float(), size=out_hw, mode="nearest"
        )
        .squeeze(1)
        .long()
        .numpy()
    )
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((4, 8), (64, 128)), ((16, 32), (7, 9)), ((9, 7), (16, 32)),
     ((5, 5), (20, 20))],
)
def test_half_pixel_matches_torch(in_hw, out_hw):
    """resize_bilinear_half_pixel == F.interpolate(align_corners=False)
    (ATen area_pixel_compute_source_index semantics), both up and down,
    via the separable-matrix MXU path."""
    from contrastiveseg_tpu.ops.resize import resize_bilinear_half_pixel

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(resize_bilinear_half_pixel(jnp.asarray(x), out_hw))
    ref = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
            mode="bilinear", align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)
