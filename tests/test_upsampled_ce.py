"""Streamed upsample+CE == materialized upsample+CE (value and grad)."""

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveseg_tpu.losses.ce import cross_entropy, upsampled_cross_entropy
from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners

W19 = tuple(0.8 + 0.02 * i for i in range(5))


def test_value_and_grad_match():
    rng = np.random.default_rng(0)
    B, h, w, C = 2, 8, 12, 5
    H, W = 31, 45  # non-multiple sizes
    seg = jnp.asarray(rng.standard_normal((B, h, w, C), dtype=np.float32))
    labels = rng.integers(0, C, size=(B, H, W)).astype(np.int32)
    labels[rng.random((B, H, W)) < 0.2] = -1
    labels = jnp.asarray(labels)

    def dense(s):
        return cross_entropy(
            resize_bilinear_align_corners(s, (H, W)), labels, W19
        )

    def streamed(s):
        return upsampled_cross_entropy(s, labels, W19, row_block=7)

    vd, gd = jax.value_and_grad(dense)(seg)
    vs, gs = jax.value_and_grad(streamed)(seg)
    assert abs(float(vd) - float(vs)) < 1e-5, (vd, vs)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gs),
                               atol=1e-5, rtol=1e-4)
