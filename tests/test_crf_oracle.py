"""DenseCRF approximation vs the exact O(N^2) oracle — VERDICT r3 #7.

``dense_crf_oracle`` implements the exact fully-connected mean-field
update with TRUE Gaussian + bilateral kernels (the reference's pydensecrf
semantics, /root/reference/segmentor/tester.py:535-575, modulo its
permutohedral-lattice approximation).  These tests turn the old "quality
is close" docstring claim into numbers:

  * spatial-only: the production path is EXACT (separable truncated
    convolution == dense kernel) to 1e-5;
  * full bilateral: the sparse-bilateral-grid path agrees with the oracle
    to <=5% label flips on an adversarial fixture (iid-noise logits with
    31% raw error — far noisier than any real model output), and both
    recover the ground truth far better than the raw argmax.
"""

from __future__ import annotations

import numpy as np
import pytest

from contrastiveseg_tpu.ops.crf import dense_crf_oracle, mean_field_crf


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(7)
    H = W = 32
    C = 4
    coarse = rng.integers(0, C, size=(4, 4))
    gt = np.kron(coarse, np.ones((8, 8), int))
    colors = np.array(
        [[200, 50, 50], [50, 200, 50], [50, 50, 200], [200, 200, 50]])
    img = np.clip(
        colors[gt] + rng.normal(0, 8, (H, W, 3)), 0, 255).astype(np.uint8)
    logits = 2.0 * np.eye(C)[gt] + rng.normal(0, 1.4, (H, W, C))
    probs = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)).astype(
        np.float32)
    return gt, img, probs


def test_spatial_only_matches_oracle_exactly(fixture):
    gt, img, probs = fixture
    oracle = dense_crf_oracle(probs, None, iters=10, sxy_gaussian=1.0)
    approx = mean_field_crf(probs, None, iters=10, sxy_gaussian=1.0)
    np.testing.assert_allclose(approx, oracle, atol=1e-5)
    assert (oracle.argmax(-1) != approx.argmax(-1)).mean() == 0.0


def test_bilateral_grid_vs_oracle_measured(fixture):
    gt, img, probs = fixture
    raw_err = (probs.argmax(-1) != gt).mean()
    assert raw_err > 0.25  # the fixture is genuinely hard

    oracle = dense_crf_oracle(probs, img, iters=10)
    approx = mean_field_crf(probs, img, iters=10)

    flip = (oracle.argmax(-1) != approx.argmax(-1)).mean()
    # Measured: 3.7% label flips vs the exact kernel on this fixture
    # (grid nearest-cell quantization); bound with headroom.
    assert flip <= 0.05, f"approximation flip rate {flip:.4f}"

    # Both refine: the oracle fully recovers GT here; the approximation
    # must close >=85% of the raw error (measured: 31.2% -> 3.7%).
    oracle_err = (oracle.argmax(-1) != gt).mean()
    approx_err = (approx.argmax(-1) != gt).mean()
    assert oracle_err == 0.0
    assert approx_err <= 0.15 * raw_err, (approx_err, raw_err)

    # Proper probability fields.
    np.testing.assert_allclose(approx.sum(-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(oracle.sum(-1), 1.0, atol=1e-4)
