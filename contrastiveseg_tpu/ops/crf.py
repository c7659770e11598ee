"""Mean-field DenseCRF post-processing (test-time refinement).

The reference's `crf_ss_test` calls the external pydensecrf package
(/root/reference/segmentor/tester.py:164-167,535-575 — DenseCRF2D with a
Gaussian pairwise kernel sxy=1/compat=3 and a bilateral kernel
sxy=10/srgb=3/compat=4, 10 mean-field iterations).  pydensecrf is not
available here, so this module implements the same fully-connected
mean-field update from first principles, twice:

  * ``dense_crf_oracle`` — the EXACT O(N^2) update.  Pairwise kernels are
    the true Gaussians over (position/sxy [, rgb/srgb]) feature vectors
    (the pydensecrf feature convention), self-excluded and row-normalized.
    Ground truth for tests; fine up to ~64x64.
  * ``mean_field_crf`` — the production approximation: the spatial kernel
    as exact truncated separable convolutions, the bilateral kernel via a
    SPARSE 5-D BILATERAL GRID (splat -> separable Gaussian blur over
    occupied cells -> slice) — the classic grid approximation of the
    permutohedral lattice, O(N) per iteration.

Both share one update rule, so their gap is purely kernel approximation,
quantified in tests/test_crf_oracle.py (label-flip rate vs the oracle).

Update rule (shared): ``m_k(c) = (K_k q)(c) / K_k 1`` per kernel k (the
row-normalized average of neighbor beliefs, self excluded), then
``q ∝ exp(-unary + Σ_k compat_k · m_k)``.  Row normalization makes the
Potts penalty ``compat·(1 - m(c))`` equal to ``-compat·m(c)`` up to a
softmax constant; documented divergence from pydensecrf, which uses
symmetric kernel normalization (NORMALIZE_SYMMETRIC).
"""

from __future__ import annotations

import numpy as np

_BLUR_RADIUS = 2  # grid-units; kernel exp(-d^2/2), d in [-2, 2]


# ---------------------------------------------------------------------------
# Exact O(N^2) oracle.
# ---------------------------------------------------------------------------
def dense_crf_oracle(
    probs: np.ndarray,  # [H, W, C] softmax probabilities
    image: np.ndarray | None = None,  # [H, W, 3] uint8
    iters: int = 10,
    sxy_gaussian: float = 1.0,
    compat_gaussian: float = 3.0,
    sxy_bilateral: float = 10.0,
    srgb: float = 3.0,
    compat_bilateral: float = 4.0,
) -> np.ndarray:
    """Exact fully-connected mean field; ground truth for the approximation."""
    H, W, C = probs.shape
    N = H * W
    yx = np.stack(np.mgrid[0:H, 0:W], axis=-1).reshape(N, 2).astype(np.float64)

    def kernel(feats):
        d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
        k = np.exp(-0.5 * d2)
        np.fill_diagonal(k, 0.0)  # self-excluded
        return k

    kernels = [(compat_gaussian, kernel(yx / sxy_gaussian))]
    if image is not None:
        fb = np.concatenate(
            [yx / sxy_bilateral,
             image.reshape(N, 3).astype(np.float64) / srgb], axis=1)
        kernels.append((compat_bilateral, kernel(fb)))

    unary = -np.log(np.clip(probs.reshape(N, C), 1e-8, 1.0))
    q = probs.reshape(N, C).astype(np.float64)
    norms = [k.sum(axis=1, keepdims=True) for _, k in kernels]
    for _ in range(iters):
        logits = -unary
        for (w, k), nrm in zip(kernels, norms):
            logits = logits + w * (k @ q) / np.maximum(nrm, 1e-12)
        logits -= logits.max(axis=-1, keepdims=True)
        q = np.exp(logits)
        q /= q.sum(axis=-1, keepdims=True)
    return q.reshape(H, W, C).astype(np.float32)


# ---------------------------------------------------------------------------
# Fast path: exact separable spatial kernel + sparse bilateral grid.
# ---------------------------------------------------------------------------
def _spatial_message(q: np.ndarray, sigma: float) -> np.ndarray:
    """Row-normalized self-excluded Gaussian message, exact (truncated at
    4 sigma, zero-padded so border pixels see their true neighbor count)."""
    from scipy import ndimage

    radius = max(int(np.ceil(4 * sigma)), 1)
    x = np.arange(-radius, radius + 1)
    k1 = np.exp(-0.5 * (x / sigma) ** 2)  # unnormalized, center weight 1

    def conv(a):
        return ndimage.convolve1d(
            ndimage.convolve1d(a, k1, axis=0, mode="constant"),
            k1, axis=1, mode="constant")

    num = np.stack([conv(q[..., c]) for c in range(q.shape[-1])], -1) - q
    den = conv(np.ones(q.shape[:2])) - 1.0
    return num / np.maximum(den[..., None], 1e-12)


class _BilateralGrid:
    """Sparse 5-D bilateral grid filter for fixed features.

    Features f = (y/sxy, x/sxy, r/srgb, g/srgb, b/srgb) are quantized to
    their nearest integer cell; values are splatted per cell, blurred with
    a separable Gaussian exp(-d^2/2) over each grid axis (occupied cells
    only, neighbor lookup by code search), and sliced back at each pixel's
    cell.  Approximates ``x -> K x`` for the true bilateral kernel."""

    def __init__(self, image: np.ndarray, sxy: float, srgb: float):
        H, W, _ = image.shape
        yx = np.stack(np.mgrid[0:H, 0:W], -1).reshape(-1, 2)
        feats = np.concatenate(
            [yx / sxy, image.reshape(-1, 3).astype(np.float64) / srgb], 1)
        cells = np.rint(feats).astype(np.int64)
        cells -= cells.min(axis=0)
        self.dims = cells.max(axis=0) + 1
        strides = np.concatenate(
            [np.cumprod(self.dims[::-1])[::-1][1:], [1]])
        codes = (cells * strides).sum(axis=1)
        self.strides = strides
        self.codes_sorted, self.pixel_cell = np.unique(
            codes, return_inverse=True)
        self.cell_coord = cells[np.unique(codes, return_index=True)[1]]
        self.n_cells = len(self.codes_sorted)
        self.n_pixels = len(codes)
        # Precompute neighbor index tables per (axis, offset).
        self.neighbors = []
        w = np.exp(-0.5 * np.arange(-_BLUR_RADIUS, _BLUR_RADIUS + 1) ** 2)
        self.blur_w = w
        for ax in range(5):
            tabs = []
            for d in range(-_BLUR_RADIUS, _BLUR_RADIUS + 1):
                if d == 0:
                    tabs.append(None)  # identity
                    continue
                coord_d = self.cell_coord[:, ax] + d
                valid = (coord_d >= 0) & (coord_d < self.dims[ax])
                ncodes = self.codes_sorted + d * strides[ax]
                pos = np.searchsorted(self.codes_sorted, ncodes)
                pos = np.clip(pos, 0, self.n_cells - 1)
                hit = valid & (self.codes_sorted[pos] == ncodes)
                tabs.append((pos, hit))
            self.neighbors.append(tabs)

    def filter(self, values: np.ndarray) -> np.ndarray:
        """values: [H*W, C] -> K_grid @ values (self INCLUDED)."""
        v = np.zeros((self.n_cells, values.shape[1]))
        np.add.at(v, self.pixel_cell, values)
        for ax in range(5):
            out = np.zeros_like(v)
            for w, tab in zip(self.blur_w, self.neighbors[ax]):
                if tab is None:
                    out += w * v
                else:
                    pos, hit = tab
                    out += w * np.where(hit[:, None], v[pos], 0.0)
            v = out
        return v[self.pixel_cell]


def mean_field_crf(
    probs: np.ndarray,  # [H, W, C] softmax probabilities
    image: np.ndarray | None = None,  # [H, W, 3] uint8 (bilateral term)
    iters: int = 10,
    sxy_gaussian: float = 1.0,
    compat_gaussian: float = 3.0,
    sxy_bilateral: float = 10.0,
    srgb: float = 3.0,
    compat_bilateral: float = 4.0,
) -> np.ndarray:
    """DenseCRF mean field, O(N)/iter; same update rule as the oracle.

    Spatial messages are exact (separable truncated Gaussian); bilateral
    messages ride the sparse bilateral grid (gap vs the exact kernel is
    quantization only, measured in tests/test_crf_oracle.py)."""
    H, W, C = probs.shape
    unary = -np.log(np.clip(probs, 1e-8, 1.0))
    q = probs.astype(np.float64)

    grid = None
    ones = None
    if image is not None:
        grid = _BilateralGrid(image, sxy_bilateral, srgb)
        ones = grid.filter(np.ones((H * W, 1)))  # K 1 (self included)

    for _ in range(iters):
        logits = -unary + compat_gaussian * _spatial_message(q, sxy_gaussian)
        if grid is not None:
            flat = q.reshape(-1, C)
            num = grid.filter(flat) - flat  # self-excluded
            den = np.maximum(ones - 1.0, 1e-12)
            logits = logits + compat_bilateral * (num / den).reshape(H, W, C)
        logits -= logits.max(axis=-1, keepdims=True)
        q = np.exp(logits)
        q /= q.sum(axis=-1, keepdims=True)
    return q.astype(np.float32)
