"""Mean-field CRF post-processing (test-time refinement).

The reference's `crf_ss_test` calls the external pydensecrf package
(segmentor/tester.py:164-167, 535-575 — DenseCRF2D with Gaussian +
bilateral pairwise kernels).  pydensecrf is not available here; this
module implements mean-field inference with a truncated-Gaussian spatial
kernel and a Potts compatibility in pure numpy/scipy — the same update
rule, with the bilateral (appearance) kernel approximated by masking the
spatial kernel with an image-similarity weight.  Quality is close for the
small iteration counts the reference uses (iter_max=5-20, tester.py
comments); gate behind `test.use_crf`.
"""

from __future__ import annotations

import numpy as np


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def mean_field_crf(
    probs: np.ndarray,  # [H, W, C] softmax probabilities
    image: np.ndarray | None = None,  # [H, W, 3] uint8 (bilateral term)
    iters: int = 5,
    sxy_gaussian: float = 3.0,
    compat_gaussian: float = 3.0,
    sxy_bilateral: float = 10.0,
    srgb: float = 13.0,
    compat_bilateral: float = 10.0,
) -> np.ndarray:
    from scipy import ndimage

    unary = -np.log(np.clip(probs, 1e-8, 1.0))
    q = probs.astype(np.float64)
    r_g = max(int(2 * sxy_gaussian), 1)
    k_g = _gaussian_kernel1d(sxy_gaussian, r_g)

    if image is not None:
        img = image.astype(np.float64)
        # Local appearance similarity as a separable proxy for the
        # bilateral kernel: downweight smoothing across strong edges.
        gy = np.abs(np.diff(img, axis=0, prepend=img[:1])).sum(-1)
        gx = np.abs(np.diff(img, axis=1, prepend=img[:, :1])).sum(-1)
        edge = np.exp(-((gx + gy) / (2 * srgb)) ** 2)[..., None]
    else:
        edge = None

    for _ in range(iters):
        msg = np.stack(
            [
                ndimage.convolve1d(
                    ndimage.convolve1d(q[..., c], k_g, axis=0, mode="nearest"),
                    k_g, axis=1, mode="nearest",
                )
                for c in range(q.shape[-1])
            ],
            axis=-1,
        ) - q  # exclude self
        pairwise = compat_gaussian * msg
        if edge is not None:
            pairwise = pairwise + compat_bilateral * msg * edge
        logits = -unary - (
            pairwise.sum(axis=-1, keepdims=True) - pairwise
        )  # Potts: penalty from other labels' mass
        logits -= logits.max(axis=-1, keepdims=True)
        q = np.exp(logits)
        q /= q.sum(axis=-1, keepdims=True)
    return q.astype(np.float32)
