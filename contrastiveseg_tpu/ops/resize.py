"""TPU-native image resizes with exact PyTorch interpolation semantics.

The reference leans on ``F.interpolate(..., mode='bilinear',
align_corners=True)`` (e.g. lib/models/nets/hrnet.py:48-56, upsampling HRNet
branch features and logits) and ``mode='nearest'`` for label downscaling
(lib/loss/loss_helper.py:208-212, lib/loss/loss_contrast.py:131-134).
``jax.image.resize`` implements neither convention (it is half-pixel,
anti-aliased), so we build both from first principles.

TPU-first design: bilinear resize is *separable*, so instead of gathers (slow
on TPU) we materialize two static interpolation matrices ``A_h [H_out, H_in]``
and ``A_w [W_out, W_in]`` (each row has <=2 non-zeros) and contract

    out[b, i, j, c] = sum_{p,q} A_h[i, p] * x[b, p, q, c] * A_w[j, q]

as two dense matmuls that run on the MXU.  The matrices are compile-time
constants (shapes are static under jit), so XLA folds and fuses them.
Nearest-neighbor resize uses the same trick with one-hot selection matrices —
a matmul with a permutation-like matrix beats a gather on TPU for the sizes
involved here.

Layouts are NHWC throughout (TPU conv convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _align_corners_matrix(out_size: int, in_size: int) -> np.ndarray:
    """Row-stochastic [out, in] matrix for align_corners=True linear interp."""
    A = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 or in_size == 1:
        A[:, 0] = 1.0
        return A
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    A[np.arange(out_size), lo] += 1.0 - frac
    A[np.arange(out_size), hi] += frac
    return A


@functools.lru_cache(maxsize=128)
def _nearest_matrix(out_size: int, in_size: int) -> np.ndarray:
    """[out, in] one-hot matrix with PyTorch 'nearest' semantics.

    torch.nn.functional.interpolate(mode='nearest') picks
    ``src = floor(dst * in_size / out_size)``.
    """
    A = np.zeros((out_size, in_size), dtype=np.float32)
    src = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
    src = np.clip(src.astype(np.int64), 0, in_size - 1)
    A[np.arange(out_size), src] = 1.0
    return A


def _separable_resize(
    x: jnp.ndarray, a_h: np.ndarray, a_w: np.ndarray, precision
) -> jnp.ndarray:
    """Apply [H_out,H_in] and [W_out,W_in] matrices to an NHWC tensor."""
    # Contract H then W, accumulating in fp32 either way.
    # HIGHEST: exact fp32 operands — needed where parity matters (eval /
    # loss logit upsampling); on TPU it costs ~6 bf16 MXU passes.
    # DEFAULT: operands truncate to bf16, single MXU pass — used on the
    # backbone fuse paths, where HRNet has ~30 of these per forward and
    # exactness is irrelevant to training.
    orig_dtype = x.dtype
    a_dtype = jnp.bfloat16 if precision == jax.lax.Precision.DEFAULT else jnp.float32
    out = jnp.einsum(
        "op,bpqc->boqc", jnp.asarray(a_h, a_dtype), x,
        preferred_element_type=jnp.float32, precision=precision,
    )
    out = jnp.einsum(
        "oq,biqc->bioc", jnp.asarray(a_w, a_dtype), out.astype(a_dtype),
        preferred_element_type=jnp.float32, precision=precision,
    )
    return out.astype(orig_dtype)


def resize_bilinear_align_corners(
    x: jnp.ndarray, size: tuple[int, int], fast: bool = False
) -> jnp.ndarray:
    """Bilinear align_corners=True resize of an NHWC (or NHW) tensor.

    Matches ``F.interpolate(x, size, mode='bilinear', align_corners=True)``
    up to float associativity (exactly with fast=False; to bf16 operand
    rounding with fast=True — use on hot backbone paths only).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    h_out, w_out = size
    _, h_in, w_in, _ = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x[..., 0] if squeeze else x
    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    out = _separable_resize(
        x, _align_corners_matrix(h_out, h_in),
        _align_corners_matrix(w_out, w_in), precision,
    )
    return out[..., 0] if squeeze else out


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize (torch semantics) of an NHWC float tensor via matmuls."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    h_out, w_out = size
    _, h_in, w_in, _ = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x[..., 0] if squeeze else x
    out = _separable_resize(
        x, _nearest_matrix(h_out, h_in), _nearest_matrix(w_out, w_in),
        jax.lax.Precision.HIGHEST,
    )
    return out[..., 0] if squeeze else out


def scale_target_nearest(labels: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Downscale integer label maps [B, H, W] with torch 'nearest' semantics.

    Mirrors the reference's ``FSCELoss._scale_target``
    (lib/loss/loss_helper.py:208-212): float cast -> nearest interp -> long.
    Uses index gather via static take (exact; labels may be negative, so
    the matmul trick is avoided to keep integer dtype).
    """
    b, h_in, w_in = labels.shape
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return labels
    rows = np.clip(
        np.floor(np.arange(h_out) * h_in / h_out).astype(np.int32), 0, h_in - 1
    )
    cols = np.clip(
        np.floor(np.arange(w_out) * w_in / w_out).astype(np.int32), 0, w_in - 1
    )
    return labels[:, rows][:, :, cols]


def subsample_stride(labels: jnp.ndarray, stride: int) -> jnp.ndarray:
    """``labels[:, ::stride, ::stride]`` (reference trainer_contrastive.py:108)."""
    return labels[:, ::stride, ::stride]


@functools.lru_cache(maxsize=128)
def _half_pixel_matrix(out_size: int, in_size: int) -> np.ndarray:
    """Row-stochastic [out, in] matrix for torch ``align_corners=False``
    linear interp: ``src = max(0, (dst + 0.5) * in/out - 0.5)`` with the
    high tap clamped to the last pixel (ATen
    area_pixel_compute_source_index semantics)."""
    A = np.zeros((out_size, in_size), dtype=np.float32)
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.maximum(src, 0.0)
    lo = np.minimum(np.floor(src).astype(np.int64), in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    A[np.arange(out_size), lo] += 1.0 - frac
    A[np.arange(out_size), hi] += frac
    return A


def resize_bilinear_half_pixel(
    x: jnp.ndarray, size: tuple[int, int], fast: bool = False
) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers == torch
    ``align_corners=False`` (the MscaleOCR fusion path, ms_ocrnet.py
    Upsample/interpolate calls, and the SETR decoders' nn.Upsample).
    Same separable-matrix MXU design as the align_corners path (no
    gathers); exact torch semantics with fast=False."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    h_out, w_out = size
    _, h_in, w_in, _ = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x[..., 0] if squeeze else x
    precision = jax.lax.Precision.DEFAULT if fast else jax.lax.Precision.HIGHEST
    out = _separable_resize(
        x, _half_pixel_matrix(h_out, h_in),
        _half_pixel_matrix(w_out, w_in), precision,
    )
    return out[..., 0] if squeeze else out
