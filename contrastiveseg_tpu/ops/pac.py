"""Pixel-adaptive convolution (PAC), TPU-native.

Re-design of the reference's pure-python PacNet
(/root/reference/lib/extensions/pacnet/pac.py:361-478 packernel2d/pacconv2d,
paccrf.py PacCRF): the adaptive Gaussian kernel
``K_ij = exp(-0.5 * ||f_i - f_j||^2)`` over a k x k window modulates a
learned convolution.  The torch version routes through unfold/im2col
Functions with hand-written backwards; here patch extraction is a static
unrolled stack of shifted slices (XLA fuses them; autodiff supplies all
gradients), and the contraction is one einsum on the MXU.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def extract_patches(
    x: jnp.ndarray, kernel_size: int, stride: int = 1, dilation: int = 1,
    padding: Optional[int] = None,
) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H', W', k*k, C].

    ``padding=None`` -> SAME-style ``d*(k-1)//2``; an int pads that much on
    every side (0 = VALID, used by the transposed path)."""
    k = kernel_size
    pad = dilation * (k - 1) // 2 if padding is None else padding
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    oh = (H + 2 * pad - dilation * (k - 1) - 1) // stride + 1
    ow = (W + 2 * pad - dilation * (k - 1) - 1) // stride + 1
    taps = []
    for dy in range(k):
        for dx in range(k):
            y0, x0 = dy * dilation, dx * dilation
            taps.append(xp[:, y0:y0 + (oh - 1) * stride + 1:stride,
                           x0:x0 + (ow - 1) * stride + 1:stride, :])
    return jnp.stack(taps, axis=3)


def packernel2d(
    guide: jnp.ndarray,  # [B, H, W, Cf] guidance features
    kernel_size: int,
    stride: int = 1,
    dilation: int = 1,
    channel_wise: bool = False,
    normalize_kernel: bool = False,
    smooth_kernel: Optional[jnp.ndarray] = None,  # [ks, ks] center filter
    kernel_type: str = "gaussian",
    inv_alpha: Optional[jnp.ndarray] = None,
    inv_lambda: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Adaptive kernel (packernel2d, pac.py:361-452).

    Returns [B, H', W', k*k] (or [..., k*k, Cf] if channel_wise).
      * ``smooth_kernel`` replaces the center feature with a local
        smoothing (smooth_kernel_type gaussian/average_*/full_* paths);
      * ``kernel_type``: 'gaussian' -> exp(-0.5 d2); 'inv_*' ->
        inv_alpha + (d2 + 1e-4)^(0.5*inv_lambda) (pac.py:426-433); a
        '_asym' suffix ReLUs the difference before squaring (:420-421).
    """
    patches = extract_patches(guide, kernel_size, stride, dilation)
    if smooth_kernel is None:
        center = patches[:, :, :, kernel_size * kernel_size // 2, :]
    else:
        ks = smooth_kernel.shape[0]
        w = jnp.tile(smooth_kernel[:, :, None, None].astype(guide.dtype),
                     (1, 1, 1, 1))
        # Depthwise smoothing of the guide at output resolution.
        center = jax.lax.conv_general_dilated(
            guide, jnp.tile(w, (1, 1, 1, guide.shape[-1])),
            window_strides=(stride, stride),
            padding=[(ks // 2, ks // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=guide.shape[-1],
        )
    diff = patches - center[:, :, :, None, :]
    if "_asym" in kernel_type:
        diff = jax.nn.relu(diff)
    d2 = diff ** 2
    if not channel_wise:
        d2 = jnp.sum(d2, axis=-1)  # [B, H', W', K]
    if kernel_type.startswith("inv_"):
        assert inv_alpha is not None and inv_lambda is not None
        kernel = inv_alpha + (d2 + 1e-4) ** (0.5 * inv_lambda)
    else:
        kernel = jnp.exp(-0.5 * d2)
    if normalize_kernel:
        kernel = kernel / jnp.maximum(
            jnp.sum(kernel, axis=3, keepdims=True), 1e-12)
    return kernel


def pacconv2d(
    x: jnp.ndarray,  # [B, H, W, Cin]
    kernel: jnp.ndarray,  # [B, H', W', k*k] adaptive kernel
    weight: jnp.ndarray,  # [kh, kw, Cin, Cout]
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    dilation: int = 1,
    shared_filters: bool = False,
) -> jnp.ndarray:
    """pacconv2d (pac.py:455-477): kernel-modulated convolution."""
    kh, kw = weight.shape[0], weight.shape[1]
    patches = extract_patches(x, kh, stride, dilation)  # [B,H',W',K,Cin]
    mod = patches * kernel[..., None]
    if shared_filters:
        # One k x k spatial filter shared by all channels (pac.py:467-468):
        # weight [kh, kw], output channels == input channels.
        out = jnp.einsum(
            "bhwkc,k->bhwc", mod, weight.reshape(kh * kw),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    else:
        out = jnp.einsum(
            "bhwkc,kco->bhwo", mod,
            weight.reshape(kh * kw, weight.shape[2], weight.shape[3]),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def pacpool2d(
    x: jnp.ndarray, kernel: jnp.ndarray, kernel_size: int,
    stride: int = 1, dilation: int = 1,
) -> jnp.ndarray:
    """Kernel-weighted pooling (pacpool2d, pac.py:503-523)."""
    patches = extract_patches(x, kernel_size, stride, dilation)
    return jnp.einsum(
        "bhwkc,bhwk->bhwc", patches, kernel,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def pacconv_transpose2d(
    x: jnp.ndarray,  # [B, H, W, Cin]
    kernel: jnp.ndarray,  # [B, Ho, Wo, k*k] adaptive kernel at OUTPUT res
    weight: jnp.ndarray,  # [kh, kw, Cin, Cout]
    bias: Optional[jnp.ndarray] = None,
    stride: int = 2,
    padding: Optional[int] = None,
    output_padding: int = 0,
    dilation: int = 1,
    shared_filters: bool = False,
) -> jnp.ndarray:
    """Transposed PAC conv (pacconv_transpose2d, pac.py:481-500).

    Mirrors the reference's native path: zero-stuff the input by
    ``stride``, pad by ``(k-1)*d - padding`` (+``output_padding`` on the
    bottom/right), then run a VALID pacconv at stride 1.  Output size =
    (H-1)*s - 2*padding + (k-1)*d + output_padding + 1, the torch
    ConvTranspose2d contract.  ``padding=None`` defaults to the SAME-ish
    ``d*(k-1)//2``.
    """
    B, H, W, C = x.shape
    k = weight.shape[0]
    if padding is None:
        padding = dilation * (k - 1) // 2
    up = jnp.zeros(
        (B, (H - 1) * stride + 1, (W - 1) * stride + 1, C), x.dtype
    ).at[:, ::stride, ::stride].set(x)
    p = (k - 1) * dilation - padding
    assert p >= 0, "padding too large for the transposed PAC conv"
    up = jnp.pad(up, ((0, 0), (p, p + output_padding),
                      (p, p + output_padding), (0, 0)))
    kh, kw = weight.shape[0], weight.shape[1]
    patches = extract_patches(up, kh, 1, dilation, padding=0)
    mod = patches * kernel[..., None]
    if shared_filters:
        out = jnp.einsum(
            "bhwkc,k->bhwc", mod, weight.reshape(kh * kw),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    else:
        out = jnp.einsum(
            "bhwkc,kco->bhwo", mod,
            weight.reshape(kh * kw, weight.shape[2], weight.shape[3]),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def make_smooth_kernel(smooth_kernel_type: str) -> Optional[jnp.ndarray]:
    """Fixed smoothing kernels (reference _PacConvNd, pac.py:593-608):
    'gaussian' = outer([.25,.5,.25]); 'average_k' = uniform k x k;
    'none' -> None.  ('full_k' is a learned parameter — built by the
    module classes, not here.)"""
    if smooth_kernel_type == "none":
        return None
    if smooth_kernel_type == "gaussian":
        s = jnp.asarray([0.25, 0.5, 0.25])
        return jnp.outer(s, s)
    if smooth_kernel_type.startswith("average_"):
        ks = int(smooth_kernel_type.split("_")[-1])
        return jnp.full((ks, ks), 1.0 / (ks * ks))
    raise ValueError(f"smooth_kernel_type {smooth_kernel_type!r}")


class _PacKernelOpts(nn.Module):
    """Shared kernel-option handling for the PAC module classes
    (reference _PacConvNd, pac.py:526-690): kernel_type
    'gaussian'/'inv_<alpha>_<lambda>[_asym][_fixed]' and
    smooth_kernel_type 'none'/'gaussian'/'average_k'/'full_k'."""

    kernel_type: str = "gaussian"
    smooth_kernel_type: str = "none"
    normalize_kernel: bool = False
    dtype: Any = jnp.float32

    def _inv_params(self):
        if not self.kernel_type.startswith("inv_"):
            return None, None
        parts = self.kernel_type.split("_")
        a0, l0 = float(parts[1]), float(parts[2])
        if "_fixed" in self.kernel_type:
            return jnp.asarray(a0), jnp.asarray(l0)
        inv_alpha = self.param("inv_alpha",
                               lambda k: jnp.asarray(a0, jnp.float32))
        inv_lambda = self.param("inv_lambda",
                                lambda k: jnp.asarray(l0, jnp.float32))
        return inv_alpha, inv_lambda

    def _smooth_kernel(self):
        if self.smooth_kernel_type.startswith("full_"):
            ks = int(self.smooth_kernel_type.split("_")[-1])
            return self.param(
                "smooth_kernel",
                lambda k: jnp.full((ks, ks), 1.0 / (ks * ks), jnp.float32))
        return make_smooth_kernel(self.smooth_kernel_type)

    def _adaptive_kernel(self, guide, k, stride, dilation):
        inv_alpha, inv_lambda = self._inv_params()
        return packernel2d(
            guide, k, stride=stride, dilation=dilation,
            normalize_kernel=self.normalize_kernel,
            smooth_kernel=self._smooth_kernel(),
            kernel_type=self.kernel_type,
            inv_alpha=inv_alpha, inv_lambda=inv_lambda)


class PacConv2d(_PacKernelOpts):
    """Learned PAC layer (pac.py PacConv2d:690-739): guidance features
    drive the adaptive kernel, the weight is an ordinary conv filter."""

    features: int = 0
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, guide: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        weight = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), self.dtype)
        kernel = self._adaptive_kernel(guide, k, self.stride, self.dilation)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), self.dtype)
                if self.use_bias else None)
        return pacconv2d(x, kernel, weight, bias,
                         stride=self.stride, dilation=self.dilation)


class PacConvTranspose2d(_PacKernelOpts):
    """Transposed PAC layer (pac.py PacConvTranspose2d:740-789) — learned
    guided upsampling.  ``guide`` lives at the OUTPUT resolution (the
    reference computes the kernel with transposed=True for the same
    effect, pac.py:375-377)."""

    features: int = 0
    kernel_size: int = 3
    stride: int = 2
    output_padding: int = 0
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, guide: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        weight = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), self.dtype)
        kernel = self._adaptive_kernel(guide, k, 1, self.dilation)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), self.dtype)
                if self.use_bias else None)
        return pacconv_transpose2d(
            x, kernel, weight, bias, stride=self.stride,
            output_padding=self.output_padding, dilation=self.dilation)


class PacPool2d(_PacKernelOpts):
    """Guided pooling (pac.py PacPool2d:791-844): the adaptive kernel IS
    the pooling weight; no learned filter."""

    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, guide: jnp.ndarray) -> jnp.ndarray:
        kernel = self._adaptive_kernel(
            guide, self.kernel_size, self.stride, self.dilation)
        return pacpool2d(x, kernel, self.kernel_size,
                         stride=self.stride, dilation=self.dilation)


class PacCRF(nn.Module):
    """Mean-field CRF with PAC message passing (reference paccrf.py).

    Each of ``num_steps`` iterations pools the current beliefs with the
    guidance-adaptive kernel (one per dilation) and applies a learned
    class-compatibility transform; beliefs re-normalize by softmax.
    """

    num_classes: int
    num_steps: int = 5
    kernel_size: int = 5
    dilations: tuple[int, ...] = (1,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, unary: jnp.ndarray, guide: jnp.ndarray) -> jnp.ndarray:
        # unary: [B, H, W, C] logits; guide: [B, H, W, Cf].
        kernels = [
            packernel2d(guide, self.kernel_size, dilation=d,
                        normalize_kernel=True)
            for d in self.dilations
        ]
        compat = self.param(
            "compat", nn.initializers.zeros,
            (len(self.dilations), self.num_classes, self.num_classes),
            jnp.float32)
        q = jax.nn.softmax(unary, axis=-1)
        for _ in range(self.num_steps):
            msg = jnp.zeros_like(unary)
            for i, (kern, d) in enumerate(zip(kernels, self.dilations)):
                pooled = pacpool2d(q, kern, self.kernel_size, dilation=d)
                msg = msg + jnp.einsum("bhwc,cd->bhwd", pooled, compat[i])
            q = jax.nn.softmax(unary - msg, axis=-1)
        return q
