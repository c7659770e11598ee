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
    x: jnp.ndarray, kernel_size: int, stride: int = 1, dilation: int = 1
) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H', W', k*k, C] (SAME padding, zeros outside)."""
    k = kernel_size
    pad = dilation * (k - 1) // 2
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
) -> jnp.ndarray:
    """Gaussian adaptive kernel (packernel2d, pac.py:361-452).

    Returns [B, H', W', k*k] (or [..., k*k, Cf] if channel_wise).
    ``smooth_kernel`` optionally replaces the center feature with a local
    smoothing (smooth_kernel_type='gaussian' path).
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
    d2 = (patches - center[:, :, :, None, :]) ** 2
    if not channel_wise:
        d2 = jnp.sum(d2, axis=-1)  # [B, H', W', K]
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


class PacConv2d(nn.Module):
    """Learned PAC layer (pac.py PacConv2d:690-739): guidance features
    drive the adaptive kernel, the weight is an ordinary conv filter."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    normalize_kernel: bool = False
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, guide: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        weight = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), self.dtype)
        kernel = packernel2d(
            guide, k, stride=self.stride, dilation=self.dilation,
            normalize_kernel=self.normalize_kernel)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), self.dtype)
                if self.use_bias else None)
        return pacconv2d(x, kernel, weight, bias,
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
