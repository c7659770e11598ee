"""Deformable convolution v1/v2, TPU-native.

The reference ships ~2150 lines of CUDA (lib/extensions/dcn/src/: im2col
with learned offsets + modulation masks, fwd+bwd).  On TPU the same op is
a bilinear gather (differentiable by construction) followed by a dense
matmul: build the deformed im2col patches with `map_coordinates`-style
interpolation expressed as four weighted static gathers, then contract
with the kernel on the MXU.  Autodiff supplies all three gradients
(input, offset, weight) that the CUDA code hand-writes.

Kept opt-in like the reference (its DCN resnets are commented out,
resnet_backbone.py:241-259).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(x: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """x: [H, W, C]; ys/xs: [...] float coords -> [..., C] samples (zeros
    outside, matching the CUDA kernel's border behavior)."""
    H, W, C = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    def tap(yi, xi):
        inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        v = x[yc, xc]
        return jnp.where(inside[..., None], v, 0.0)

    return (
        tap(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
        + tap(y0, x0 + 1) * ((1 - wy) * wx)[..., None]
        + tap(y0 + 1, x0) * (wy * (1 - wx))[..., None]
        + tap(y0 + 1, x0 + 1) * (wy * wx)[..., None]
    )


def deform_conv2d(
    x: jnp.ndarray,  # [B, H, W, Cin]
    offsets: jnp.ndarray,  # [B, H, W, 2*kh*kw]  (dy, dx) per tap
    weight: jnp.ndarray,  # [kh, kw, Cin, Cout]
    mask: jnp.ndarray | None = None,  # [B, H, W, kh*kw] modulation (v2)
    stride: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Deformable conv (DCNv1; pass `mask` for v2 modulation).

    `dilation` spaces the base sampling grid (zero offsets == a standard
    dilated conv), so DCN can drop into dilated-8 resnet stages.
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    oh, ow = H // stride, W // stride

    base_y = jnp.arange(oh) * stride
    base_x = jnp.arange(ow) * stride
    ky = (jnp.arange(kh) - (kh - 1) / 2.0) * dilation
    kx = (jnp.arange(kw) - (kw - 1) / 2.0) * dilation
    # grid coords [oh, ow, kh, kw]
    gy = base_y[:, None, None, None] + ky[None, None, :, None]
    gx = base_x[None, :, None, None] + kx[None, None, None, :]

    off = offsets[:, ::stride, ::stride].reshape(B, oh, ow, kh, kw, 2)

    def per_image(xi, oi, mi):
        ys = gy + oi[..., 0]
        xs = gx + oi[..., 1]
        patches = _bilinear_gather(xi, ys, xs)  # [oh, ow, kh, kw, Cin]
        if mi is not None:
            patches = patches * mi[..., None]
        return jnp.einsum(
            "hwklc,klco->hwo", patches, weight,
            preferred_element_type=jnp.float32,
        )

    if mask is not None:
        m = mask[:, ::stride, ::stride].reshape(B, oh, ow, kh, kw)
    else:
        m = None
    out = jax.vmap(per_image)(
        x, off, m if m is not None else jnp.ones((B, oh, ow, kh, kw), x.dtype)
    )
    return out.astype(x.dtype)
