"""Segmentation heads (flax/NHWC)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from contrastiveseg_tpu.models.layers import ConvBN, TorchBatchNorm
from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners


class ClsHead(nn.Module):
    """3x3 conv -> BNReLU -> dropout(0.1) -> 1x1 conv (no bias) -> logits.

    Reference: HRNet_W48 cls_head (lib/models/nets/hrnet.py:37-42).
    """

    num_classes: int
    mid_channels: int
    dropout: float = 0.10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = ConvBN(self.mid_channels, 3, 1, use_relu=True, dtype=self.dtype,
                   name="conv")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train, name="drop")(x)
        # Final classifier kept in fp32: tiny FLOPs, full-precision logits.
        x = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                    dtype=jnp.float32, name="cls")(x.astype(jnp.float32))
        return x


class ProjectionHead(nn.Module):
    """convmlp projection (1x1 -> BNReLU -> 1x1) + L2 normalize over channels.

    Reference: lib/models/modules/projection.py:8-24.
    """

    proj_dim: int = 256
    proj: str = "convmlp"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        dim_in = x.shape[-1]
        if self.proj == "linear":
            x = nn.Conv(self.proj_dim, (1, 1), dtype=self.dtype, name="proj")(x)
        else:
            x = nn.Conv(dim_in, (1, 1), dtype=self.dtype, name="fc1")(x)
            x = TorchBatchNorm(dtype=self.dtype, name="norm")(x, train)
            x = nn.relu(x)
            x = nn.Conv(self.proj_dim, (1, 1), dtype=self.dtype, name="fc2")(x)
        x = x.astype(jnp.float32)
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
        )


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (DeepLab-V3).

    Reference: DeepLabHead / ASPPModule (lib/models/nets/deeplab.py,
    lib/models/modules/decoder_block.py:39-85): image pooling + 1x1 +
    three dilated 3x3 convs (rates 12/24/36 at output stride 8), concat,
    project to 256.
    """

    out_channels: int = 512
    rates: tuple[int, ...] = (12, 24, 36)
    project_kernel: int = 3  # ASPPModule.project is a 3x3 (decoder_block.py:70-74)
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        h, w = x.shape[1], x.shape[2]
        branches = [
            ConvBN(self.out_channels, 1, use_relu=True, dtype=self.dtype,
                   name="b0")(x, train),
        ]
        for i, r in enumerate(self.rates):
            branches.append(
                ConvBN(self.out_channels, 3, 1, dilation=r, use_relu=True,
                       dtype=self.dtype, name=f"b{i + 1}")(x, train)
            )
        # Image-level pooling branch, upsampled back (b4, decoder_block.py:
        # 64-68,83-84); a 1x1 average is shape-invariant so broadcast == the
        # reference's align-corners upsample of a 1x1 map.
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvBN(self.out_channels, 1, use_relu=True, dtype=self.dtype,
                        name="img_pool")(pooled, train)
        branches.append(jnp.broadcast_to(
            pooled, (x.shape[0], h, w, self.out_channels)))
        x = jnp.concatenate(branches, axis=-1)
        x = ConvBN(self.out_channels, self.project_kernel, use_relu=True,
                   dtype=self.dtype, name="project")(x, train)
        if self.dropout:
            x = nn.Dropout(self.dropout, deterministic=not train,
                           name="drop")(x)
        return x


def upsample_logits(logits: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear align_corners upsample of NHWC logits to `size`."""
    return resize_bilinear_align_corners(logits, size)
