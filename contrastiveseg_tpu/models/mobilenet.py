"""MobileNet backbones (v1/v2) for segmentation, flax/NHWC.

Re-design of the reference wrappers (lib/models/backbones/mobilenet/,
~500 LoC): inverted-residual stacks with optional output-stride dilation
(same `_nostride_dilate` rule as the ResNets).  Returns the last two
feature maps (aux + main) like the dilated ResNet contract.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from contrastiveseg_tpu.models.layers import ConvBN


class InvertedResidual(nn.Module):
    """MobileNetV2 block: 1x1 expand -> 3x3 depthwise -> 1x1 project."""

    features: int
    strides: int = 1
    expand: int = 6
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        h = x
        if self.expand != 1:
            h = ConvBN(mid, 1, use_relu=True, dtype=self.dtype,
                       name="expand")(h, train)
        # Depthwise 3x3.
        pad = self.dilation
        h = nn.Conv(
            mid, (3, 3), strides=(self.strides, self.strides),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=mid, use_bias=False, dtype=self.dtype,
            name="dw",
        )(h)
        from contrastiveseg_tpu.models.layers import TorchBatchNorm

        h = TorchBatchNorm(dtype=self.dtype, name="dw_norm")(h, train)
        h = nn.relu6(h) if hasattr(nn, "relu6") else jnp.clip(h, 0, 6)
        h = ConvBN(self.features, 1, use_relu=False, dtype=self.dtype,
                   name="project")(h, train)
        if self.strides == 1 and in_ch == self.features:
            h = h + x
        return h


# (t expand, c channels, n blocks, s stride) — MobileNetV2 paper table 2.
_V2_CFG = [
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


@dataclasses.dataclass(frozen=True)
class MobileNetSpec:
    dilate_scale: int | None = None  # None | 8 | 16


class MobileNetV2(nn.Module):
    """Returns [c_aux (96ch stage), c_main (320ch)] features."""

    spec: MobileNetSpec = MobileNetSpec()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> list[jnp.ndarray]:
        x = ConvBN(32, 3, 2, use_relu=True, dtype=self.dtype,
                   name="stem")(x, train)
        feats = []
        current_stride, dilation = 2, 1
        idx = 0
        for t, c, n, s in _V2_CFG:
            for b in range(n):
                stride = s if b == 0 else 1
                if (
                    self.spec.dilate_scale
                    and stride == 2
                    and current_stride >= self.spec.dilate_scale
                ):
                    dilation *= 2
                    stride = 1
                elif stride == 2:
                    current_stride *= 2
                x = InvertedResidual(
                    c, strides=stride, expand=t, dilation=dilation,
                    dtype=self.dtype, name=f"block{idx}",
                )(x, train)
                idx += 1
            if c in (96, 320):
                feats.append(x)
        return feats
