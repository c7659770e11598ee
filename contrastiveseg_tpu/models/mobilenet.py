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


class MobileNetV1(nn.Module):
    """MobileNetV1: plain depthwise-separable stack (reference
    lib/models/backbones/mobilenet/ v1 wrapper).  Returns [c_aux (512ch),
    c_main (1024ch)], with optional output-stride dilation."""

    spec: MobileNetSpec = MobileNetSpec()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> list[jnp.ndarray]:
        from contrastiveseg_tpu.models.layers import TorchBatchNorm

        # (channels, stride) per separable block — MobileNetV1 paper table 1.
        cfg = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
               *[(512, 1)] * 5, (1024, 2), (1024, 1)]
        x = ConvBN(32, 3, 2, use_relu=True, dtype=self.dtype,
                   name="stem")(x, train)
        feats = []
        current_stride, dilation = 2, 1
        for i, (c, s) in enumerate(cfg):
            stride = s
            if (self.spec.dilate_scale and stride == 2
                    and current_stride >= self.spec.dilate_scale):
                dilation *= 2
                stride = 1
            elif stride == 2:
                current_stride *= 2
            pad = dilation
            h = nn.Conv(x.shape[-1], (3, 3), strides=(stride, stride),
                        padding=[(pad, pad), (pad, pad)],
                        kernel_dilation=(dilation, dilation),
                        feature_group_count=x.shape[-1], use_bias=False,
                        dtype=self.dtype, name=f"dw{i}")(x)
            h = TorchBatchNorm(dtype=self.dtype, name=f"dw{i}_norm")(h, train)
            h = nn.relu(h)
            x = ConvBN(c, 1, use_relu=True, dtype=self.dtype,
                       name=f"pw{i}")(h, train)
            if i in (10, 12):  # last 512 block, last 1024 block
                feats.append(x)
        return feats


def _hard_swish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _hard_sigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class _SqueezeExcite(nn.Module):
    reduce: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.relu(nn.Dense(max(c // self.reduce, 8), dtype=self.dtype,
                             name="fc1")(s))
        s = _hard_sigmoid(nn.Dense(c, dtype=self.dtype, name="fc2")(s))
        return x * s[:, None, None, :]


class _V3Block(nn.Module):
    """MobileNetV3 inverted residual: expand -> dw(k) [-> SE] -> project."""

    features: int
    mid: int
    kernel: int = 3
    strides: int = 1
    use_se: bool = False
    use_hs: bool = False
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        from contrastiveseg_tpu.models.layers import TorchBatchNorm

        act = _hard_swish if self.use_hs else nn.relu
        in_ch = x.shape[-1]
        h = x
        if self.mid != in_ch:
            h = ConvBN(self.mid, 1, use_relu=False, dtype=self.dtype,
                       name="expand")(h, train)
            h = act(h)
        pad = self.dilation * (self.kernel - 1) // 2
        h = nn.Conv(self.mid, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.mid, use_bias=False,
                    dtype=self.dtype, name="dw")(h)
        h = TorchBatchNorm(dtype=self.dtype, name="dw_norm")(h, train)
        h = act(h)
        if self.use_se:
            h = _SqueezeExcite(dtype=self.dtype, name="se")(h)
        h = ConvBN(self.features, 1, use_relu=False, dtype=self.dtype,
                   name="project")(h, train)
        if self.strides == 1 and in_ch == self.features:
            h = h + x
        return h


# MobileNetV3-Large (paper table 1): (k, mid, out, SE, HS, s).
_V3_LARGE = [
    (3, 16, 16, False, False, 1), (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1), (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1), (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2), (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1), (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1), (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2), (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
]


class MobileNetV3(nn.Module):
    """MobileNetV3-Large; returns [c_aux (112ch stage), c_main (960ch)]."""

    spec: MobileNetSpec = MobileNetSpec()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> list[jnp.ndarray]:
        x = ConvBN(16, 3, 2, use_relu=False, dtype=self.dtype,
                   name="stem")(x, train)
        x = _hard_swish(x)
        feats = []
        current_stride, dilation = 2, 1
        for i, (k, mid, c, se, hs, s) in enumerate(_V3_LARGE):
            stride = s
            if (self.spec.dilate_scale and stride == 2
                    and current_stride >= self.spec.dilate_scale):
                dilation *= 2
                stride = 1
            elif stride == 2:
                current_stride *= 2
            x = _V3Block(c, mid, kernel=k, strides=stride, use_se=se,
                         use_hs=hs, dilation=dilation, dtype=self.dtype,
                         name=f"block{i}")(x, train)
            if i == 11:  # last 112-ch block
                feats.append(x)
        x = ConvBN(960, 1, use_relu=False, dtype=self.dtype,
                   name="head")(x, train)
        feats.append(_hard_swish(x))
        return feats
