"""ResNet backbones incl. dilated-8/16 variants (flax/NHWC).

Re-design of the reference ResNet family (resnet_models.py:107-180,
resnet_backbone.py:21-118).  Semantics kept:

  * ``deep_base`` 3-conv stem (3x3 s2 64 -> 3x3 64 -> 3x3 128) + maxpool,
    matching ``deepbase_resnet101_dilated8`` used by DeepLab-V3
    (resnet_models.py:112-131);
  * dilated variants rewrite layer3/4 strides to dilations via the
    ``_nostride_dilate`` rule (resnet_backbone.py:58-98): a formerly
    stride-2 3x3 conv gets dilation d/2, other 3x3 convs get dilation d,
    with layer4 per-block multi_grid scaling;
  * forward returns the per-stage feature tuple (stem, pool, c1..c4) like
    ``DilatedResnetBackbone.forward`` (resnet_backbone.py:100-118).

Divergence (documented): maxpool uses floor (even) output sizes instead of
the reference's ceil_mode=True — keeps all downstream shapes powers-of-two
friendly for TPU tiling; the final align-corners upsample to label size
absorbs the one-pixel difference.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from contrastiveseg_tpu.models.layers import Bottleneck, ConvBN


@dataclasses.dataclass(frozen=True)
class ResNetSpec:
    layers: tuple[int, ...]  # blocks per stage (Bottleneck)
    deep_base: bool = True
    dilate_scale: int | None = None  # None | 8 | 16
    multi_grid: tuple[int, ...] | None = (1, 1, 1)


RESNET_SPECS: dict[str, ResNetSpec] = {
    "resnet50": ResNetSpec((3, 4, 6, 3), deep_base=False),
    "resnet50_dilated8": ResNetSpec((3, 4, 6, 3), deep_base=False, dilate_scale=8),
    "resnet101": ResNetSpec((3, 4, 23, 3), deep_base=False),
    "resnet101_dilated8": ResNetSpec((3, 4, 23, 3), dilate_scale=8),
    "resnet101_dilated16": ResNetSpec((3, 4, 23, 3), dilate_scale=16),
    "resnet152": ResNetSpec((3, 8, 36, 3), deep_base=False),
}


def _stage_plan(spec: ResNetSpec):
    """Per-stage (stride, per-block dilation) honoring _nostride_dilate."""
    plan = []
    widths = (64, 128, 256, 512)
    for si, (w, n) in enumerate(zip(widths, spec.layers)):
        stride = 1 if si == 0 else 2
        dil = [1] * n
        if spec.dilate_scale == 8 and si == 2:
            stride, dil = 1, [2] * n
            dil[0] = 1  # former stride conv gets d/2
        if spec.dilate_scale == 8 and si == 3:
            stride = 1
            mg = spec.multi_grid or (1, 1, 1)
            dil = [int(4 * mg[min(i, len(mg) - 1)]) for i in range(n)]
            dil[0] = max(1, dil[0] // 2)
        if spec.dilate_scale == 16 and si == 3:
            stride = 1
            mg = spec.multi_grid or (1, 1, 1)
            dil = [int(2 * mg[min(i, len(mg) - 1)]) for i in range(n)]
            dil[0] = max(1, dil[0] // 2)
        plan.append((w, n, stride, dil))
    return plan


class ResNet(nn.Module):
    """Returns [stem, pooled, c1, c2, c3, c4] features (NHWC)."""

    spec: ResNetSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> list[jnp.ndarray]:
        feats = []
        if self.spec.deep_base:
            x = ConvBN(64, 3, 2, use_relu=True, dtype=self.dtype, name="stem1")(x, train)
            x = ConvBN(64, 3, 1, use_relu=True, dtype=self.dtype, name="stem2")(x, train)
            x = ConvBN(128, 3, 1, use_relu=True, dtype=self.dtype, name="stem3")(x, train)
        else:
            x = ConvBN(64, 7, 2, use_relu=True, dtype=self.dtype, name="stem")(x, train)
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats.append(x)
        for si, (w, n, stride, dil) in enumerate(_stage_plan(self.spec)):
            for b in range(n):
                s = stride if b == 0 else 1
                need_ds = b == 0 and (s != 1 or x.shape[-1] != w * 4)
                x = Bottleneck(
                    w, strides=s, dilation=dil[b], downsample=need_ds,
                    dtype=self.dtype, name=f"layer{si + 1}_block{b}",
                )(x, train)
            feats.append(x)
        return feats
