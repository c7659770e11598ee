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

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrastiveseg_tpu.models.layers import Bottleneck, ConvBN


@dataclasses.dataclass(frozen=True)
class ResNetSpec:
    layers: tuple[int, ...]  # blocks per stage
    block: str = "bottleneck"  # bottleneck | basic (resnet18/34)
    deep_base: bool = True
    dilate_scale: int | None = None  # None | 8 | 16
    multi_grid: tuple[int, ...] | None = (1, 1, 1)
    # resnext-style grouped 3x3 convs (cardinality) and base width
    # (resnet_backbone.py:121-290 resnext101_32x4d etc.).
    groups: int = 1
    width_per_group: int = 64
    # wide_resnet-style width multiplier on the bottleneck 3x3.
    width_mult: float = 1.0
    # Deformable conv2 in layer4 (the reference keeps DCN resnets
    # commented out, resnet_backbone.py:241-259 — opt-in here).
    dcn_layer4: bool = False
    # ResNeSt split-attention (radix) on the bottleneck 3x3.
    radix: int = 0


RESNET_SPECS: dict[str, ResNetSpec] = {
    "resnet50": ResNetSpec((3, 4, 6, 3), deep_base=False),
    "resnet50_dilated8": ResNetSpec((3, 4, 6, 3), deep_base=False, dilate_scale=8),
    "resnet101": ResNetSpec((3, 4, 23, 3), deep_base=False),
    "resnet101_dilated8": ResNetSpec((3, 4, 23, 3), dilate_scale=8),
    "resnet101_dilated16": ResNetSpec((3, 4, 23, 3), dilate_scale=16),
    "resnet152": ResNetSpec((3, 8, 36, 3), deep_base=False),
    # Variant families (resnet_backbone.py:121-290).
    "resnext101_dilated8": ResNetSpec(
        (3, 4, 23, 3), deep_base=False, dilate_scale=8,
        groups=32, width_per_group=4),
    "wide_resnet101_dilated8": ResNetSpec(
        (3, 4, 23, 3), deep_base=False, dilate_scale=8, width_mult=2.0),
    "resnest101_dilated8": ResNetSpec(
        (3, 4, 23, 3), dilate_scale=8, radix=2, width_per_group=64),
    "resnet101_dilated8_dcn": ResNetSpec(
        (3, 4, 23, 3), dilate_scale=8, dcn_layer4=True),
}


def resolve_arch(name: str) -> str:
    """Exact spec names first — deep and plain stems coexist in the zoo —
    and strip the ``deepbase_`` prefix only when the exact name is absent.
    (An unconditional strip silently mapped deepbase_resnet50_dilated8 /
    deepbase_resnet101_dilated16 onto plain-stem specs.)"""
    if name in RESNET_SPECS:
        return name
    return name.replace("deepbase_", "")


def _zoo() -> None:
    """Every arch string the reference backbone selector accepts
    (resnet_backbone.py:137-290), with exact deep_base semantics per
    name.  Exact names are matched before the deepbase_ strip in
    build_backbone, so deep and plain stems coexist."""
    layers = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
              101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
    for depth in (18, 34, 50, 101, 152):
        block = "basic" if depth in (18, 34) else "bottleneck"
        for deep in (False, True):
            for dil in (None, 8, 16):
                name = ("deepbase_" if deep else "") + f"resnet{depth}" + (
                    f"_dilated{dil}" if dil else "")
                RESNET_SPECS.setdefault(name, ResNetSpec(
                    layers[depth], block=block, deep_base=deep,
                    dilate_scale=dil))
    for wpg in (8, 16, 32, 48):
        RESNET_SPECS.setdefault(
            f"resnext101_32x{wpg}d_dilated8",
            ResNetSpec((3, 4, 23, 3), deep_base=False, dilate_scale=8,
                       groups=32, width_per_group=wpg))
    resnest_layers = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
                      200: (3, 24, 36, 3), 269: (3, 30, 48, 8)}
    for depth, l in resnest_layers.items():
        RESNET_SPECS.setdefault(
            f"deepbase_resnest{depth}_dilated8",
            ResNetSpec(l, deep_base=True, dilate_scale=8, radix=2,
                       width_per_group=64))
    for depth in (50, 101):
        for dil in (8, 16):
            RESNET_SPECS.setdefault(
                f"deepbase_dcn_resnet{depth}_dilated{dil}",
                ResNetSpec(layers[depth], deep_base=True, dilate_scale=dil,
                           dcn_layer4=True))


_zoo()

# WiderResNetA2 depth -> module structure (resnet_models.py:288-313).
WIDE_RESNET_STRUCTURES: dict[str, tuple[int, ...]] = {
    "wide_resnet16_dilated8": (1, 1, 1, 1, 1, 1),
    "wide_resnet20_dilated8": (1, 1, 1, 3, 1, 1),
    "wide_resnet38_dilated8": (3, 3, 6, 3, 1, 1),
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


class DeformConvBN(nn.Module):
    """DCNv2 conv + BN [+ ReLU]: offsets/masks from a zero-init regular
    conv, sampling via ops/deform_conv (bilinear gathers + MXU matmul)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    use_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        from contrastiveseg_tpu.models.layers import TorchBatchNorm
        from contrastiveseg_tpu.ops.deform_conv import deform_conv2d

        k = self.kernel_size
        pad = self.dilation * (k - 1) // 2
        common = dict(padding=[(pad, pad), (pad, pad)],
                      kernel_dilation=(self.dilation, self.dilation),
                      dtype=self.dtype)
        # Zero-init offsets/masks: starts as an exact dilated conv.
        off = nn.Conv(2 * k * k, (k, k), kernel_init=nn.initializers.zeros,
                      name="offset", **common)(x)
        mask = jax.nn.sigmoid(
            nn.Conv(k * k, (k, k), kernel_init=nn.initializers.zeros,
                    name="mask", **common)(x))
        weight = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), self.dtype)
        y = deform_conv2d(x, off, weight, mask, stride=self.strides,
                          dilation=self.dilation)
        y = TorchBatchNorm(dtype=self.dtype, name="norm")(y, train)
        return nn.relu(y) if self.use_relu else y


class SplitAttentionConv(nn.Module):
    """ResNeSt split-attention 3x3 (radix splits, softmax-weighted fusion).

    Core of resnest101 (resnet_backbone.py:270-290's backbone).  Documented
    divergences: strided conv instead of avg-pool downsampling (avd), and
    cardinality folded into the grouped conv only (attention MLP ungrouped).
    """

    features: int
    radix: int = 2
    groups: int = 1
    strides: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        from contrastiveseg_tpu.models.layers import TorchBatchNorm

        r, f = self.radix, self.features
        pad = self.dilation
        y = nn.Conv(f * r, (3, 3), strides=(self.strides, self.strides),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups * r, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        y = TorchBatchNorm(dtype=self.dtype, name="norm")(y, train)
        y = nn.relu(y)
        B, H, W, _ = y.shape
        splits = y.reshape(B, H, W, r, f)
        gap = jnp.mean(jnp.sum(splits, axis=3), axis=(1, 2))  # [B, f]
        inter = max(f * r // 4, 32)
        a = nn.Dense(inter, dtype=self.dtype, name="fc1")(gap)
        a = nn.relu(nn.BatchNorm(use_running_average=train is not True,
                                 momentum=0.9, dtype=self.dtype,
                                 name="fc_bn")(a))
        a = nn.Dense(f * r, dtype=self.dtype, name="fc2")(a)
        att = jax.nn.softmax(a.reshape(B, r, f), axis=1)  # rSoftMax
        out = jnp.sum(splits * att[:, None, None, :, :], axis=3)
        return out


class VariantBottleneck(nn.Module):
    """Bottleneck generalized over resnext groups, wide width, DCN conv2,
    and ResNeSt split-attention (resnet_backbone.py:121-290 families)."""

    features: int
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    groups: int = 1
    width_per_group: int = 64
    width_mult: float = 1.0
    use_dcn: bool = False
    radix: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        width = int(
            self.features * (self.width_per_group / 64.0)
            * self.groups * self.width_mult
        )
        residual = x
        out = ConvBN(width, 1, 1, use_relu=True, dtype=self.dtype,
                     name="conv1")(x, train)
        if self.radix > 0:
            out = SplitAttentionConv(
                width, radix=self.radix, groups=self.groups,
                strides=self.strides, dilation=self.dilation,
                dtype=self.dtype, name="conv2")(out, train)
        elif self.use_dcn:
            out = DeformConvBN(width, 3, self.strides, self.dilation,
                               use_relu=True, dtype=self.dtype,
                               name="conv2")(out, train)
        else:
            out = _GroupedConvBN(width, self.strides, self.dilation,
                                 self.groups, dtype=self.dtype,
                                 name="conv2")(out, train)
        out = ConvBN(self.features * 4, 1, 1, use_relu=False,
                     dtype=self.dtype, name="conv3")(out, train)
        if self.downsample:
            residual = ConvBN(self.features * 4, 1, self.strides,
                              use_relu=False, dtype=self.dtype,
                              name="downsample")(x, train)
        return nn.relu(out + residual)


class _GroupedConvBN(nn.Module):
    features: int
    strides: int
    dilation: int
    groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        from contrastiveseg_tpu.models.layers import TorchBatchNorm

        pad = self.dilation
        y = nn.Conv(self.features, (3, 3),
                    strides=(self.strides, self.strides),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        y = TorchBatchNorm(dtype=self.dtype, name="norm")(y, train)
        return nn.relu(y)


class ResNet(nn.Module):
    """Returns [stem, pooled, c1, c2, c3, c4] features (NHWC)."""

    spec: ResNetSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> list[jnp.ndarray]:
        spec = self.spec
        feats = []
        if spec.deep_base:
            x = ConvBN(64, 3, 2, use_relu=True, dtype=self.dtype, name="stem1")(x, train)
            x = ConvBN(64, 3, 1, use_relu=True, dtype=self.dtype, name="stem2")(x, train)
            x = ConvBN(128, 3, 1, use_relu=True, dtype=self.dtype, name="stem3")(x, train)
        else:
            x = ConvBN(64, 7, 2, use_relu=True, dtype=self.dtype, name="stem")(x, train)
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats.append(x)
        is_variant = (spec.groups != 1 or spec.width_mult != 1.0
                      or spec.dcn_layer4 or spec.radix > 0)
        expansion = 1 if spec.block == "basic" else 4
        for si, (w, n, stride, dil) in enumerate(_stage_plan(spec)):
            for b in range(n):
                s = stride if b == 0 else 1
                need_ds = b == 0 and (s != 1 or x.shape[-1] != w * expansion)
                if spec.block == "basic":
                    from contrastiveseg_tpu.models.layers import BasicBlock

                    x = BasicBlock(
                        w, strides=s, dilation=dil[b], downsample=need_ds,
                        dtype=self.dtype, name=f"layer{si + 1}_block{b}",
                    )(x, train)
                elif is_variant:
                    x = VariantBottleneck(
                        w, strides=s, dilation=dil[b], downsample=need_ds,
                        groups=spec.groups,
                        width_per_group=spec.width_per_group,
                        width_mult=spec.width_mult,
                        use_dcn=spec.dcn_layer4 and si == 3,
                        radix=spec.radix, dtype=self.dtype,
                        name=f"layer{si + 1}_block{b}",
                    )(x, train)
                else:
                    x = Bottleneck(
                        w, strides=s, dilation=dil[b], downsample=need_ds,
                        dtype=self.dtype, name=f"layer{si + 1}_block{b}",
                    )(x, train)
            feats.append(x)
        return feats


class _BNReLU(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        from contrastiveseg_tpu.models.layers import TorchBatchNorm

        return nn.relu(TorchBatchNorm(dtype=self.dtype, name="bn")(x, train))


class IdentityResidualBlock(nn.Module):
    """Pre-activation (identity-mapping) residual block of WiderResNetA2
    (wide_resnet_models.py:24-103): BN-ReLU first, then either a 3x3+3x3
    pair (two channel values) or a 1x1/3x3/1x1 bottleneck (three), with
    the projection shortcut taken from the *pre-activated* input."""

    channels: tuple[int, ...]
    strides: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        cs = self.channels
        need_proj = self.strides != 1 or x.shape[-1] != cs[-1]
        bn1 = _BNReLU(dtype=self.dtype, name="bn1")(x, train)
        shortcut = x
        if need_proj:
            shortcut = nn.Conv(cs[-1], (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype,
                               name="proj_conv")(bn1)
        pad = self.dilation
        if len(cs) == 2:
            y = nn.Conv(cs[0], (3, 3), strides=(self.strides, self.strides),
                        padding=[(pad, pad), (pad, pad)],
                        kernel_dilation=(self.dilation, self.dilation),
                        use_bias=False, dtype=self.dtype, name="conv1")(bn1)
            y = _BNReLU(dtype=self.dtype, name="bn2")(y, train)
            y = nn.Conv(cs[1], (3, 3),
                        padding=[(pad, pad), (pad, pad)],
                        kernel_dilation=(self.dilation, self.dilation),
                        use_bias=False, dtype=self.dtype, name="conv2")(y)
        else:
            y = nn.Conv(cs[0], (1, 1), strides=(self.strides, self.strides),
                        use_bias=False, dtype=self.dtype, name="conv1")(bn1)
            y = _BNReLU(dtype=self.dtype, name="bn2")(y, train)
            y = nn.Conv(cs[1], (3, 3),
                        padding=[(pad, pad), (pad, pad)],
                        kernel_dilation=(self.dilation, self.dilation),
                        use_bias=False, dtype=self.dtype, name="conv2")(y)
            y = _BNReLU(dtype=self.dtype, name="bn3")(y, train)
            y = nn.Conv(cs[2], (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv3")(y)
        return y + shortcut


class WiderResNetA2(nn.Module):
    """WiderResNetA2 (wide_resnet16/20/38 — wide_resnet_models.py:107-215)
    with ``dilation=True`` semantics: max-pool downsampling into mods 2-3,
    strided conv into mod 4, dilation 2 in mod 5 and 4 in mods 6-7
    (output stride 8).  Returns [mod4, mod5, mod6, BNReLU(mod7)]."""

    structure: tuple[int, ...]  # six module depths
    dtype: Any = jnp.float32

    _CHANNELS = ((128, 128), (256, 256), (512, 512), (512, 1024),
                 (512, 1024, 2048), (1024, 2048, 4096))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> list[jnp.ndarray]:
        assert len(self.structure) == 6
        x = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="mod1_conv1")(x)
        feats = []
        for mod_id, num in enumerate(self.structure):
            if mod_id < 2:
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)))
            dil = 2 if mod_id == 3 else (4 if mod_id > 3 else 1)
            for block_id in range(num):
                stride = 2 if block_id == 0 and mod_id == 2 else 1
                x = IdentityResidualBlock(
                    self._CHANNELS[mod_id], strides=stride, dilation=dil,
                    dtype=self.dtype,
                    name=f"mod{mod_id + 2}_block{block_id + 1}",
                )(x, train)
            if mod_id >= 2:
                if mod_id == 5:
                    feats.append(_BNReLU(dtype=self.dtype, name="bn_out")(
                        x, train))
                else:
                    feats.append(x)
        return feats
