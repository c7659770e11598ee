"""Shared flax building blocks (NHWC, TPU layouts).

BatchNorm note: under global-view jit over a sharded batch, `nn.BatchNorm`
reduces over the *global* batch, so XLA inserts the cross-device collectives
automatically — this is SyncBN by construction and replaces the reference's
entire native syncbn/inplace_abn stack (lib/extensions/syncbn/**,
SURVEY.md §2.10).  Torch BN defaults are matched: eps=1e-5 and torch
momentum 0.1 == flax momentum 0.9.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

# Torch-default BN hyperparams used across the reference (bn_momentum=0.1).
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch defaults; `train` toggles running-average use.

    ``train`` may be the sentinel string ``"freeze_bn"``: dropout sites
    stay live (truthy) but BN normalizes with its frozen running averages
    and writes no stat updates — the ModuleRunner.freeze_bn finetune
    semantics (/root/reference/segmentor/tools/module_runner.py:228-236,
    used by the --finetune flow, main_contrastive.py:204).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=train is not True,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)


class PallasConv3x3(nn.Module):
    """3x3 stride-1 SAME conv via the Pallas small-channel kernel.

    Param-compatible with ``nn.Conv(..., name="conv")`` — same ``kernel``
    name, HWIO shape, and lecun-normal init — so checkpoints and the
    torch importer are oblivious to which path computed the conv.
    On non-TPU backends the kernel runs in interpreter mode (tests).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from contrastiveseg_tpu.ops.conv_pallas import conv3x3

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32,
        )
        import jax

        interpret = jax.default_backend() != "tpu"
        return conv3x3(x.astype(self.dtype), kernel.astype(self.dtype),
                       interpret)


class ConvBN(nn.Module):
    """Conv2d (no bias) -> BN [-> ReLU].  NHWC.

    ``pallas=True`` routes eligible convs (3x3, stride 1, undilated,
    small C) through ops/conv_pallas.py — 2x the XLA conv rate in
    isolation (70 vs 35 TF/s at C=48 on v5e) but a net loss inside the
    full train step (custom-call barriers + lost BN fusion; see
    ops/conv_pallas.py for numbers), so it defaults to off.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    use_relu: bool = True
    use_bias: bool = False
    pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        use_pallas = False
        if self.pallas and not self.use_bias:
            from contrastiveseg_tpu.ops.conv_pallas import supported

            use_pallas = supported(x.shape, self.kernel_size,
                                   self.strides, self.dilation)
        if use_pallas:
            x = PallasConv3x3(self.features, dtype=self.dtype,
                              name="conv")(x)
        else:
            pad = self.dilation * (self.kernel_size - 1) // 2
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.strides, self.strides),
                padding=[(pad, pad), (pad, pad)],
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = TorchBatchNorm(dtype=self.dtype, name="norm")(x, train)
        if self.use_relu:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """HRNet/ResNet basic residual block (3x3, 3x3), expansion 1.

    Reference: lib/models/backbones/hrnet/hrnet_backbone.py:35-66.
    """

    features: int
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    pallas: bool = False
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        residual = x
        out = ConvBN(
            self.features, 3, self.strides, self.dilation, use_relu=True,
            pallas=self.pallas, dtype=self.dtype, name="conv1",
        )(x, train)
        out = ConvBN(
            self.features, 3, 1, self.dilation, use_relu=False,
            pallas=self.pallas, dtype=self.dtype, name="conv2",
        )(out, train)
        if self.downsample:
            residual = ConvBN(
                self.features, 1, self.strides, use_relu=False,
                dtype=self.dtype, name="downsample",
            )(x, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """Bottleneck residual block (1x1, 3x3, 1x1 x4), expansion 4.

    Reference: hrnet_backbone.py:68-106 / resnet_models.py Bottleneck.
    """

    features: int  # bottleneck width; output = features * 4
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        residual = x
        out = ConvBN(self.features, 1, 1, use_relu=True, dtype=self.dtype,
                     name="conv1")(x, train)
        out = ConvBN(self.features, 3, self.strides, self.dilation,
                     use_relu=True, dtype=self.dtype, name="conv2")(out, train)
        out = ConvBN(self.features * 4, 1, 1, use_relu=False, dtype=self.dtype,
                     name="conv3")(out, train)
        if self.downsample:
            residual = ConvBN(
                self.features * 4, 1, self.strides, use_relu=False,
                dtype=self.dtype, name="downsample",
            )(x, train)
        return nn.relu(out + residual)
