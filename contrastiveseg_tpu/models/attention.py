"""Self-attention context modules: non-local, ISA, OC, PSP, ASP-OC.

Re-designs of:
  * SelfAttentionBlock2D (lib/models/modules/isa_block.py:10-71) — plain
    scaled-dot self-attention over all pixels, as NHWC einsums;
  * ISA_Block / ISA_Module (isa_block.py:73-188) — interlaced sparse
    attention: block-partition the map, attend long-range across blocks
    then short-range within blocks (reshape/transpose only, no gathers);
  * BaseOC_Module (base_oc_block.py:116+) — attention context + residual;
  * PSPModule (psp_block.py:15) — pyramid pooling;
  * ASP_OC_Module (asp_oc_block.py:21) — ASPP with an OC context branch.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrastiveseg_tpu.models.layers import ConvBN
from contrastiveseg_tpu.models.ocr import ConvBNAct
from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners


class SelfAttention2D(nn.Module):
    """Scaled-dot self-attention over the full map (non-local block).

    Two reference flavors share this module:
      * ISA's SelfAttentionBlock2D (isa_block.py:10-70): ``w_bn=True`` —
        bias-free f_value, W = [conv, BNReLU];
      * BaseOC's _SelfAttentionBlock (base_oc_block.py:24-98):
        ``w_bn=False`` — biased f_value, W = one zero-init biased conv,
        and optional ``scale`` max-pool before q/k/v with an
        align-corners upsample of the context after (used by
        ASP_OC's BaseOC_Context_Module at sizes=[2]).
    """

    key_channels: int
    value_channels: int
    out_channels: int
    w_bn: bool = True
    scale: int = 1
    dtype: Any = jnp.float32

    def _double_conv(self, name, x, train):
        x = nn.Conv(self.key_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name=f"{name}_1")(x)
        x = ConvBNAct(dtype=self.dtype, name=f"{name}_bn1")(x, train)
        x = nn.Conv(self.key_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name=f"{name}_2")(x)
        x = ConvBNAct(dtype=self.dtype, name=f"{name}_bn2")(x, train)
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        in_h, in_w = x.shape[1], x.shape[2]
        if self.scale > 1:
            x = nn.max_pool(x, (self.scale, self.scale),
                            strides=(self.scale, self.scale))
        B, H, W, C = x.shape
        q = self._double_conv("f_query", x, train).reshape(B, H * W, -1)
        k = self._double_conv("f_key", x, train).reshape(B, H * W, -1)
        v = nn.Conv(self.value_channels, (1, 1), use_bias=not self.w_bn,
                    dtype=self.dtype, name="f_value")(x).reshape(B, H * W, -1)
        sim = jnp.einsum(
            "bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32
        ) * (self.key_channels ** -0.5)
        sim = jax.nn.softmax(sim, axis=-1)
        ctx = jnp.einsum(
            "bnm,bmd->bnd", sim.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype).reshape(B, H, W, self.value_channels)
        if self.w_bn:
            ctx = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                          dtype=self.dtype, name="W")(ctx)
            ctx = ConvBNAct(dtype=self.dtype, name="W_bn")(ctx, train)
        else:
            # zero-init like the reference (base_oc_block.py:74-76): the
            # attention context starts as an identity-free residual.
            ctx = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                          kernel_init=nn.initializers.zeros,
                          dtype=self.dtype, name="W")(ctx)
        if self.scale > 1:
            ctx = resize_bilinear_align_corners(ctx, (in_h, in_w))
        return ctx


class ISABlock(nn.Module):
    """Interlaced sparse self-attention (isa_block.py:73-135)."""

    key_channels: int
    value_channels: int
    out_channels: int
    down_factor: tuple[int, int] = (8, 8)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        n, h, w, c = x.shape
        dh, dw = self.down_factor
        oh, ow = math.ceil(h / dh), math.ceil(w / dw)
        ph, pw = oh * dh - h, ow * dw - w
        if ph or pw:
            x = jnp.pad(
                x,
                ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2),
                 (0, 0)),
            )
        # long-range: group pixels with the same intra-block coordinate.
        f = x.reshape(n, oh, dh, ow, dw, c).transpose(0, 2, 4, 1, 3, 5)
        f = f.reshape(n * dh * dw, oh, ow, c)
        f = SelfAttention2D(
            self.key_channels, self.value_channels, self.out_channels,
            dtype=self.dtype, name="long_range",
        )(f, train)
        co = self.out_channels
        # short-range: attend within each block.
        f = f.reshape(n, dh, dw, oh, ow, co).transpose(0, 3, 4, 1, 2, 5)
        f = f.reshape(n * oh * ow, dh, dw, co)
        f = SelfAttention2D(
            self.key_channels, self.value_channels, co,
            dtype=self.dtype, name="short_range",
        )(f, train)
        f = f.reshape(n, oh, ow, dh, dw, co).transpose(0, 1, 3, 2, 4, 5)
        f = f.reshape(n, oh * dh, ow * dw, co)
        if ph or pw:
            f = f[:, ph // 2:ph // 2 + h, pw // 2:pw // 2 + w, :]
        return f


class ISAModule(nn.Module):
    """Parallel ISA blocks + residual concat projection (ISA_Module,
    isa_block.py:114-148): context = stages(x) (concat if multi-factor,
    with x lifted by up_conv), then [x, context] -> 1x1 ConvBNReLU ->
    dropout."""

    key_channels: int = 256
    value_channels: int = 512
    out_channels: int = 512
    down_factors: Sequence[tuple[int, int]] = ((8, 8),)
    dropout: float = 0.05
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        outs = []
        for i, df in enumerate(self.down_factors):
            outs.append(
                ISABlock(
                    self.key_channels, self.value_channels, self.out_channels,
                    down_factor=tuple(df), dtype=self.dtype, name=f"isa{i}",
                )(x, train)
            )
        if len(outs) > 1:
            context = jnp.concatenate(outs, axis=-1)
            x = ConvBN(len(outs) * self.out_channels, 1, use_relu=True,
                       dtype=self.dtype, name="up_conv")(x, train)
        else:
            context = outs[0]
        out = ConvBN(self.out_channels, 1, use_relu=True, dtype=self.dtype,
                     name="project")(jnp.concatenate([x, context], axis=-1),
                                     train)
        return nn.Dropout(self.dropout, deterministic=not train,
                          name="drop")(out)


class BaseOCModule(nn.Module):
    """Self-attention context concat input + 1x1 proj (base_oc_block.py:116)."""

    key_channels: int = 256
    value_channels: int = 256
    out_channels: int = 512
    dropout: float = 0.05
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        ctx = SelfAttention2D(
            self.key_channels, self.value_channels, self.out_channels,
            w_bn=False, dtype=self.dtype, name="attention",
        )(x, train)
        out = jnp.concatenate([ctx, x], axis=-1)
        out = ConvBN(self.out_channels, 1, use_relu=True, dtype=self.dtype,
                     name="project")(out, train)
        return nn.Dropout(self.dropout, deterministic=not train,
                          name="drop")(out)


class BaseOCContextModule(nn.Module):
    """Context-only BaseOC (BaseOC_Context_Module, base_oc_block.py:161-195):
    scale-pooled self-attention followed by BN+ReLU + dropout — no conv,
    no concat with the input (ASP_OC's context branch, sizes=[2])."""

    key_channels: int
    value_channels: int
    out_channels: int
    scale: int = 2
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        ctx = SelfAttention2D(
            self.key_channels, self.value_channels, self.out_channels,
            w_bn=False, scale=self.scale, dtype=self.dtype, name="attention",
        )(x, train)
        ctx = ConvBNAct(dtype=self.dtype, name="ctx_bn")(ctx, train)
        return nn.Dropout(self.dropout, deterministic=not train,
                          name="drop")(ctx)


class PyramidOCModule(nn.Module):
    """Pyramid object-context: self-attention inside s x s grid cells per
    pyramid level, level outputs concatenated with the input and projected.

    The reference ships a run script for a `pyramid_ocnet` model
    (scripts/cityscapes/ocnet/run_r_101_d_8_pyramidoc_train.sh) that its
    own SEG_MODEL_DICT never registers (model_manager.py:48-82 — bitrot);
    rebuilt here from the OCNet paper's Pyramid-OC description so the
    script's recipe is runnable.  Cells fold into the batch axis, so each
    level is one fused attention call on the MXU.
    """

    key_channels: int = 256
    value_channels: int = 256
    out_channels: int = 512
    levels: Sequence[int] = (1, 2, 3, 6)
    dropout: float = 0.05
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        n, h, w, c = x.shape
        ctxs = []
        for s in self.levels:
            oh, ow = math.ceil(h / s), math.ceil(w / s)
            ph, pw = oh * s - h, ow * s - w
            f = x
            if ph or pw:
                f = jnp.pad(
                    f,
                    ((0, 0), (ph // 2, ph - ph // 2),
                     (pw // 2, pw - pw // 2), (0, 0)),
                )
            f = f.reshape(n, s, oh, s, ow, c).transpose(0, 1, 3, 2, 4, 5)
            f = f.reshape(n * s * s, oh, ow, c)
            f = SelfAttention2D(
                self.key_channels, self.value_channels, self.value_channels,
                dtype=self.dtype, name=f"attn_s{s}",
            )(f, train)
            f = f.reshape(n, s, s, oh, ow, self.value_channels)
            f = f.transpose(0, 1, 3, 2, 4, 5).reshape(
                n, s * oh, s * ow, self.value_channels)
            if ph or pw:
                f = f[:, ph // 2:ph // 2 + h, pw // 2:pw // 2 + w, :]
            ctxs.append(f)
        out = jnp.concatenate([x] + ctxs, axis=-1)
        out = ConvBN(self.out_channels, 1, use_relu=True, dtype=self.dtype,
                     name="project")(out, train)
        return nn.Dropout(self.dropout, deterministic=not train,
                          name="drop")(out)


class PSPModule(nn.Module):
    """Pyramid scene parsing pooling (psp_block.py:15)."""

    out_channels: int = 512
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        B, H, W, C = x.shape
        branch_ch = self.out_channels // len(self.sizes)
        feats = [x]
        for i, s in enumerate(self.sizes):
            # Adaptive average pooling to s x s.
            ph, pw = H // s, W // s
            p = x[:, : ph * s, : pw * s, :].reshape(B, s, ph, s, pw, C)
            p = p.mean(axis=(2, 4))
            p = ConvBN(branch_ch, 1, use_relu=True, dtype=self.dtype,
                       name=f"stage{i}")(p, train)
            feats.append(resize_bilinear_align_corners(p, (H, W)))
        out = jnp.concatenate(feats, axis=-1)
        out = ConvBN(self.out_channels, 3, use_relu=True, dtype=self.dtype,
                     name="bottleneck")(out, train)
        return nn.Dropout(0.1, deterministic=not train, name="drop")(out)


class ASPOCModule(nn.Module):
    """ASP_OC_Module (asp_oc_block.py:21-75): 5 branches at
    ``out_features`` channels — a scale-2 BaseOC-context branch + 1x1 +
    three dilated 3x3 — concat -> 1x1 project to 2*out_features +
    dropout 0.1.  AspOCNet wraps this behind a 3x3 ConvBN(512)
    (nets/ocnet.py:80-86)."""

    out_features: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        of = self.out_features
        ctx = ConvBN(of, 3, use_relu=True, dtype=self.dtype,
                     name="context_conv")(x, train)
        ctx = BaseOCContextModule(
            key_channels=of // 2, value_channels=of // 2,
            out_channels=of, scale=2, dtype=self.dtype, name="oc",
        )(ctx, train)
        branches = [
            ctx,
            ConvBN(of, 1, use_relu=True, dtype=self.dtype,
                   name="b0")(x, train),
        ]
        for i, r in enumerate(self.rates):
            branches.append(
                ConvBN(of, 3, dilation=r, use_relu=True,
                       dtype=self.dtype, name=f"b{i + 1}")(x, train)
            )
        out = jnp.concatenate(branches, axis=-1)
        out = ConvBN(2 * of, 1, use_relu=True, dtype=self.dtype,
                     name="project")(out, train)
        return nn.Dropout(0.1, deterministic=not train, name="drop")(out)


class CCModule(nn.Module):
    """RCCA: recurrent criss-cross attention (CCNet), the consumer of
    ops/cc_attention.criss_cross_attention.

    Replaces the reference's CUDA extension (lib/extensions/cc_attention/,
    SURVEY.md §2.10) with the einsum formulation; structure follows the
    public CCNet RCCAModule: conva 3x3 -> R x (x + gamma * CCA(x)) with
    shared attention weights -> convb 3x3 -> bottleneck on [input, ctx].
    """

    out_channels: int = 512
    recurrence: int = 2
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        from contrastiveseg_tpu.ops.cc_attention import criss_cross_attention

        f = ConvBN(self.out_channels, 3, use_relu=True, dtype=self.dtype,
                   name="conva")(x, train)
        q_conv = nn.Conv(self.out_channels // 8, (1, 1), use_bias=False,
                         dtype=self.dtype, name="query")
        k_conv = nn.Conv(self.out_channels // 8, (1, 1), use_bias=False,
                         dtype=self.dtype, name="key")
        v_conv = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                         dtype=self.dtype, name="value")
        gamma = self.param("gamma", nn.initializers.zeros, (), jnp.float32)
        y = f
        for _ in range(self.recurrence):
            ctx = criss_cross_attention(q_conv(y), k_conv(y), v_conv(y))
            y = y + gamma.astype(y.dtype) * ctx
        y = ConvBN(self.out_channels, 3, use_relu=True, dtype=self.dtype,
                   name="convb")(y, train)
        y = jnp.concatenate([x, y], axis=-1)
        y = ConvBN(self.out_channels, 3, use_relu=True, dtype=self.dtype,
                   name="bottleneck")(y, train)
        return nn.Dropout(self.dropout, deterministic=not train,
                          name="drop")(y)


class HANetConv(nn.Module):
    """Height-driven attention (HANet_Conv, hanet_attention.py:16-120).

    Row-pool the feature map to 16 rows, run a 3-layer 1-D conv MLP over
    the height axis, sigmoid, linearly upsample to H, and scale rows.
    Divergences (documented): the positional-encoding branch is omitted
    (the reference net calls HANet_Conv without `pos`, so it is inert
    there too), and non-multiple-of-16 heights fall back to a linear
    resize instead of torch adaptive pooling's ragged bins.  NOTE the
    reference net applies its 384-ch `ha1` to all four HRNet branches
    (nets/hrnet.py:344-347) which cannot execute; we apply one HANetConv
    per branch at the branch's own width — the intended design.
    """

    channels: int
    r_factor: int = 64
    pooled_rows: int = 16  # 128 // pos_rfactor(8)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        B, H, W, C = x.shape
        rows = jnp.mean(x, axis=2)  # [B, H, C]
        if H % self.pooled_rows == 0:
            pooled = rows.reshape(
                B, self.pooled_rows, H // self.pooled_rows, C).mean(axis=2)
        else:
            pooled = jax.image.resize(
                rows, (B, self.pooled_rows, C), method="linear")

        mid1 = -(-self.channels // self.r_factor)  # ceil
        y = nn.Conv(mid1, (1,), use_bias=False, dtype=self.dtype,
                    name="att1")(pooled)
        y = nn.relu(nn.BatchNorm(use_running_average=train is not True, momentum=0.9,
                                 dtype=self.dtype, name="bn1")(y))
        y = nn.Conv(2 * mid1, (3,), padding=1, dtype=self.dtype,
                    name="att2")(y)
        y = nn.relu(nn.BatchNorm(use_running_average=train is not True, momentum=0.9,
                                 dtype=self.dtype, name="bn2")(y))
        y = nn.Conv(self.channels, (3,), padding=1, dtype=self.dtype,
                    name="att3")(y)
        attn = jax.nn.sigmoid(y)  # [B, 16, C]
        attn = jax.image.resize(attn, (B, H, C), method="linear")
        return x * attn[:, :, None, :]
