"""OCR (object-contextual representations) modules, TPU-native.

Re-design of /root/reference/lib/models/modules/spatial_ocr_block.py:
  * SpatialGather (:37-67): class-probability-weighted context — a single
    ``[K, HW] @ [HW, C]`` einsum per image (pure MXU work);
  * ObjectAttentionBlock2D (:120-310): pixel-query / object-key attention
    with 1/sqrt(key) scaling;
  * SpatialOCR (:316+): attention context concat + 1x1 projection.

The torch version reshapes NCHW through view/permute gymnastics; here
everything is one einsum on NHWC with the K (class/object) axis kept last
— XLA fuses the softmax into the matmuls.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrastiveseg_tpu.models.layers import ConvBN


class SpatialGather(nn.Module):
    """context[k] = softmax_hw(scale * prob_k) . feats  -> [B, K, C]."""

    scale: float = 1.0

    @nn.compact
    def __call__(self, feats: jnp.ndarray, probs: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = feats.shape
        K = probs.shape[-1]
        p = probs.reshape(B, H * W, K)
        p = jax.nn.softmax(self.scale * p, axis=1)  # over spatial
        f = feats.reshape(B, H * W, C)
        return jnp.einsum(
            "bnk,bnc->bkc", p, f, preferred_element_type=jnp.float32
        ).astype(feats.dtype)


class ObjectAttention(nn.Module):
    """Pixel-to-object attention (ObjectAttentionBlock2D).

    ``gt_sim`` (the oracle path, spatial_ocr_block.py:186-192) replaces the
    learned query-key similarity with an L1-normalized ground-truth one-hot
    map; ``use_bg`` additionally returns the complementary background
    context through the SAME f_up projection (:207-214).
    """

    key_channels: int
    use_bg: bool = False
    dtype: Any = jnp.float32

    def _double_conv(self, name: str, x, train):
        x = nn.Conv(self.key_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name=f"{name}_1")(x)
        x = ConvBNAct(dtype=self.dtype, name=f"{name}_bn1")(x, train)
        x = nn.Conv(self.key_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name=f"{name}_2")(x)
        x = ConvBNAct(dtype=self.dtype, name=f"{name}_bn2")(x, train)
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray, proxy: jnp.ndarray, train: bool,
                 gt_sim: jnp.ndarray = None):
        # x: [B, H, W, C] pixels; proxy: [B, K, C] object regions;
        # gt_sim: [B, H, W, K] one-hot (unnormalized) oracle similarity.
        B, H, W, C = x.shape
        query = self._double_conv("f_pixel", x, train)  # [B, H, W, key]
        key = self._double_conv("f_object", proxy[:, :, None, :], train)[:, :, 0]
        value = nn.Conv(self.key_channels, (1, 1), dtype=self.dtype,
                        name="f_down")(proxy[:, :, None, :])[:, :, 0]
        value = ConvBNAct(dtype=self.dtype, name="f_down_bn")(value[:, :, None, :], train)[:, :, 0]

        f_up = nn.Conv(C, (1, 1), dtype=self.dtype, name="f_up")
        f_up_bn = ConvBNAct(dtype=self.dtype, name="f_up_bn")

        def distribute(sim):
            ctx = jnp.einsum(
                "bhwk,bkd->bhwd", sim.astype(value.dtype), value,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            return f_up_bn(f_up(ctx), train)

        if gt_sim is not None:
            sim = gt_sim / jnp.maximum(
                jnp.sum(gt_sim, axis=-1, keepdims=True), 1e-12)
        else:
            sim = jnp.einsum(
                "bhwd,bkd->bhwk", query, key, preferred_element_type=jnp.float32
            ) * (self.key_channels ** -0.5)
            sim = jax.nn.softmax(sim, axis=-1)
        ctx = distribute(sim)
        if self.use_bg:
            assert gt_sim is not None, "use_bg requires the oracle gt_sim"
            bg = 1.0 - gt_sim
            bg = bg / jnp.maximum(jnp.sum(bg, axis=-1, keepdims=True), 1e-12)
            return ctx, distribute(bg)
        return ctx


class ConvBNAct(nn.Module):
    """BN + ReLU helper for post-conv normalization (BNReLU)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        from contrastiveseg_tpu.models.layers import TorchBatchNorm

        x = TorchBatchNorm(dtype=self.dtype, name="bn")(x, train)
        return nn.relu(x)


class SpatialOCR(nn.Module):
    """ObjectAttention + concat + 1x1 conv projection + dropout.

    ``use_bg``/``use_oc`` mirror SpatialOCR_Module (spatial_ocr_block.py:
    237-310): with a ground-truth one-hot map the concat becomes
    [context, bg_context, feats] (use_bg) or [bg_context, feats]
    (use_bg + not use_oc).
    """

    key_channels: int
    out_channels: int
    dropout: float = 0.05
    use_bg: bool = False
    use_oc: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, proxy: jnp.ndarray, train: bool,
                 gt_sim: jnp.ndarray = None) -> jnp.ndarray:
        ctx = ObjectAttention(self.key_channels, use_bg=self.use_bg,
                              dtype=self.dtype, name="object_attention")(
            feats, proxy, train, gt_sim=gt_sim)
        if self.use_bg:
            ctx, bg_ctx = ctx
            parts = [ctx, bg_ctx, feats] if self.use_oc else [bg_ctx, feats]
        else:
            parts = [ctx, feats]
        x = jnp.concatenate(parts, axis=-1)
        x = ConvBN(self.out_channels, 1, use_relu=True, dtype=self.dtype,
                   name="project")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train, name="drop")(x)
        return x


class SpatialOCRASP(nn.Module):
    """ASPP whose context branch is probs-conditioned fast-OCR attention
    (SpatialOCR_ASP_Module, spatial_ocr_block.py:329-397): context =
    conv3x3 -> gather(probs) -> object attention; plus 1x1 and three
    dilated-3x3 branches; concat [ctx, b0..b3] -> 1x1 project + dropout.

    Distinct from models/attention.ASPOCModule (asp_oc_block.py), whose
    context is BaseOC self-attention with no probability conditioning —
    the reference uses *this* module for ASPOCRNet (nets/ocrnet.py:72-117,
    out 256, dilations 12/24/36) and CE2P_ASPOCR (nets/ce2pnet.py:48-53,
    out 512, dilations 6/12/18)."""

    hidden: int = 256
    out_channels: int = 512
    dilations: tuple = (12, 24, 36)
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, probs: jnp.ndarray,
                 train: bool) -> jnp.ndarray:
        f1 = ConvBN(self.hidden, 3, use_relu=True, dtype=self.dtype,
                    name="context_conv")(x, train)
        proxy = SpatialGather(name="gather")(f1, probs)
        ctx = ObjectAttention(self.hidden // 2, dtype=self.dtype,
                              name="object_attention")(f1, proxy, train)
        branches = [
            ctx,
            ConvBN(self.hidden, 1, use_relu=True, dtype=self.dtype,
                   name="b0")(x, train),
        ]
        for i, r in enumerate(self.dilations):
            branches.append(
                ConvBN(self.hidden, 3, dilation=r, use_relu=True,
                       dtype=self.dtype, name=f"b{i + 1}")(x, train)
            )
        out = jnp.concatenate(branches, axis=-1)
        out = ConvBN(self.out_channels, 1, use_relu=True, dtype=self.dtype,
                     name="project")(out, train)
        return nn.Dropout(self.dropout, deterministic=not train,
                          name="drop")(out)
