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
    """Pixel-to-object attention (ObjectAttentionBlock2D)."""

    key_channels: int
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
    def __call__(self, x: jnp.ndarray, proxy: jnp.ndarray, train: bool) -> jnp.ndarray:
        # x: [B, H, W, C] pixels; proxy: [B, K, C] object regions.
        B, H, W, C = x.shape
        query = self._double_conv("f_pixel", x, train)  # [B, H, W, key]
        key = self._double_conv("f_object", proxy[:, :, None, :], train)[:, :, 0]
        value = nn.Conv(self.key_channels, (1, 1), dtype=self.dtype,
                        name="f_down")(proxy[:, :, None, :])[:, :, 0]
        value = ConvBNAct(dtype=self.dtype, name="f_down_bn")(value[:, :, None, :], train)[:, :, 0]

        sim = jnp.einsum(
            "bhwd,bkd->bhwk", query, key, preferred_element_type=jnp.float32
        ) * (self.key_channels ** -0.5)
        sim = jax.nn.softmax(sim, axis=-1)
        ctx = jnp.einsum(
            "bhwk,bkd->bhwd", sim.astype(value.dtype), value,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        ctx = nn.Conv(C, (1, 1), dtype=self.dtype, name="f_up")(ctx)
        ctx = ConvBNAct(dtype=self.dtype, name="f_up_bn")(ctx, train)
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
    """ObjectAttention + concat + 1x1 conv projection + dropout."""

    key_channels: int
    out_channels: int
    dropout: float = 0.05
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, proxy: jnp.ndarray, train: bool) -> jnp.ndarray:
        ctx = ObjectAttention(self.key_channels, dtype=self.dtype,
                              name="object_attention")(feats, proxy, train)
        x = jnp.concatenate([ctx, feats], axis=-1)
        x = ConvBN(self.out_channels, 1, use_relu=True, dtype=self.dtype,
                   name="project")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train, name="drop")(x)
        return x
