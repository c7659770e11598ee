"""ViT encoder + SETR decoders, flax/NHWC.

Re-design of the reference SETR (lib/models/backbones/vit/setr.py:22-720):
``SegmentationTransformer`` = patch embed + transformer encoder; decoders
Naive (1x1 convs + upsample), PUP (progressive conv+2x upsample), MLA
(multi-level aggregation).  TPU-first: attention is one fused einsum chain
per block; sequence length stays static (fixed crop sizes).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrastiveseg_tpu.models.layers import ConvBN
from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners


@dataclasses.dataclass(frozen=True)
class ViTSpec:
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_indices: tuple[int, ...] = (5, 7, 9, 11)  # for MLA decoder


VIT_SPECS = {
    "vit_small": ViTSpec(embed_dim=384, depth=12, num_heads=6),
    "vit_base": ViTSpec(embed_dim=768, depth=12, num_heads=12),
    "vit_large": ViTSpec(embed_dim=1024, depth=24, num_heads=16,
                         out_indices=(9, 14, 19, 23)),
}


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn",
            deterministic=not train,
        )(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class ViT(nn.Module):
    """Patch-embed + encoder; returns features from `out_indices` reshaped
    to [B, H/p, W/p, D]."""

    spec: ViTSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> list[jnp.ndarray]:
        s = self.spec
        p = s.patch_size
        B, H, W, _ = x.shape
        gh, gw = H // p, W // p
        x = nn.Conv(s.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(x)
        x = x.reshape(B, gh * gw, s.embed_dim)
        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, gh * gw, s.embed_dim),
        )
        x = x + pos.astype(x.dtype)
        outs = []
        for i in range(s.depth):
            x = TransformerBlock(
                s.embed_dim, s.num_heads, s.mlp_ratio, dtype=self.dtype,
                name=f"block{i}",
            )(x, train)
            if i in s.out_indices:
                outs.append(
                    nn.LayerNorm(dtype=self.dtype, name=f"out_norm{i}")(x)
                    .reshape(B, gh, gw, s.embed_dim)
                )
        if not outs:
            outs = [x.reshape(B, gh, gw, s.embed_dim)]
        return outs


class SETR(nn.Module):
    """SETR Naive / PUP / MLA decoders (setr.py SETR_Naive/PUP/MLA)."""

    num_classes: int
    arch: str = "vit_base"
    decoder: str = "pup"  # naive | pup | mla
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        in_h, in_w = x.shape[1], x.shape[2]
        feats = ViT(VIT_SPECS[self.arch], dtype=self.dtype, name="backbone")(
            x.astype(self.dtype), train
        )
        f = feats[-1]
        if self.decoder == "naive":
            f = ConvBN(256, 1, use_relu=True, dtype=self.dtype,
                       name="conv1")(f, train)
            seg = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                          name="cls")(f.astype(jnp.float32))
        elif self.decoder == "pup":
            ch = 256
            for i in range(4):
                f = ConvBN(ch, 3, use_relu=True, dtype=self.dtype,
                           name=f"pup{i}")(f, train)
                f = resize_bilinear_align_corners(
                    f, (f.shape[1] * 2, f.shape[2] * 2), fast=True
                )
            seg = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                          name="cls")(f.astype(jnp.float32))
        else:  # mla
            streams = []
            for i, fi in enumerate(feats):
                g = ConvBN(256, 1, use_relu=True, dtype=self.dtype,
                           name=f"mla_p{i}")(fi, train)
                g = ConvBN(128, 3, use_relu=True, dtype=self.dtype,
                           name=f"mla_c{i}")(g, train)
                g = resize_bilinear_align_corners(
                    g, (g.shape[1] * 4, g.shape[2] * 4), fast=True
                )
                streams.append(g)
            f = jnp.concatenate(streams, axis=-1)
            seg = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                          name="cls")(f.astype(jnp.float32))
        seg = resize_bilinear_align_corners(seg, (in_h, in_w))
        return {"seg": seg}
