"""Pyramid Vision Transformer backbones (PVT / PCPVT / SVT), flax/NHWC.

Re-design of lib/models/backbones/pvt/{pvt,pcpvt,svt}_backbone.py (~1050
LoC torch): four stages of (patch merge -> transformer blocks with
spatial-reduction attention).  PCPVT adds conditional position encoding
(3x3 depthwise PosCNN after the first block of each stage); SVT (Twins)
interleaves locally-grouped attention with global sub-sampled attention.
Returns the 4-scale feature pyramid (strides 4/8/16/32).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class PVTSpec:
    dims: tuple[int, ...] = (64, 128, 320, 512)
    depths: tuple[int, ...] = (3, 4, 6, 3)
    heads: tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: tuple[int, ...] = (8, 4, 2, 1)
    mlp_ratios: tuple[float, ...] = (8.0, 8.0, 4.0, 4.0)
    pos_cnn: bool = False  # PCPVT conditional position encoding
    local_windows: tuple[int, ...] | None = None  # SVT locally-grouped attn
    # PVT v1's learnable absolute position embeddings, one per stage,
    # bilinear-resized to the running resolution (pvt_backbone.py:150-215).
    abs_pos_embed: bool = False


PVT_SPECS = {
    # pvt_backbone.py:277-333 factories.
    "pvt_tiny": PVTSpec(depths=(2, 2, 2, 2), abs_pos_embed=True),
    "pvt_small": PVTSpec(abs_pos_embed=True),
    "pvt_medium": PVTSpec(depths=(3, 4, 18, 3), abs_pos_embed=True),
    "pvt_large": PVTSpec(depths=(3, 8, 27, 3), abs_pos_embed=True),
    # pcpvt_backbone.py:318-326: same depth tables + PosCNN.
    "pcpvt_tiny": PVTSpec(depths=(2, 2, 2, 2), pos_cnn=True),
    "pcpvt_small": PVTSpec(pos_cnn=True),
    "pcpvt_medium": PVTSpec(depths=(3, 4, 18, 3), pos_cnn=True),
    "pcpvt_base": PVTSpec(depths=(3, 4, 18, 3), pos_cnn=True),  # alias
    "pcpvt_large": PVTSpec(depths=(3, 8, 27, 3), pos_cnn=True),
    # svt_backbone.py:305-341 (Twins-SVT).
    "svt_small": PVTSpec(dims=(64, 128, 256, 512), heads=(2, 4, 8, 16),
                         depths=(2, 2, 10, 4), pos_cnn=True,
                         local_windows=(7, 7, 7, 7),
                         mlp_ratios=(4.0, 4.0, 4.0, 4.0)),
    "svt_base": PVTSpec(dims=(96, 192, 384, 768), heads=(3, 6, 12, 24),
                        depths=(2, 2, 18, 2), pos_cnn=True,
                        local_windows=(7, 7, 7, 7),
                        mlp_ratios=(4.0, 4.0, 4.0, 4.0)),
    "svt_large": PVTSpec(dims=(128, 256, 512, 1024), heads=(4, 8, 16, 32),
                         depths=(2, 2, 18, 2), pos_cnn=True,
                         local_windows=(7, 7, 7, 7),
                         mlp_ratios=(4.0, 4.0, 4.0, 4.0)),
}


class SRAttention(nn.Module):
    """Spatial-reduction attention: keys/values from an sr x sr strided
    conv of the map (pvt_backbone.py Attention)."""

    dim: int
    num_heads: int
    sr_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        B, H, W, C = x.shape
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x).reshape(
            B, H * W, self.num_heads, -1
        )
        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(
                C, (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio), dtype=self.dtype,
                name="sr",
            )(x)
            kv_in = nn.LayerNorm(dtype=self.dtype, name="sr_norm")(kv_in)
        kh, kw = kv_in.shape[1], kv_in.shape[2]
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(kv_in).reshape(
            B, kh * kw, self.num_heads, -1
        )
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(kv_in).reshape(
            B, kh * kw, self.num_heads, -1
        )
        scale = (self.dim // self.num_heads) ** -0.5
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         preferred_element_type=jnp.float32) * scale
        att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class LocalAttention(nn.Module):
    """Locally-grouped attention within wxw windows (SVT/Twins LSA)."""

    dim: int
    num_heads: int
    window: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        B, H, W, C = x.shape
        w = self.window
        ph, pw = (-H) % w, (-W) % w
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        Hp, Wp = H + ph, W + pw
        xw = x.reshape(B, Hp // w, w, Wp // w, w, C).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(-1, w * w, C)
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(xw)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.dim // self.num_heads
        q = q.reshape(-1, w * w, self.num_heads, hd)
        k = k.reshape(-1, w * w, self.num_heads, hd)
        v = v.reshape(-1, w * w, self.num_heads, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                         preferred_element_type=jnp.float32) * hd ** -0.5
        if ph or pw:
            # Padded-position masking (GroupAttention, svt_backbone.py:
            # 60-73): -1000 wherever query/key padded-ness differs.  The
            # reference's `mask[:, -pad:, :]` uses `-0:` when one pad is
            # zero — that fills the WHOLE mask and disables masking; the
            # quirk is replicated for parity.
            import numpy as _np

            m = _np.zeros((Hp, Wp), _np.float32)
            m[Hp - ph if ph > 0 else 0:, :] = 1
            m[:, Wp - pw if pw > 0 else 0:] = 1
            m = m.reshape(Hp // w, w, Wp // w, w).transpose(0, 2, 1, 3)
            m = m.reshape(-1, w * w)  # [n_windows, w*w]
            bias = m[:, None, :] - m[:, :, None]  # key - query
            bias = _np.where(bias != 0.0, -1000.0, 0.0).astype(_np.float32)
            nw = bias.shape[0]
            att = att.reshape(B, nw, self.num_heads, w * w, w * w)
            att = att + jnp.asarray(bias)[None, :, None]
            att = att.reshape(-1, self.num_heads, w * w, w * w)
        att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(B, Hp // w, Wp // w, w, w, C).transpose(
            0, 1, 3, 2, 4, 5
        ).reshape(B, Hp, Wp, C)
        out = out[:, :H, :W, :]
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class PVTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: float
    local_window: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.local_window:
            h = LocalAttention(self.dim, self.num_heads, self.local_window,
                               dtype=self.dtype, name="attn")(h, train)
        else:
            h = SRAttention(self.dim, self.num_heads, self.sr_ratio,
                            dtype=self.dtype, name="attn")(h, train)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class PVT(nn.Module):
    """Returns 4 feature maps at strides 4/8/16/32.

    ``img_size`` sets the canonical grid of the v1 absolute position
    embeddings (the reference reads train input_size[0],
    pvt_backbone.py:277-280); they are bilinear-resized (half-pixel,
    like torch's align_corners=False) to the running resolution."""

    spec: PVTSpec
    img_size: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> list[jnp.ndarray]:
        s = self.spec
        feats = []
        for stage in range(4):
            patch = 4 if stage == 0 else 2
            x = nn.Conv(
                s.dims[stage], (patch, patch), strides=(patch, patch),
                dtype=self.dtype, name=f"patch{stage}",
            )(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"patch_norm{stage}")(x)
            if s.abs_pos_embed:
                g = self.img_size // (4 * (1 << stage))
                pe = self.param(
                    f"pos_embed{stage}",
                    nn.initializers.truncated_normal(0.02),
                    (1, g, g, s.dims[stage]), jnp.float32,
                )
                if (g, g) != (x.shape[1], x.shape[2]):
                    import jax.image

                    pe = jax.image.resize(
                        pe, (1, x.shape[1], x.shape[2], s.dims[stage]),
                        method="linear", antialias=False)
                x = x + pe.astype(x.dtype)
            for b in range(s.depths[stage]):
                # SVT interleaves local / global attention.
                lw = None
                if s.local_windows is not None and b % 2 == 0:
                    lw = s.local_windows[stage]
                x = PVTBlock(
                    s.dims[stage], s.heads[stage], s.sr_ratios[stage],
                    s.mlp_ratios[stage], local_window=lw, dtype=self.dtype,
                    name=f"stage{stage}_block{b}",
                )(x, train)
                if b == 0 and s.pos_cnn:
                    # PosCNN: 3x3 depthwise conv residual (PCPVT).
                    pe = nn.Conv(
                        s.dims[stage], (3, 3), padding=1,
                        feature_group_count=s.dims[stage], dtype=self.dtype,
                        name=f"pos_cnn{stage}",
                    )(x)
                    x = x + pe
            feats.append(x)
        return feats
