"""ViT encoder + SETR decoders, flax/NHWC — architecture-faithful.

Re-design of the reference SETR (lib/models/backbones/vit/setr.py:22-433,
transformer.py:5-119, position_encoding.py:25-41): ``SegmentationTransformer``
= linear patch embed + learned positional embedding + pre-norm transformer
encoder (qkv has NO bias, transformer.py:14; MLP GELU is the exact erf
variant), with decoders

  * Naive  (setr.py:191-219): 1x1 conv -> BN -> ReLU -> 1x1 cls conv ->
    bilinear x`patch` upsample (align_corners=False — nn.Upsample default);
  * PUP    (setr.py:255-294): five 1x1 convs (emb -> emb/4 -> ... -> classes)
    with x2 half-pixel upsamples between — no norm/activation at all;
  * MLA    (setr.py:330-433): four per-tap aggregation streams (1x1 emb->emb/2,
    running sum, 3x3 / 3x3->emb/4, x4 upsample), concat, 1x1 cls, x4 upsample.
    Taps are the RAW block outputs (no layernorm) at 1-indexed layers ``L``
    — intermediate key ``str(2L-1)`` (setr.py:352-361) — consumed deepest
    first (``all_keys.reverse()``, setr.py:362).

TPU-first: attention is one fused einsum chain per block over static
sequence lengths; the patch embed is the equivalent strided conv (MXU) of
the reference's unfold+Linear (setr.py:101-109 — identical tap ordering:
pixels row-major within a patch, channels fastest); all upsamples are the
separable matrix resizes from ops/resize.py (MXU matmuls, not gathers).

Weight import from reference checkpoints: utils/torch_import.py
``setr_{naive,pup,mla}`` mappers (forward parity pinned in
tests/test_torch_parity.py::test_setr_forward_parity_eval).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from contrastiveseg_tpu.models.layers import TorchBatchNorm
from contrastiveseg_tpu.ops.resize import resize_bilinear_half_pixel


@dataclasses.dataclass(frozen=True)
class ViTSpec:
    """Encoder hyperparameters (setr.py S/L/H factory trios, :436-721)."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    hidden_dim: int = 3072
    dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.1
    # 1-indexed encoder layers whose raw outputs feed the MLA decoder /
    # aux heads (reference ``aux_layers``).  SETR_MLA_S ships aux_layers=None
    # upstream, which makes its decode() assert — we default the small
    # variant to evenly spaced quarters instead (documented divergence).
    aux_layers: tuple[int, ...] = (3, 6, 9, 12)


VIT_SPECS = {
    # setr.py:436-465 (S), :468-497 (L), :500-529 (H) — shared by all decoders
    "vit_small": ViTSpec(embed_dim=768, depth=12, num_heads=12,
                         hidden_dim=3072, aux_layers=(3, 6, 9, 12)),
    "vit_base": ViTSpec(embed_dim=768, depth=12, num_heads=12,
                        hidden_dim=3072, aux_layers=(3, 6, 9, 12)),
    "vit_large": ViTSpec(embed_dim=1024, depth=24, num_heads=16,
                         hidden_dim=4096, aux_layers=(6, 12, 18, 24)),
    "vit_huge": ViTSpec(embed_dim=1280, depth=32, num_heads=16,
                        hidden_dim=5120, aux_layers=(8, 16, 24, 32)),
}


class SETRBlock(nn.Module):
    """One encoder block (transformer.py:99-115):
    x + Drop(Attn(LN(x))); x + FF(LN(x)).  qkv is bias-free
    (SelfAttention, transformer.py:14); LN eps matches torch (1e-5);
    GELU is exact erf (torch nn.GELU default)."""

    dim: int
    num_heads: int
    hidden_dim: int
    dropout_rate: float
    attn_dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        B, N, C = x.shape
        hd = C // self.num_heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * C, use_bias=False, dtype=self.dtype,
                       name="qkv")(h)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd ** -0.5)
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_dropout_rate, name="attn_drop")(
            attn, deterministic=not train)
        h = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        h = nn.Dense(C, dtype=self.dtype, name="proj")(h)
        h = nn.Dropout(self.attn_dropout_rate, name="proj_drop")(
            h, deterministic=not train)
        # PreNormDrop's outer dropout (transformer.py:61-69)
        h = nn.Dropout(self.dropout_rate, name="drop1")(
            h, deterministic=not train)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout_rate, name="drop_mid")(
            h, deterministic=not train)
        h = nn.Dense(C, dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(self.dropout_rate, name="drop2")(
            h, deterministic=not train)
        return x + h


class ViT(nn.Module):
    """SegmentationTransformer encoder (setr.py:93-118).

    Returns ``(final, taps)``: the pre_head_ln'd last layer as
    [B, H/p, W/p, D], plus the RAW (un-normalized) outputs of the
    1-indexed ``spec.aux_layers`` blocks, also patch-grid reshaped —
    exactly the reference's ``intmd_x[str(2L-1)]`` taps.
    """

    spec: ViTSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        s = self.spec
        p = s.patch_size
        B, H, W, _ = x.shape
        gh, gw = H // p, W // p
        # unfold+Linear (setr.py:101-109) == strided conv: both order a
        # patch's taps pixels-row-major, channels-fastest.
        x = nn.Conv(s.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="linear_encoding")(x)
        x = x.reshape(B, gh * gw, s.embed_dim)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (gh * gw, s.embed_dim),
        )  # LearnedPositionalEncoding (position_encoding.py:25-41)
        x = x + pos.astype(x.dtype)[None]
        x = nn.Dropout(s.dropout_rate, name="pe_dropout")(
            x, deterministic=not train)
        taps = []
        for i in range(s.depth):
            x = SETRBlock(
                s.embed_dim, s.num_heads, s.hidden_dim,
                s.dropout_rate, s.attn_dropout_rate, dtype=self.dtype,
                name=f"block{i}",
            )(x, train)
            if (i + 1) in s.aux_layers:
                taps.append(x.reshape(B, gh, gw, s.embed_dim))
        final = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="pre_head_ln")(x)
        return final.reshape(B, gh, gw, s.embed_dim), taps


class ViTFeatures(nn.Module):
    """backbone_selector adapter: the package-wide ``__call__(x, train) ->
    list of features`` contract.  Yields the raw aux-layer taps with the
    deepest replaced by the pre_head_ln'd final output (all patch-grid
    resolution — ViT is columnar, not pyramidal)."""

    spec: ViTSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> list[jnp.ndarray]:
        final, taps = ViT(self.spec, dtype=self.dtype, name="vit")(x, train)
        return taps[:-1] + [final] if taps else [final]


class SETR(nn.Module):
    """SETR Naive / PUP / MLA (setr.py SETR_Naive/SETR_PUP/SETR_MLA)."""

    num_classes: int
    arch: str = "vit_base"
    decoder: str = "pup"  # naive | pup | mla
    spec: ViTSpec | None = None  # overrides VIT_SPECS[arch] (tests/custom)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        spec = self.spec if self.spec is not None else VIT_SPECS[self.arch]
        emb = spec.embed_dim
        f, taps = ViT(spec, dtype=self.dtype, name="backbone")(
            x.astype(self.dtype), train
        )
        conv = lambda ch, k, name: nn.Conv(  # noqa: E731 — biased torch conv
            ch, (k, k), padding=[((k - 1) // 2,) * 2] * 2, name=name)
        up = resize_bilinear_half_pixel
        if self.decoder == "naive":
            # setr.py:191-219: conv1 -> bn1 -> relu -> conv2 -> x`patch` up
            h = conv(emb, 1, "conv1")(f.astype(jnp.float32))
            h = nn.relu(TorchBatchNorm(name="bn1")(h, train))
            seg = conv(self.num_classes, 1, "conv2")(h)
            seg = up(seg, (seg.shape[1] * spec.patch_size,
                           seg.shape[2] * spec.patch_size))
        elif self.decoder == "pup":
            # setr.py:255-294: 1x1 convs emb -> emb/4 x4 -> classes with x2
            # half-pixel upsamples between — no BN/activation upstream.
            h = f.astype(jnp.float32)
            chans = [emb // 4] * 4 + [self.num_classes]
            for i, ch in enumerate(chans):
                h = conv(ch, 1, f"pup{i}")(h)
                if i != 4:
                    h = up(h, (h.shape[1] * 2, h.shape[2] * 2))
            seg = h
        else:  # mla — setr.py:352-433
            assert len(taps) == 4, "MLA needs 4 aux taps"
            ordered = taps[::-1]  # deepest first (all_keys.reverse())
            outs = []
            run = None
            for k, t in enumerate(ordered):
                t = t.astype(jnp.float32)
                cin = conv(emb // 2, 1, f"mla{k}_in")(t)
                run = cin if run is None else cin + run
                h = run if k == 0 else conv(
                    emb // 2, 3, f"mla{k}_intmd")(run)
                h = conv(emb // 2, 3, f"mla{k}_out1")(h)
                h = conv(emb // 4, 3, f"mla{k}_out2")(h)
                outs.append(up(h, (h.shape[1] * 4, h.shape[2] * 4)))
            h = jnp.concatenate(outs, axis=-1)
            seg = conv(self.num_classes, 1, "cls")(h)
            seg = up(seg, (seg.shape[1] * 4, seg.shape[2] * 4))
        return {"seg": seg}
