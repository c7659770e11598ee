"""CE2P human-parsing nets (edge branch + decoder + context head).

Re-design of the reference CE2P family (lib/models/nets/ce2pnet.py:19-262)
and its modules: Edge_Module (modules/edge_block.py:17-56),
CE2P_Decoder_Module (modules/decoder_block.py:210-239).  Output contract:
``{"seg": decoder seg, "edge": 2ch edge logits, "seg_aux": dsn,
"seg_final": cls-on-(decoder+edge) }`` — all upsampled to input size,
matching the reference 4-tuple (seg_out1, edge_out, seg_dsn, seg_out2).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from contrastiveseg_tpu.models.attention import PSPModule
from contrastiveseg_tpu.models.layers import ConvBN
from contrastiveseg_tpu.models.ocr import SpatialGather, SpatialOCR, SpatialOCRASP
from contrastiveseg_tpu.models.resnet import RESNET_SPECS, ResNet
from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners


class EdgeModule(nn.Module):
    """Multi-level edge prediction (edge_block.py:17-56)."""

    mid_fea: int = 256
    out_fea: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, x3, train: bool):
        h, w = x1.shape[1], x1.shape[2]
        edge_cls = nn.Conv(self.out_fea, (3, 3), padding=1, use_bias=True,
                           dtype=jnp.float32, name="conv4")
        feas, edges = [], []
        for i, x in enumerate((x1, x2, x3)):
            fea = ConvBN(self.mid_fea, 1, use_relu=True, dtype=self.dtype,
                         name=f"conv{i + 1}")(x, train)
            edge = edge_cls(fea.astype(jnp.float32))
            if i > 0:
                fea = resize_bilinear_align_corners(fea, (h, w), fast=True)
                edge = resize_bilinear_align_corners(edge, (h, w))
            feas.append(fea)
            edges.append(edge)
        edge = nn.Conv(self.out_fea, (1, 1), use_bias=True, dtype=jnp.float32,
                       name="conv5")(jnp.concatenate(edges, axis=-1))
        return edge, jnp.concatenate(feas, axis=-1)


class CE2PDecoder(nn.Module):
    """High-level + low-level fusion decoder (decoder_block.py:210-239)."""

    num_classes: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xt, xl, train: bool):
        h, w = xl.shape[1], xl.shape[2]
        xt = ConvBN(256, 1, use_relu=True, dtype=self.dtype,
                    name="conv1")(xt, train)
        xt = resize_bilinear_align_corners(xt, (h, w), fast=True)
        xl = ConvBN(48, 1, use_relu=True, dtype=self.dtype,
                    name="conv2")(xl, train)
        x = jnp.concatenate([xt, xl], axis=-1)
        x = ConvBN(256, 1, use_relu=True, dtype=self.dtype, name="conv3a")(x, train)
        x = ConvBN(256, 1, use_relu=True, dtype=self.dtype, name="conv3b")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train, name="drop")(x)
        seg = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                      dtype=jnp.float32, name="conv4")(x.astype(jnp.float32))
        return seg, x


class CE2PNet(nn.Module):
    """CE2P with pluggable context: asp_ocr | ocr | ideal (gt) variants."""

    num_classes: int
    context: str = "asp_ocr"  # asp_ocr | ocr | psp
    arch: str = "resnet101_dilated8"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        in_h, in_w = x.shape[1], x.shape[2]
        feats = ResNet(RESNET_SPECS[self.arch], dtype=self.dtype, name="backbone")(
            x.astype(self.dtype), train
        )
        c1, c2, c3, c4 = feats[-4], feats[-3], feats[-2], feats[-1]

        # DSN aux on layer3.
        dsn = ConvBN(512, 3, use_relu=True, dtype=self.dtype,
                     name="dsn_conv")(c3, train)
        dsn = nn.Dropout(0.1, deterministic=not train, name="dsn_drop")(dsn)
        dsn = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                      dtype=jnp.float32, name="dsn_cls")(dsn.astype(jnp.float32))

        edge, edge_fea = EdgeModule(dtype=self.dtype, name="edge")(
            c1, c2, c3, train
        )

        # Context head on layer4 conditioned on the dsn probs.
        if self.context == "asp_ocr":
            # CE2P_ASPOCR (ce2pnet.py:48-53): SpatialOCR_ASP_Module
            # (2048 -> 256 hidden, out 512, dilations 6/12/18) driven by
            # the dsn logits.
            f = SpatialOCRASP(hidden=256, out_channels=512,
                              dilations=(6, 12, 18), dtype=self.dtype,
                              name="context")(c4, dsn, train)
        elif self.context == "ocr":
            # Reference CE2P_OCRNet / CE2P_IdealOCRNet are INEXECUTABLE:
            # they call Decoder_Module(num_classes, dropout=...) but
            # Decoder_Module's signature is (bn_type, inplane1, inplane2,
            # outplane) (decoder_block.py:182-184) -> TypeError at
            # construction; the lip ce2p_ocr/gt_ocrnet run scripts cannot
            # have produced checkpoints.  This branch is our executable
            # re-specification of the evident intent.
            f = ConvBN(512, 3, use_relu=True, dtype=self.dtype,
                       name="conv3x3")(c4, train)
            dsn_at_f = resize_bilinear_align_corners(dsn, (f.shape[1], f.shape[2]))
            ctx = SpatialGather(name="ocr_gather")(f, dsn_at_f)
            f = SpatialOCR(key_channels=256, out_channels=512, dropout=0.05,
                           dtype=self.dtype, name="ocr_distri")(f, ctx, train)
        else:
            f = PSPModule(512, dtype=self.dtype, name="context")(c4, train)

        seg1, dec_fea = CE2PDecoder(self.num_classes, dtype=self.dtype,
                                    name="decoder")(f, c1, train)
        fused = jnp.concatenate(
            [dec_fea, resize_bilinear_align_corners(
                edge_fea, (dec_fea.shape[1], dec_fea.shape[2]), fast=True)],
            axis=-1,
        )
        seg2 = ConvBN(256, 1, use_relu=True, dtype=self.dtype,
                      name="final_conv")(fused, train)
        seg2 = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                       dtype=jnp.float32, name="final_cls")(
            seg2.astype(jnp.float32)
        )

        size = (in_h, in_w)
        return {
            "seg": resize_bilinear_align_corners(seg1, size),
            "edge": resize_bilinear_align_corners(edge, size),
            "seg_aux": resize_bilinear_align_corners(dsn, size),
            "seg_final": resize_bilinear_align_corners(seg2, size),
        }
