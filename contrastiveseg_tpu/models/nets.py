"""Complete segmentation networks and the model registry.

Reference registry: SEG_MODEL_DICT (lib/models/model_manager.py:48-82).
Output contract mirrors the reference nets (lib/models/nets/hrnet.py):

  * plain nets return ``{"seg": full-resolution logits}``;
  * contrast nets return ``{"seg": stride-4 logits, "embed": L2-normalized
    stride-4 projections}`` — the loss upsamples seg to label size;
  * the reference's HRNet_W48_MEM (nets/hrnet.py:153-188) differs from
    CONTRAST only by its queue *buffers*; here queues live in the train
    state (engine/state.py), so ``hrnet_w48_mem`` maps to the same module
    and the trainer wires the queues — a cleaner functional split.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from contrastiveseg_tpu.models.heads import ASPP, ClsHead, ProjectionHead
from contrastiveseg_tpu.models.hrnet import HRNET_SPECS, HRNet
from contrastiveseg_tpu.models.layers import ConvBN
from contrastiveseg_tpu.models.resnet import RESNET_SPECS, ResNet
from contrastiveseg_tpu.ops.resize import resize_bilinear_align_corners
from contrastiveseg_tpu.utils.registry import Registry

MODELS = Registry("models")


class HRNetSeg(nn.Module):
    """HRNet-W* semantic segmentor (reference HRNet_W48, nets/hrnet.py:24-56)."""

    num_classes: int
    arch: str = "hrnet48"
    with_proj: bool = False
    proj_dim: int = 256
    upsample_out: bool = True  # plain net upsamples to input size
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        in_h, in_w = x.shape[1], x.shape[2]
        feats = HRNet(HRNET_SPECS[self.arch], dtype=self.dtype, name="backbone")(
            x.astype(self.dtype), train
        )
        h, w = feats[0].shape[1], feats[0].shape[2]
        cat = jnp.concatenate(
            [feats[0]]
            + [resize_bilinear_align_corners(f, (h, w), fast=True) for f in feats[1:]],
            axis=-1,
        )
        out: dict[str, jnp.ndarray] = {}
        seg = ClsHead(self.num_classes, cat.shape[-1], dtype=self.dtype,
                      name="cls_head")(cat, train)
        if self.with_proj:
            out["embed"] = ProjectionHead(self.proj_dim, dtype=self.dtype,
                                          name="proj_head")(cat, train)
            out["seg"] = seg  # stride-4; loss upsamples (nets/hrnet.py:92-95)
        else:
            out["seg"] = (
                resize_bilinear_align_corners(seg, (in_h, in_w))
                if self.upsample_out else seg
            )
        return out


class HRNetOCRSeg(nn.Module):
    """HRNet-W48 + OCR head (reference HRNET_W48_OCR[_CONTRAST],
    nets/hrnet.py:98-150,191-250).

    aux head on the 720-ch concat -> SpatialGather over aux probs ->
    SpatialOCR distribute -> cls head.  Contrast variant projects the
    720-ch concat features.
    """

    num_classes: int
    arch: str = "hrnet48"
    with_proj: bool = False
    proj_dim: int = 256
    mid_channels: int = 512
    key_channels: int = 256
    upsample_out: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        from contrastiveseg_tpu.models.ocr import SpatialGather, SpatialOCR

        in_h, in_w = x.shape[1], x.shape[2]
        feats = HRNet(HRNET_SPECS[self.arch], dtype=self.dtype, name="backbone")(
            x.astype(self.dtype), train
        )
        h, w = feats[0].shape[1], feats[0].shape[2]
        cat = jnp.concatenate(
            [feats[0]]
            + [resize_bilinear_align_corners(f, (h, w), fast=True) for f in feats[1:]],
            axis=-1,
        )
        out: dict[str, jnp.ndarray] = {}
        # Aux head: 3x3 conv + BNReLU + 1x1 (nets/hrnet.py:121-125).
        aux = ConvBN(cat.shape[-1], 3, use_relu=True, dtype=self.dtype,
                     name="aux_conv")(cat, train)
        aux = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                      dtype=jnp.float32, name="aux_cls")(aux.astype(jnp.float32))
        if self.with_proj:
            out["embed"] = ProjectionHead(self.proj_dim, dtype=self.dtype,
                                          name="proj_head")(cat, train)
        feats3 = ConvBN(self.mid_channels, 3, use_relu=True, dtype=self.dtype,
                        name="conv3x3")(cat, train)
        context = SpatialGather(name="ocr_gather")(feats3, aux)
        feats3 = SpatialOCR(
            key_channels=self.key_channels, out_channels=self.mid_channels,
            dropout=0.05, dtype=self.dtype, name="ocr_distri",
        )(feats3, context, train)
        seg = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                      dtype=jnp.float32, name="cls")(feats3.astype(jnp.float32))
        if not self.with_proj and self.upsample_out:
            seg = resize_bilinear_align_corners(seg, (in_h, in_w))
            aux = resize_bilinear_align_corners(aux, (in_h, in_w))
        out["seg"] = seg
        out["seg_aux"] = aux
        return out


class SpatialOCRNet(nn.Module):
    """Dilated ResNet + OCR (reference nets/ocrnet.py:19-69):
    aux DSN on layer3; 3x3 conv 2048->512; gather+distribute; cls."""

    num_classes: int
    arch: str = "resnet101_dilated8"
    upsample_out: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        from contrastiveseg_tpu.models.ocr import SpatialGather, SpatialOCR

        in_h, in_w = x.shape[1], x.shape[2]
        feats = ResNet(RESNET_SPECS[self.arch], dtype=self.dtype, name="backbone")(
            x.astype(self.dtype), train
        )
        c3, c4 = feats[-2], feats[-1]
        aux = ConvBN(512, 3, use_relu=True, dtype=self.dtype,
                     name="dsn_conv")(c3, train)
        aux = nn.Dropout(0.05, deterministic=not train, name="dsn_drop")(aux)
        aux = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                      name="dsn_cls")(aux.astype(jnp.float32))
        f = ConvBN(512, 3, use_relu=True, dtype=self.dtype,
                   name="conv3x3")(c4, train)
        context = SpatialGather(name="ocr_gather")(f, aux)
        f = SpatialOCR(key_channels=256, out_channels=512, dropout=0.05,
                       dtype=self.dtype, name="ocr_distri")(f, context, train)
        seg = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                      name="cls")(f.astype(jnp.float32))
        if self.upsample_out:
            seg = resize_bilinear_align_corners(seg, (in_h, in_w))
            aux = resize_bilinear_align_corners(aux, (in_h, in_w))
        return {"seg": seg, "seg_aux": aux}


class DeepLabV3(nn.Module):
    """DeepLab-V3 on dilated-8 ResNet (reference nets/deeplab.py:8-64).

    Aux DSN head on layer3 (stride-8, 1024ch); main head = ASPP on layer4.
    Contrast variant projects layer4 features (deeplab.py DeepLabV3Contrast).
    """

    num_classes: int
    arch: str = "resnet101_dilated8"
    with_proj: bool = False
    proj_dim: int = 256
    upsample_out: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        in_h, in_w = x.shape[1], x.shape[2]
        feats = ResNet(RESNET_SPECS[self.arch], dtype=self.dtype, name="backbone")(
            x.astype(self.dtype), train
        )
        c3, c4 = feats[-2], feats[-1]
        out: dict[str, jnp.ndarray] = {}
        # Aux (DSN) head: 3x3 conv 512 + dropout + 1x1 cls (decoder_block.py:151-179).
        aux = ConvBN(512, 3, use_relu=True, dtype=self.dtype, name="dsn_conv")(
            c3, train
        )
        aux = nn.Dropout(0.1, deterministic=not train, name="dsn_drop")(aux)
        aux = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                      name="dsn_cls")(aux.astype(jnp.float32))
        a = ASPP(256, dtype=self.dtype, name="aspp")(c4, train)
        seg = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                      name="cls")(a.astype(jnp.float32))
        if self.with_proj:
            out["embed"] = ProjectionHead(self.proj_dim, dtype=self.dtype,
                                          name="proj_head")(c4, train)
            out["seg"] = seg
            out["seg_aux"] = aux
        elif self.upsample_out:
            out["seg"] = resize_bilinear_align_corners(seg, (in_h, in_w))
            out["seg_aux"] = resize_bilinear_align_corners(aux, (in_h, in_w))
        else:
            out["seg"] = seg
            out["seg_aux"] = aux
        return out


def _hrnet_variant(arch: str, **defaults):
    def build(cfg) -> nn.Module:
        dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32
        return HRNetSeg(
            num_classes=cfg.get("data.num_classes"),
            arch=arch,
            proj_dim=cfg.get("contrast.proj_dim", default=256),
            dtype=dtype,
            **defaults,
        )

    return build


def _deeplab_variant(**defaults):
    def build(cfg) -> nn.Module:
        dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32
        return DeepLabV3(
            num_classes=cfg.get("data.num_classes"),
            arch=cfg.get("network.backbone", default="resnet101_dilated8")
            .replace("deepbase_", ""),
            proj_dim=cfg.get("contrast.proj_dim", default=256),
            dtype=dtype,
            **defaults,
        )

    return build


for _w in (18, 32, 48, 64):
    MODELS.register(f"hrnet_w{_w}")(_hrnet_variant(f"hrnet{_w}"))
    MODELS.register(f"hrnet_w{_w}_contrast")(
        _hrnet_variant(f"hrnet{_w}", with_proj=True)
    )
    # mem == contrast at the module level; queues live in the train state.
    MODELS.register(f"hrnet_w{_w}_mem")(_hrnet_variant(f"hrnet{_w}", with_proj=True))

MODELS.register("deeplab_v3")(_deeplab_variant())
MODELS.register("deeplab_v3_contrast")(_deeplab_variant(with_proj=True))


def _hrnet_ocr_variant(arch: str, **defaults):
    def build(cfg) -> nn.Module:
        dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32
        return HRNetOCRSeg(
            num_classes=cfg.get("data.num_classes"),
            arch=arch,
            proj_dim=cfg.get("contrast.proj_dim", default=256),
            dtype=dtype,
            **defaults,
        )

    return build


for _w in (18, 32, 48, 64):
    MODELS.register(f"hrnet_w{_w}_ocr")(_hrnet_ocr_variant(f"hrnet{_w}"))
    MODELS.register(f"hrnet_w{_w}_ocr_contrast")(
        _hrnet_ocr_variant(f"hrnet{_w}", with_proj=True)
    )


@MODELS.register("spatial_ocrnet")
def _spatial_ocrnet(cfg) -> nn.Module:
    dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32
    return SpatialOCRNet(
        num_classes=cfg.get("data.num_classes"),
        arch=cfg.get("network.backbone", default="resnet101_dilated8")
        .replace("deepbase_", ""),
        dtype=dtype,
    )


def build_model(cfg) -> nn.Module:
    """ModelManager.semantic_segmentor equivalent (model_manager.py:85-98)."""
    return MODELS.build(cfg.get("network.model_name"), cfg)
