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

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrastiveseg_tpu.models.heads import ASPP, ClsHead, ProjectionHead
from contrastiveseg_tpu.models.hrnet import HRNET_SPECS, HRNet
from contrastiveseg_tpu.models.layers import ConvBN
from contrastiveseg_tpu.models.resnet import RESNET_SPECS, ResNet, resolve_arch
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
    remat: bool = False
    remat_stem: bool = False
    remat_scope: str = "stem_layer1"
    # Reference env-var flags (hrnet_backbone.py:303,547,557) — see HRNet.
    full_res_stem: bool = False
    drop_stage4: bool = False
    keep_imagenet_head: bool = False
    pallas_conv: bool = False
    # Pad sub-64 branch widths to 64 (models/hrnet.py lane_pad_spec) — a
    # TPU-layout variant, measured via bench.py --lane-pad.
    lane_pad: bool = False
    # Dropout2d(0.10) in the reference cls_head (nets/hrnet.py:76); the
    # trajectory-parity test zeroes it on both sides for determinism.
    head_dropout: float = 0.10
    # Checkpoint the 4-branch concat (recompute-from-branches in the
    # backward) — memory lever measured via bench.py --remat-concat.
    remat_concat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        from contrastiveseg_tpu.models.hrnet import lane_pad_spec

        in_h, in_w = x.shape[1], x.shape[2]
        if self.arch in HRNET_SPECS:
            spec = HRNET_SPECS[self.arch]
            if self.lane_pad:
                spec = lane_pad_spec(spec)
            feats = HRNet(spec, dtype=self.dtype,
                          remat=self.remat, remat_stem=self.remat_stem,
                          remat_scope=self.remat_scope,
                          full_res_stem=self.full_res_stem,
                          drop_stage4=self.drop_stage4,
                          keep_imagenet_head=self.keep_imagenet_head,
                          pallas_conv=self.pallas_conv,
                          name="backbone")(
                x.astype(self.dtype), train
            )
        else:  # hrnet2x20-style HighResolutionNext archs
            from contrastiveseg_tpu.models.hrnet import HRNetNext

            feats = HRNetNext(arch=self.arch, dtype=self.dtype,
                              name="backbone")(x.astype(self.dtype), train)
        h, w = feats[0].shape[1], feats[0].shape[2]

        def _fuse(branches):
            return jnp.concatenate(
                [branches[0]]
                + [resize_bilinear_align_corners(f, (h, w), fast=True)
                   for f in branches[1:]],
                axis=-1,
            )

        if self.remat_concat and train:
            # Don't store the 720-ch stride-4 concat (378 MB bf16 at
            # 512x1024 batch 8, consumed by BOTH heads): recompute it in
            # the backward from the (much smaller, 47 MB total) branch
            # outputs via the cheap fuse resizes.
            cat = jax.checkpoint(_fuse)(list(feats))
        else:
            cat = _fuse(list(feats))
        out: dict[str, jnp.ndarray] = {}
        seg = ClsHead(self.num_classes, cat.shape[-1], dtype=self.dtype,
                      dropout=self.head_dropout, name="cls_head")(cat, train)
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
    # aux 3x3 width: the 720-ch concat for OCR/OCR_CONTRAST
    # (hrnet.py:121-125, in->in) but 256 for OCR_B (hrnet.py:271-274).
    aux_channels: int | None = None
    upsample_out: bool = True
    # HANet height attention per branch before fusion (hrnet_w48_ocr_b_ha,
    # nets/hrnet.py:301-365; see HANetConv for the reference-bug note).
    height_attention: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        from contrastiveseg_tpu.models.ocr import SpatialGather, SpatialOCR

        in_h, in_w = x.shape[1], x.shape[2]
        feats = HRNet(HRNET_SPECS[self.arch], dtype=self.dtype, name="backbone")(
            x.astype(self.dtype), train
        )
        if self.height_attention:
            from contrastiveseg_tpu.models.attention import HANetConv

            feats = [
                f + HANetConv(f.shape[-1], dtype=self.dtype, name=f"ha{i + 1}")(
                    f, train)
                for i, f in enumerate(feats)
            ]
        h, w = feats[0].shape[1], feats[0].shape[2]
        cat = jnp.concatenate(
            [feats[0]]
            + [resize_bilinear_align_corners(f, (h, w), fast=True) for f in feats[1:]],
            axis=-1,
        )
        out: dict[str, jnp.ndarray] = {}
        # Aux head: 3x3 conv + BNReLU + 1x1 (nets/hrnet.py:121-125).
        aux = ConvBN(self.aux_channels or cat.shape[-1], 3, use_relu=True,
                     dtype=self.dtype, name="aux_conv")(cat, train)
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
        # DeepLabHead (decoder_block.py:151-179): layer_dsn = 3x3 conv 256
        # + BNReLU + 1x1 cls; layer_aspp = ASPPModule(2048, 512);
        # refine = 3x3 conv 512 + BN (no ReLU) + 1x1 cls.
        aux = ConvBN(256, 3, use_relu=True, dtype=self.dtype, name="dsn_conv")(
            c3, train
        )
        aux = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                      name="dsn_cls")(aux.astype(jnp.float32))
        a = ASPP(512, dtype=self.dtype, name="aspp")(c4, train)
        a = ConvBN(512, 3, use_relu=False, dtype=self.dtype,
                   name="refine")(a, train)
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
            remat=cfg.get("network.remat", default=False),
            remat_stem=cfg.get("network.remat_stem", default=False),
            remat_scope=cfg.get(
                "network.remat_scope", default="stem_layer1"),
            full_res_stem=cfg.get("network.full_res_stem", default=False),
            drop_stage4=cfg.get("network.drop_stage4", default=False),
            keep_imagenet_head=cfg.get(
                "network.keep_imagenet_head", default=False),
            pallas_conv=cfg.get("network.pallas_conv", default=False),
            lane_pad=cfg.get("network.lane_pad", default=False),
            head_dropout=cfg.get("network.head_dropout", default=0.10),
            remat_concat=cfg.get("network.remat_concat", default=False),
            dtype=dtype,
            **defaults,
        )

    return build


def _deeplab_variant(**defaults):
    def build(cfg) -> nn.Module:
        dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32
        return DeepLabV3(
            num_classes=cfg.get("data.num_classes"),
            arch=resolve_arch(
                cfg.get("network.backbone", default="resnet101_dilated8")),
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
# HighResolutionNext backbone (hrnet_backbone.py:791-798).
MODELS.register("hrnet2x20")(_hrnet_variant("hrnet2x20"))

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
    # OCR "B": cheaper 256-ch head, 128 key channels (nets/hrnet.py:249-299).
    MODELS.register(f"hrnet_w{_w}_ocr_b")(
        _hrnet_ocr_variant(f"hrnet{_w}", mid_channels=256, key_channels=128,
                           aux_channels=256)
    )
    # + HANet height attention (nets/hrnet.py:301-365, model_manager.py:81).
    MODELS.register(f"hrnet_w{_w}_ocr_b_ha")(
        _hrnet_ocr_variant(f"hrnet{_w}", mid_channels=256, key_channels=128,
                           aux_channels=256, height_attention=True)
    )


class ResNetContextNet(nn.Module):
    """Dilated ResNet + pluggable context head + DSN aux.

    Covers the reference's fcnet (nets/fcnet.py:21-105), base_ocnet /
    asp_ocnet (nets/ocnet.py:18-100), isanet (nets/isanet.py:9-44) and
    spatial_asp_ocrnet, which differ only in the context module applied to
    the layer4 features.
    """

    num_classes: int
    context: str = "none"  # none | base_oc | asp_oc | isa | psp | cc | pyramid_oc
    arch: str = "resnet101_dilated8"
    upsample_out: bool = True
    # fcnet_wo_dsn (reference nets/fcnet.py:72-105): same head, no DSN aux.
    with_aux: bool = True
    # fcnet's 1x1 cls convs are bias=False and its dsn dropout is 0.10
    # (fcnet.py:36-47); the OC/ISA nets use bias=True / 0.05.
    cls_bias: bool = True
    dsn_dropout: float = 0.05
    # ISA_Module down_factors (the reference's network.factors).
    isa_factors: tuple = ((8, 8),)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        from contrastiveseg_tpu.models.attention import (
            ASPOCModule,
            BaseOCModule,
            ISAModule,
            PSPModule,
            PyramidOCModule,
        )

        in_h, in_w = x.shape[1], x.shape[2]
        feats = ResNet(RESNET_SPECS[self.arch], dtype=self.dtype, name="backbone")(
            x.astype(self.dtype), train
        )
        c3, c4 = feats[-2], feats[-1]
        aux = None
        if self.with_aux:
            aux = ConvBN(512, 3, use_relu=True, dtype=self.dtype,
                         name="dsn_conv")(c3, train)
            aux = nn.Dropout(self.dsn_dropout, deterministic=not train,
                             name="dsn_drop")(aux)
            aux = nn.Conv(self.num_classes, (1, 1), use_bias=self.cls_bias,
                          dtype=jnp.float32,
                          name="dsn_cls")(aux.astype(jnp.float32))

        if self.context == "pyramid_oc":
            f = ConvBN(512, 3, use_relu=True, dtype=self.dtype,
                       name="conv3x3")(c4, train)
            f = PyramidOCModule(out_channels=512, dtype=self.dtype,
                                name="context")(f, train)
        elif self.context == "asp_oc":
            # AspOCNet (ocnet.py:80-86): 3x3 ConvBN 2048->512 then
            # ASP_OC_Module(512, 256) whose project emits 512.
            f = ConvBN(512, 3, use_relu=True, dtype=self.dtype,
                       name="conv3x3")(c4, train)
            f = ASPOCModule(out_features=256, dtype=self.dtype,
                            name="context")(f, train)
        elif self.context == "psp":
            f = PSPModule(512, dtype=self.dtype, name="context")(c4, train)
        elif self.context == "cc":
            from contrastiveseg_tpu.models.attention import CCModule

            f = CCModule(512, dtype=self.dtype, name="context")(c4, train)
        else:
            f = ConvBN(512, 3, use_relu=True, dtype=self.dtype,
                       name="conv3x3")(c4, train)
            if self.context == "base_oc":
                f = BaseOCModule(out_channels=512, dtype=self.dtype,
                                 name="context")(f, train)
            elif self.context == "isa":
                f = ISAModule(out_channels=512,
                              down_factors=self.isa_factors,
                              dtype=self.dtype, name="context")(f, train)
            else:  # plain dilated FCN head
                f = nn.Dropout(0.1, deterministic=not train,
                               name="fcn_drop")(f)
        seg = nn.Conv(self.num_classes, (1, 1), use_bias=self.cls_bias,
                      dtype=jnp.float32,
                      name="cls")(f.astype(jnp.float32))
        if self.upsample_out:
            seg = resize_bilinear_align_corners(seg, (in_h, in_w))
            if aux is not None:
                aux = resize_bilinear_align_corners(aux, (in_h, in_w))
        out = {"seg": seg}
        if aux is not None:
            out["seg_aux"] = aux
        return out


def _context_variant(context: str, **defaults):
    def build(cfg) -> nn.Module:
        dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32
        kw = dict(defaults)
        if context == "isa":
            # ISANet reads network.factors (isanet.py:22-28).
            factors = cfg.get("network.factors", default=None) or [[8, 8]]
            kw["isa_factors"] = tuple(tuple(f) for f in factors)
        return ResNetContextNet(
            num_classes=cfg.get("data.num_classes"),
            context=context,
            arch=resolve_arch(
                cfg.get("network.backbone", default="resnet101_dilated8")),
            dtype=dtype,
            **kw,
        )

    return build


MODELS.register("fcnet")(
    _context_variant("none", cls_bias=False, dsn_dropout=0.10))
# fcnet_wo_dsn's 1x1 cls conv keeps its bias (fcnet.py:93 bias=True),
# unlike FcnNet's (fcnet.py:40 bias=False).
MODELS.register("fcnet_wo_dsn")(
    _context_variant("none", with_aux=False, cls_bias=True))
# base/asp OCNet dsn heads have no dropout (ocnet.py:47-51,87-91);
# isanet keeps the 0.05 default (isanet.py:31-35).
MODELS.register("base_ocnet")(_context_variant("base_oc", dsn_dropout=0.0))
MODELS.register("asp_ocnet")(_context_variant("asp_oc", dsn_dropout=0.0))
MODELS.register("isanet")(_context_variant("isa"))
MODELS.register("pspnet")(_context_variant("psp"))
MODELS.register("ccnet")(_context_variant("cc"))
MODELS.register("pyramid_ocnet")(_context_variant("pyramid_oc"))


class HRNetISASeg(nn.Module):
    """HRNet + interlaced-sparse-attention head.

    The hrnet_w48_isa / hrnet48_isa run scripts
    (scripts/{lip,pascal_context}/run_h_48_d_4_isa_train.sh,
    scripts/coco_stuff/run_h_48_d_4_isa_train.sh) name models the
    reference never registers (model_manager.py:48-82 — bitrot);
    composed here as the obvious intent: 720-ch branch concat ->
    3x3 ConvBN 512 -> ISAModule -> cls, plus the standard aux head so
    both fs_ce (lip/pascal scripts) and fs_auxce (coco script) work.
    """

    num_classes: int
    arch: str = "hrnet48"
    upsample_out: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        from contrastiveseg_tpu.models.attention import ISAModule

        in_h, in_w = x.shape[1], x.shape[2]
        feats = HRNet(HRNET_SPECS[self.arch], dtype=self.dtype, name="backbone")(
            x.astype(self.dtype), train
        )
        h, w = feats[0].shape[1], feats[0].shape[2]
        cat = jnp.concatenate(
            [feats[0]]
            + [resize_bilinear_align_corners(f, (h, w), fast=True)
               for f in feats[1:]],
            axis=-1,
        )
        aux = ConvBN(512, 3, use_relu=True, dtype=self.dtype,
                     name="aux_conv")(cat, train)
        aux = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                      name="aux_cls")(aux.astype(jnp.float32))
        f = ConvBN(512, 3, use_relu=True, dtype=self.dtype,
                   name="conv3x3")(cat, train)
        f = ISAModule(out_channels=512, dtype=self.dtype, name="isa")(f, train)
        seg = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                      name="cls")(f.astype(jnp.float32))
        if self.upsample_out:
            seg = resize_bilinear_align_corners(seg, (in_h, in_w))
            aux = resize_bilinear_align_corners(aux, (in_h, in_w))
        return {"seg": seg, "seg_aux": aux}


def _hrnet_isa_variant(cfg) -> nn.Module:
    dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32
    backbone = cfg.get("network.backbone", default="hrnet48")
    return HRNetISASeg(
        num_classes=cfg.get("data.num_classes"),
        arch=backbone if backbone in HRNET_SPECS else "hrnet48",
        dtype=dtype,
    )


# Both spellings appear across the reference's isa run scripts.
MODELS.register("hrnet_w48_isa")(_hrnet_isa_variant)
MODELS.register("hrnet48_isa")(_hrnet_isa_variant)


class SegFixHRNet(nn.Module):
    """SegFix offset model (reference nets/segfix.py:25-89): HRNet ->
    concat branches -> dual 1x1-conv heads: binary boundary mask (2ch) and
    direction classes."""

    num_directions: int = 8
    arch: str = "hrnet48"
    mid_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        if self.arch in HRNET_SPECS:
            feats = HRNet(HRNET_SPECS[self.arch], dtype=self.dtype,
                          name="backbone")(x.astype(self.dtype), train)
        else:
            # The segfix scripts' hrnet2x20 (HighResolutionNext) backbone
            # (scripts/cityscapes/segfix/run_hx_20_d_2*.sh).
            from contrastiveseg_tpu.models.hrnet import HRNetNext

            feats = HRNetNext(arch=self.arch, dtype=self.dtype,
                              name="backbone")(x.astype(self.dtype), train)
        h, w = feats[0].shape[1], feats[0].shape[2]
        cat = jnp.concatenate(
            [feats[0]]
            + [resize_bilinear_align_corners(f, (h, w), fast=True) for f in feats[1:]],
            axis=-1,
        )

        def head(name, out_ch):
            y = ConvBN(self.mid_channels, 1, use_relu=True, dtype=self.dtype,
                       name=f"{name}_conv")(cat, train)
            return nn.Conv(out_ch, (1, 1), use_bias=False, dtype=jnp.float32,
                           name=f"{name}_cls")(y.astype(jnp.float32))

        return {"mask": head("mask", 2), "dir": head("dir", self.num_directions)}


@MODELS.register("segfix_hrnet")
def _segfix_hrnet(cfg) -> nn.Module:
    from contrastiveseg_tpu.models.hrnet import HRNEXT_SPECS

    dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32
    backbone = cfg.get("network.backbone", default="hrnet48")
    if backbone not in HRNET_SPECS and backbone not in HRNEXT_SPECS:
        backbone = "hrnet48"
    return SegFixHRNet(
        num_directions=cfg.get("data.dt_num_classes", default=8),
        arch=backbone,
        dtype=dtype,
    )


@MODELS.register("spatial_ocrnet")
def _spatial_ocrnet(cfg) -> nn.Module:
    dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32
    return SpatialOCRNet(
        num_classes=cfg.get("data.num_classes"),
        arch=resolve_arch(
            cfg.get("network.backbone", default="resnet101_dilated8")),
        dtype=dtype,
    )


class ASPOCRNet(nn.Module):
    """Dilated ResNet + probs-conditioned ASP-OCR (reference ASPOCRNet,
    nets/ocrnet.py:72-117): aux DSN on layer3 (dropout 0.1) feeds
    SpatialOCR_ASP_Module(2048 -> 256, dilations 12/24/36) on layer4;
    1x1 head (bias)."""

    num_classes: int
    arch: str = "resnet101_dilated8"
    upsample_out: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        from contrastiveseg_tpu.models.ocr import SpatialOCRASP

        in_h, in_w = x.shape[1], x.shape[2]
        feats = ResNet(RESNET_SPECS[self.arch], dtype=self.dtype, name="backbone")(
            x.astype(self.dtype), train
        )
        c3, c4 = feats[-2], feats[-1]
        aux = ConvBN(512, 3, use_relu=True, dtype=self.dtype,
                     name="dsn_conv")(c3, train)
        aux = nn.Dropout(0.1, deterministic=not train, name="dsn_drop")(aux)
        aux = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                      name="dsn_cls")(aux.astype(jnp.float32))
        f = SpatialOCRASP(hidden=256, out_channels=256,
                          dilations=(12, 24, 36), dtype=self.dtype,
                          name="asp_ocr")(c4, aux, train)
        seg = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                      name="cls")(f.astype(jnp.float32))
        if self.upsample_out:
            seg = resize_bilinear_align_corners(seg, (in_h, in_w))
            aux = resize_bilinear_align_corners(aux, (in_h, in_w))
        return {"seg": seg, "seg_aux": aux}


@MODELS.register("spatial_asp_ocrnet")
def _spatial_asp_ocrnet(cfg) -> nn.Module:
    dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32
    return ASPOCRNet(
        num_classes=cfg.get("data.num_classes"),
        arch=resolve_arch(
            cfg.get("network.backbone", default="resnet101_dilated8")),
        dtype=dtype,
    )


def _label_onehot(labels: jnp.ndarray, num_channels: int) -> jnp.ndarray:
    """label_to_onehot (spatial_ocr_block.py:22-34): [B,h,w] -> [B,h,w,K].

    Ignore pixels (< 0) land in the LAST channel — the reference scatters
    ``gt[gt == -1] = num_classes`` into a K+1-channel one-hot; callers pick
    ``num_channels`` to match their proxy count.
    """
    lab = jnp.where(labels < 0, num_channels - 1,
                    jnp.clip(labels, 0, num_channels - 1))
    return (lab[..., None] == jnp.arange(num_channels)).astype(jnp.float32)


class IdealSpatialOCRNet(nn.Module):
    """Oracle OCR family (reference nets/ideal_ocrnet.py:19-263).

    Five variants, distinguished by where ground truth replaces learned
    attention (`gt_labels` required for all):
      * ``spatial``   — GT gather + GT distribute (IdealSpatialOCRNet);
      * ``spatial_b`` — + GT background context (IdealSpatialOCRNetB);
      * ``spatial_c`` — GT background context ONLY, no object context
        (IdealSpatialOCRNetC, use_oc=False);
      * ``gather``    — GT gather, learned distribute (IdealGatherOCRNet);
      * ``distribute``— learned gather, GT distribute (IdealDistributeOCRNet).

    GT-gathered contexts carry ``num_classes + 1`` proxies (the extra slot
    is the ignore-label bucket, label_to_onehot semantics); the learned
    gather keeps ``num_classes``.
    """

    num_classes: int
    variant: str = "spatial"  # spatial | spatial_b | spatial_c | gather | distribute
    arch: str = "resnet101_dilated8"
    upsample_out: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, gt_labels: jnp.ndarray = None,
                 train: bool = True) -> dict[str, jnp.ndarray]:
        from contrastiveseg_tpu.models.ocr import SpatialGather, SpatialOCR
        from contrastiveseg_tpu.ops.resize import scale_target_nearest

        gather_gt = self.variant in ("spatial", "spatial_b", "spatial_c", "gather")
        distribute_gt = self.variant in ("spatial", "spatial_b", "spatial_c",
                                         "distribute")
        use_bg = self.variant in ("spatial_b", "spatial_c")
        use_oc = self.variant != "spatial_c"

        in_h, in_w = x.shape[1], x.shape[2]
        feats = ResNet(RESNET_SPECS[self.arch], dtype=self.dtype, name="backbone")(
            x.astype(self.dtype), train
        )
        c3, c4 = feats[-2], feats[-1]
        # DSN aux head (ideal_ocrnet.py:50-55): 3x3 + BNReLU + drop + 1x1.
        aux = ConvBN(512, 3, use_relu=True, dtype=self.dtype,
                     name="dsn_conv")(c3, train)
        aux = nn.Dropout(0.05, deterministic=not train, name="dsn_drop")(aux)
        aux = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                      name="dsn_cls")(aux.astype(jnp.float32))
        f = ConvBN(512, 3, use_relu=True, dtype=self.dtype,
                   name="conv3x3")(c4, train)
        h, w = f.shape[1], f.shape[2]

        lab = None
        if gt_labels is not None:
            lab = scale_target_nearest(gt_labels, (h, w))

        if gather_gt and lab is not None:
            # GT gather: L1-normalized one-hot over spatial (K+1 proxies,
            # SpatialGather_Module use_gt path, spatial_ocr_block.py:50-59).
            onehot = _label_onehot(lab, self.num_classes + 1)
            weights = onehot.reshape(f.shape[0], h * w, -1)
            weights = weights / jnp.maximum(
                jnp.sum(weights, axis=1, keepdims=True), 1e-12)
            context = jnp.einsum(
                "bnk,bnc->bkc", weights, f.reshape(f.shape[0], h * w, -1),
                preferred_element_type=jnp.float32,
            ).astype(f.dtype)
        else:
            context = SpatialGather(name="ocr_gather")(f, aux)

        gt_sim = None
        if distribute_gt and lab is not None:
            gt_sim = _label_onehot(lab, context.shape[1])
        f = SpatialOCR(key_channels=256, out_channels=512, dropout=0.05,
                       use_bg=use_bg, use_oc=use_oc, dtype=self.dtype,
                       name="ocr_distri")(f, context, train, gt_sim=gt_sim)
        seg = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                      name="cls")(f.astype(jnp.float32))
        if self.upsample_out:
            seg = resize_bilinear_align_corners(seg, (in_h, in_w))
            aux = resize_bilinear_align_corners(aux, (in_h, in_w))
        return {"seg": seg, "seg_aux": aux}


class _MsOCRTrunk(nn.Module):
    """MscaleOCR's OCR block + attention head (reference OCR_block +
    make_attn_head, ms_ocrnet.py:9-75): conv3x3 720->256, SpatialGather,
    SpatialOCR(key 128, out 256), cls 256->C, aux 720->256->C, and the
    scale-attention head conv3x3(256)+BNReLU x2 -> conv1x1(1, no bias) ->
    sigmoid over the OCR mid features.  All outputs upsampled to the
    trunk's input size with half-pixel bilinear (the reference's Upsample
    uses align_corners=False, ms_ocrnet.py:77-82)."""

    num_classes: int
    arch: str = "hrnet48"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        from contrastiveseg_tpu.models.ocr import SpatialGather, SpatialOCR
        from contrastiveseg_tpu.ops.resize import resize_bilinear_half_pixel

        in_h, in_w = x.shape[1], x.shape[2]
        feats = HRNet(HRNET_SPECS[self.arch], dtype=self.dtype,
                      name="backbone")(x.astype(self.dtype), train)
        h, w = feats[0].shape[1], feats[0].shape[2]
        cat = jnp.concatenate(
            [feats[0]]
            + [resize_bilinear_align_corners(f, (h, w), fast=True)
               for f in feats[1:]],
            axis=-1,
        )
        f = ConvBN(256, 3, use_relu=True, dtype=self.dtype,
                   name="conv3x3_ocr")(cat, train)
        aux = ConvBN(256, 3, use_relu=True, dtype=self.dtype,
                     name="aux_conv")(cat, train)
        aux = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                      dtype=jnp.float32, name="aux_cls")(
            aux.astype(jnp.float32))
        context = SpatialGather(name="ocr_gather")(f, aux)
        ocr_feats = SpatialOCR(key_channels=128, out_channels=256,
                               dropout=0.05, dtype=self.dtype,
                               name="ocr_distri")(f, context, train)
        cls = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                      dtype=jnp.float32, name="cls")(
            ocr_feats.astype(jnp.float32))
        a = ConvBN(256, 3, use_relu=True, dtype=self.dtype,
                   name="attn0")(ocr_feats, train)
        a = ConvBN(256, 3, use_relu=True, dtype=self.dtype,
                   name="attn1")(a, train)
        a = nn.Conv(1, (1, 1), use_bias=False, dtype=jnp.float32,
                    name="attn2")(a.astype(jnp.float32))
        attn = jax.nn.sigmoid(a)
        return {
            "cls_out": resize_bilinear_half_pixel(cls, (in_h, in_w)),
            "aux_out": resize_bilinear_half_pixel(aux, (in_h, in_w)),
            "logit_attn": resize_bilinear_half_pixel(attn, (in_h, in_w)),
        }


class MscaleOCR(nn.Module):
    """Hierarchical multi-scale attention OCR (reference ms_ocrnet.py
    two_scale_forward, :205-252): run the trunk at 0.5x and 1.0x; the
    LOW scale predicts the attention; fuse
    ``up(attn * p_lo) + (1 - up(attn)) * p_1x`` (aux likewise) with
    half-pixel bilinear up/downsampling throughout."""

    num_classes: int
    arch: str = "hrnet48"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        from contrastiveseg_tpu.ops.resize import resize_bilinear_half_pixel

        in_h, in_w = x.shape[1], x.shape[2]
        x_lo = resize_bilinear_half_pixel(x, (in_h // 2, in_w // 2))
        # Shared trunk weights across scales: call the same submodule twice.
        trunk = _MsOCRTrunk(num_classes=self.num_classes, arch=self.arch,
                            dtype=self.dtype, name="ocr")
        lo = trunk(x_lo, train)
        hi = trunk(x, train)

        pred_05x, aux_lo, attn = lo["cls_out"], lo["aux_out"], lo["logit_attn"]
        pred_10x, aux_1x = hi["cls_out"], hi["aux_out"]

        p_lo = resize_bilinear_half_pixel(attn * pred_05x, (in_h, in_w))
        a_lo = resize_bilinear_half_pixel(attn * aux_lo, (in_h, in_w))
        attn_up = resize_bilinear_half_pixel(attn, (in_h, in_w))

        pred = p_lo + (1.0 - attn_up) * pred_10x
        aux = a_lo + (1.0 - attn_up) * aux_1x
        return {
            "seg": pred,
            "pred": pred,
            "aux": aux,
            "seg_aux": aux,
            "pred_05x": pred_05x,
            "pred_10x": pred_10x,
            "attn_05x": attn,
        }


def _ce2p_variant(context: str):
    def build(cfg) -> nn.Module:
        from contrastiveseg_tpu.models.ce2p import CE2PNet

        dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32
        return CE2PNet(
            num_classes=cfg.get("data.num_classes"),
            context=context,
            arch=resolve_arch(
                cfg.get("network.backbone", default="resnet101_dilated8")),
            dtype=dtype,
        )

    return build


MODELS.register("ce2p_asp_ocrnet")(_ce2p_variant("asp_ocr"))
MODELS.register("ce2p_ocrnet")(_ce2p_variant("ocr"))
MODELS.register("ce2p_ideal_ocrnet")(_ce2p_variant("ocr"))


def _ideal_variant(variant: str):
    def build(cfg) -> nn.Module:
        dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32
        return IdealSpatialOCRNet(
            num_classes=cfg.get("data.num_classes"),
            variant=variant,
            arch=resolve_arch(
                cfg.get("network.backbone", default="resnet101_dilated8")),
            dtype=dtype,
        )

    return build


for _name, _v in [
    ("ideal_spatial_ocrnet", "spatial"),
    ("ideal_spatial_ocrnet_b", "spatial_b"),
    ("ideal_spatial_ocrnet_c", "spatial_c"),
    ("ideal_gather_ocrnet", "gather"),
    ("ideal_distribute_ocrnet", "distribute"),
]:
    MODELS.register(_name)(_ideal_variant(_v))


def _setr_variant(decoder: str):
    def build(cfg) -> nn.Module:
        from contrastiveseg_tpu.models.vit import SETR

        dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32
        backbone = cfg.get("network.backbone", default="vit_base")
        return SETR(
            num_classes=cfg.get("data.num_classes"),
            arch=backbone if backbone.startswith("vit") else "vit_base",
            decoder=decoder,
            dtype=dtype,
        )

    return build


MODELS.register("setr_naive")(_setr_variant("naive"))
MODELS.register("setr_pup")(_setr_variant("pup"))
MODELS.register("setr_mla")(_setr_variant("mla"))


class FPNSemanticDecoder(nn.Module):
    """mmseg-style FPN neck + SemanticFPN decoder, structurally faithful
    to the reference (nets/semantic_fpn.py:11-206): plain biased 1x1
    lateral convs, NEAREST top-down sum, plain 3x3 fpn convs; then
    per-level scale heads (ConvBNReLU x log2(stride/4), each followed by
    a x2 half-pixel bilinear upsample on the coarser levels) summed at
    stride 4, and a 1x1 cls.  Takes the 4-scale feature list; returns
    stride-4 logits."""

    num_classes: int
    fpn_dim: int = 256
    channels: int = 128
    feature_strides: tuple = (4, 8, 16, 32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = True) -> jnp.ndarray:
        from contrastiveseg_tpu.ops.resize import (
            resize_bilinear_half_pixel,
            resize_nearest,
        )

        laterals = [
            nn.Conv(self.fpn_dim, (1, 1), use_bias=True, dtype=self.dtype,
                    name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_nearest(
                laterals[i],
                (laterals[i - 1].shape[1], laterals[i - 1].shape[2]),
            )
        outs = [
            nn.Conv(self.fpn_dim, (3, 3), padding=1, use_bias=True,
                    dtype=self.dtype, name=f"fpn_conv{i}")(laterals[i])
            for i in range(len(laterals))
        ]
        s0 = self.feature_strides[0]
        merged = None
        for i, s in enumerate(self.feature_strides):
            f = outs[i]
            head_length = max(1, int(math.log2(s) - math.log2(s0)))
            for k in range(head_length):
                f = ConvBN(self.channels, 3, use_relu=True, dtype=self.dtype,
                           name=f"scale_head{i}_{k}")(f, train)
                if s != s0:
                    f = resize_bilinear_half_pixel(
                        f, (f.shape[1] * 2, f.shape[2] * 2))
            if merged is None:
                merged = f
            else:
                merged = merged + resize_bilinear_half_pixel(
                    f, (merged.shape[1], merged.shape[2]))
        seg = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                      dtype=jnp.float32, name="cls")(
            merged.astype(jnp.float32))
        return seg


class PyramidSegNet(nn.Module):
    """Semantic-FPN over a 4-scale pyramid backbone (PVT/SVT/HRNet) —
    reference SemanticFPN (nets/semantic_fpn.py:190-206).  Divergence:
    the reference returns stride-4 logits and lets the loss upsample;
    we upsample to the input here to keep the package-wide output
    contract."""

    num_classes: int
    backbone: str = "pvt_small"
    fpn_dim: int = 256
    img_size: int = 224  # PVT v1 pos-embed grid (train input_size[0])
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> dict[str, jnp.ndarray]:
        from contrastiveseg_tpu.models.backbone_selector import build_backbone

        in_h, in_w = x.shape[1], x.shape[2]
        feats = build_backbone(self.backbone, dtype=self.dtype,
                               img_size=self.img_size)(
            x.astype(self.dtype), train
        )
        seg = FPNSemanticDecoder(self.num_classes, fpn_dim=self.fpn_dim,
                                 dtype=self.dtype, name="decoder")(
            feats, train)
        seg = resize_bilinear_align_corners(seg, (in_h, in_w))
        return {"seg": seg}


@MODELS.register("semantic_fpn")
def _semantic_fpn(cfg) -> nn.Module:
    dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32
    input_size = cfg.get("train.data_transformer.input_size",
                         default=[224, 224])
    return PyramidSegNet(
        num_classes=cfg.get("data.num_classes"),
        backbone=cfg.get("network.backbone", default="pvt_small"),
        img_size=int(input_size[0]),
        dtype=dtype,
    )


@MODELS.register("deeplab_v3_mobilenet")
def _deeplab_mobilenet(cfg) -> nn.Module:
    """DeepLab head on a dilated MobileNetV2 (mobilenet backbone coverage)."""
    dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32

    class _Net(nn.Module):
        num_classes: int
        dtype_: Any

        @nn.compact
        def __call__(self, x, train: bool = True):
            from contrastiveseg_tpu.models.backbone_selector import (
                build_backbone,
            )
            from contrastiveseg_tpu.models.heads import ASPP

            in_h, in_w = x.shape[1], x.shape[2]
            feats = build_backbone("mobilenetv2_dilated8", dtype=self.dtype_)(
                x.astype(self.dtype_), train
            )
            a = ASPP(256, dtype=self.dtype_, name="aspp")(feats[-1], train)
            seg = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                          name="cls")(a.astype(jnp.float32))
            return {"seg": resize_bilinear_align_corners(seg, (in_h, in_w))}

    return _Net(num_classes=cfg.get("data.num_classes"), dtype_=dtype)


@MODELS.register("ms_ocr")
def _ms_ocr(cfg) -> nn.Module:
    dtype = jnp.bfloat16 if cfg.get("network.bf16", default=False) else jnp.float32
    backbone = cfg.get("network.backbone", default="hrnet48")
    return MscaleOCR(
        num_classes=cfg.get("data.num_classes"),
        arch=backbone if backbone in HRNET_SPECS else "hrnet48",
        dtype=dtype,
    )


def build_model(cfg) -> nn.Module:
    """ModelManager.semantic_segmentor equivalent (model_manager.py:85-98)."""
    return MODELS.build(cfg.get("network.model_name"), cfg)
