"""Torch-checkpoint import: reference/ImageNet weights -> flax variable trees.

The reference loads ImageNet-pretrained backbones and its own trained
checkpoints with per-arch key remaps
(/root/reference/lib/models/tools/module_helper.py:124-235,
segmentor/tools/module_runner.py:78-119).  Every published number (80.18
mIoU, BASELINE.md) depends on ImageNet initialization, so this module is
the bridge: it maps a torch ``state_dict`` (as numpy arrays) onto the flax
``{'params', 'batch_stats'}`` trees produced by our models.

Design notes (TPU-native divergences handled here):
  * conv kernels transpose OIHW -> HWIO (NHWC layout);
  * torch ``BatchNorm2d`` -> flax ``BatchNorm`` leaf renames
    (weight/bias/running_mean/running_var -> scale/bias/mean/var);
  * torch convs that carry a bias *immediately before a BN* (e.g. the
    reference cls_head 3x3 conv, lib/models/nets/hrnet.py:38) have no bias
    leaf on our side — the bias is folded into the BN running mean
    (``BN(x + b) == BN'(x)`` with ``mean' = mean - b``), which is exact in
    eval mode and a no-op in train mode where batch stats are recomputed.

No torch import is required here: callers hand us a ``{key: np.ndarray}``
dict (see tools/import_torch_ckpt.py for the .pth reader).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

# Leaf renames: flax BatchNorm leaf -> torch BatchNorm2d attribute.
_BN_LEAF = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}

# Flax leaves that live in batch_stats rather than params.
_STAT_LEAVES = ("mean", "var")


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


class TorchKey:
    """A resolved mapping for one flax leaf."""

    def __init__(self, key: str, transform: Optional[Callable] = None,
                 fold_bias_key: Optional[str] = None):
        self.key = key
        self.transform = transform
        # For BN `mean` leaves: torch conv bias key to subtract (bias fold).
        self.fold_bias_key = fold_bias_key


def _convbn(base_conv: str, base_bn: str, sub: tuple[str, ...]) -> Optional[TorchKey]:
    """Map the tail of a ConvBN flax path: ('conv','kernel') or ('norm','bn',X)."""
    if sub == ("conv", "kernel"):
        return TorchKey(f"{base_conv}.weight", _conv_kernel)
    if sub == ("conv", "bias"):
        return TorchKey(f"{base_conv}.bias")
    if len(sub) == 3 and sub[:2] == ("norm", "bn"):
        leaf = sub[2]
        fold = f"{base_conv}.bias" if leaf == "mean" else None
        return TorchKey(f"{base_bn}.{_BN_LEAF[leaf]}", fold_bias_key=fold)
    return None


def _block(base: str, sub: tuple[str, ...]) -> Optional[TorchKey]:
    """BasicBlock / Bottleneck: flax conv{1..3}/downsample -> torch names."""
    m = re.fullmatch(r"conv(\d)", sub[0])
    if m:
        return _convbn(f"{base}.conv{m.group(1)}", f"{base}.bn{m.group(1)}", sub[1:])
    if sub[0] == "downsample":
        return _convbn(f"{base}.downsample.0", f"{base}.downsample.1", sub[1:])
    return None


def hrnet_backbone_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """Map a flax HRNet-backbone-relative leaf path to the torch key.

    Torch naming per /root/reference/lib/models/backbones/hrnet/
    hrnet_backbone.py:508-560 (conv1/bn1/conv2/bn2/layer1/transition{1,2,3}/
    stage{2,3,4}); our module names per models/hrnet.py.
    """
    name = path[0]
    if name in ("stem1", "stem2"):
        n = "1" if name == "stem1" else "2"
        return _convbn(f"conv{n}", f"bn{n}", path[1:])
    m = re.fullmatch(r"layer1_block(\d+)", name)
    if m:
        return _block(f"layer1.{m.group(1)}", path[1:])
    m = re.fullmatch(r"transition(\d)_b(\d)", name)
    if m:
        s, i = int(m.group(1)), int(m.group(2))
        # Our transitions are numbered by the stage they feed (2/3/4); torch
        # uses transition1/2/3.  The newly spawned coarsest branch (i == s-1)
        # is a nested Sequential in torch (hrnet_backbone.py:438-460).
        base = f"transition{s - 1}.{i}"
        if i == s - 1:
            base += ".0"
        return _convbn(f"{base}.0", f"{base}.1", path[1:])
    m = re.fullmatch(r"stage(\d)_module(\d+)", name)
    if m:
        s, mod = m.group(1), m.group(2)
        inner = path[1]
        b = re.fullmatch(r"branch(\d+)_block(\d+)", inner)
        if b:
            return _block(f"stage{s}.{mod}.branches.{b.group(1)}.{b.group(2)}",
                          path[2:])
        f = re.fullmatch(r"fuse(\d+)_(\d+)_ds(\d+)", inner)
        if f:
            base = f"stage{s}.{mod}.fuse_layers.{f.group(1)}.{f.group(2)}.{f.group(3)}"
            return _convbn(f"{base}.0", f"{base}.1", path[2:])
        f = re.fullmatch(r"fuse(\d+)_(\d+)", inner)
        if f:
            base = f"stage{s}.{mod}.fuse_layers.{f.group(1)}.{f.group(2)}"
            return _convbn(f"{base}.0", f"{base}.1", path[2:])
    return None


def _plain_conv(base: str, sub: tuple[str, ...]) -> Optional[TorchKey]:
    """A bare flax nn.Conv: ('kernel',) / ('bias',)."""
    if sub == ("kernel",):
        return TorchKey(f"{base}.weight", _conv_kernel)
    if sub == ("bias",):
        return TorchKey(f"{base}.bias")
    return None


def hrnet_seg_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """Full HRNetSeg (models/nets.py HRNetSeg) -> reference HRNet_W48[_CONTRAST]
    (lib/models/nets/hrnet.py:24-95).  Covers backbone + cls_head + proj_head.
    """
    if path[0] == "backbone":
        tk = hrnet_backbone_path(path[1:])
        if tk is not None:
            tk.key = f"backbone.{tk.key}"
            if tk.fold_bias_key:
                tk.fold_bias_key = f"backbone.{tk.fold_bias_key}"
        return tk
    if path[0] == "cls_head":
        if path[1] == "conv":  # ConvBN: torch Sequential slots 0 (conv) / 1.0 (bn)
            return _convbn("cls_head.0", "cls_head.1.0", path[2:])
        if path[1] == "cls":
            return _plain_conv("cls_head.3", path[2:])
    if path[0] == "proj_head":
        return _proj_head(path[1:])
    return None


def _proj_head(sub: tuple[str, ...]) -> Optional[TorchKey]:
    """ProjectionHead convmlp: torch proj = Sequential(Conv2d,
    BNReLU(=Sequential(BN, ReLU)), Conv2d) (modules/projection.py:8-24)."""
    if sub[0] == "fc1":
        return _plain_conv("proj_head.proj.0", sub[1:])
    if len(sub) == 3 and sub[0] == "norm" and sub[1] == "bn":
        # fc1 *keeps* its bias on our side, so no fold is needed here.
        return TorchKey(f"proj_head.proj.1.0.{_BN_LEAF[sub[2]]}",
                        fold_bias_key=None)
    if sub[0] == "fc2":
        return _plain_conv("proj_head.proj.2", sub[1:])
    return None


def _bnact(base_bn: str, sub: tuple[str, ...],
           fold_conv: Optional[str] = None) -> Optional[TorchKey]:
    """ConvBNAct/TorchBatchNorm leaf ('bn','bn',leaf) -> a torch BN.
    ``fold_conv``: torch conv prefix whose bias folds into running_mean
    (for biased torch convs our bias-free flax convs mirror)."""
    if len(sub) == 3 and sub[:2] == ("bn", "bn"):
        fold = (f"{fold_conv}.bias"
                if fold_conv is not None and sub[2] == "mean" else None)
        return TorchKey(f"{base_bn}.{_BN_LEAF[sub[2]]}", fold_bias_key=fold)
    return None


def _ocr_distri(sub: tuple[str, ...],
                base: str = "ocr_distri_head") -> Optional[TorchKey]:
    """SpatialOCR (models/ocr.py) -> SpatialOCR_Module
    (lib/models/modules/spatial_ocr_block.py:216-310): the
    ObjectAttentionBlock2D double-conv stacks are torch Sequentials
    [conv, BNReLU, conv, BNReLU] and f_down/f_up are [conv, BNReLU]."""
    if sub[0] == "project":
        return _convbn(f"{base}.conv_bn_dropout.0",
                       f"{base}.conv_bn_dropout.1.0", sub[1:])
    if sub[0] != "object_attention":
        return None
    return _object_attention(f"{base}.object_context_block", sub[1:])


def _object_attention(ob: str, s: tuple[str, ...]) -> Optional[TorchKey]:
    """ObjectAttention (models/ocr.py) -> _ObjectAttentionBlock at torch
    prefix ``ob``: f_pixel/f_object are Sequentials [conv, BNReLU, conv,
    BNReLU]; f_down/f_up are [conv, BNReLU]."""
    m = re.fullmatch(r"f_(pixel|object)_(\d)", s[0])
    if m:
        idx = 0 if m.group(2) == "1" else 2
        return _plain_conv(f"{ob}.f_{m.group(1)}.{idx}", s[1:])
    m = re.fullmatch(r"f_(pixel|object)_bn(\d)", s[0])
    if m:
        idx = 1 if m.group(2) == "1" else 3
        return _bnact(f"{ob}.f_{m.group(1)}.{idx}.0", s[1:])
    if s[0] == "f_down":
        return _plain_conv(f"{ob}.f_down.0", s[1:])
    if s[0] == "f_down_bn":
        return _bnact(f"{ob}.f_down.1.0", s[1:])
    if s[0] == "f_up":
        return _plain_conv(f"{ob}.f_up.0", s[1:])
    if s[0] == "f_up_bn":
        return _bnact(f"{ob}.f_up.1.0", s[1:])
    return None


def hrnet_ocr_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """HRNetOCRSeg (models/nets.py) -> reference HRNet_W48_OCR[_B]
    [_CONTRAST] (lib/models/nets/hrnet.py:98-150,191-250): backbone +
    aux_head + conv3x3 + OCR distribute head + cls + optional proj."""
    if path[0] == "backbone":
        tk = hrnet_backbone_path(path[1:])
        if tk is not None:
            tk.key = f"backbone.{tk.key}"
            if tk.fold_bias_key:
                tk.fold_bias_key = f"backbone.{tk.fold_bias_key}"
        return tk
    if path[0] == "aux_conv":
        return _convbn("aux_head.0", "aux_head.1.0", path[1:])
    if path[0] == "aux_cls":
        return _plain_conv("aux_head.2", path[1:])
    if path[0] == "conv3x3":
        return _convbn("conv3x3.0", "conv3x3.1.0", path[1:])
    if path[0] == "ocr_distri":
        return _ocr_distri(path[1:])
    if path[0] == "cls":
        return _plain_conv("cls_head", path[1:])
    if path[0] == "proj_head":
        return _proj_head(path[1:])
    return None


def resnet_backbone_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """Flax ResNet (models/resnet.py) -> reference torch ResNet
    (resnet_models.py:107-180): deep-base resinit.conv{1,2,3}/bn{1,2,3}
    (or 7x7 resinit.conv1), then layer{1..4}.{k} bottlenecks."""
    name = path[0]
    m = re.fullmatch(r"stem(\d)?", name)
    if m:
        n = m.group(1) or "1"
        return _convbn(f"resinit.conv{n}", f"resinit.bn{n}", path[1:])
    m = re.fullmatch(r"layer(\d)_block(\d+)", name)
    if m:
        return _block(f"layer{m.group(1)}.{m.group(2)}", path[1:])
    return None


def deeplab_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """Flax DeepLabV3 (models/nets.py) -> reference DeepLabV3[Contrast]
    (nets/deeplab.py:8-64 + DeepLabHead, decoder_block.py:39-179)."""
    if path[0] == "backbone":
        tk = resnet_backbone_path(path[1:])
        if tk is not None:
            tk.key = f"backbone.{tk.key}"
            if tk.fold_bias_key:
                tk.fold_bias_key = f"backbone.{tk.fold_bias_key}"
        return tk
    if path[0] == "dsn_conv":  # layer_dsn: Sequential(conv, BNReLU, cls)
        return _convbn("decoder.layer_dsn.0", "decoder.layer_dsn.1.0", path[1:])
    if path[0] == "dsn_cls":
        return _plain_conv("decoder.layer_dsn.2", path[1:])
    if path[0] == "aspp":
        sub = path[1]
        m = re.fullmatch(r"b(\d)", sub)
        if m:  # b0..b3: Sequential(conv, BNReLU)
            base = f"decoder.layer_aspp.b{m.group(1)}"
            return _convbn(f"{base}.0", f"{base}.1.0", path[2:])
        if sub == "img_pool":  # b4: Sequential(pool, conv, BNReLU)
            return _convbn("decoder.layer_aspp.b4.1",
                           "decoder.layer_aspp.b4.2.0", path[2:])
        if sub == "project":
            return _convbn("decoder.layer_aspp.project.0",
                           "decoder.layer_aspp.project.1.0", path[2:])
    if path[0] == "refine":  # Sequential(conv, BatchNorm2d (bare), cls)
        return _convbn("decoder.refine.0", "decoder.refine.1", path[1:])
    if path[0] == "cls":
        return _plain_conv("decoder.refine.2", path[1:])
    if path[0] == "proj_head":
        if path[1] == "fc1":
            return _plain_conv("proj_head.proj.0", path[2:])
        if len(path) == 4 and path[1] == "norm" and path[2] == "bn":
            return TorchKey(f"proj_head.proj.1.0.{_BN_LEAF[path[3]]}")
        if path[1] == "fc2":
            return _plain_conv("proj_head.proj.2", path[2:])
    return None


def ms_ocr_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """MscaleOCR (models/nets.py _MsOCRTrunk) -> reference MscaleOCR
    (ms_ocrnet.py:9-108): backbone + OCR_block (conv3x3_ocr / aux_head /
    ocr_distri_head / cls_head) + make_attn_head's OrderedDict names."""
    if path[0] != "ocr":
        return None
    sub = path[1:]
    if sub[0] == "backbone":
        tk = hrnet_backbone_path(sub[1:])
        if tk is not None:
            tk.key = f"backbone.{tk.key}"
            if tk.fold_bias_key:
                tk.fold_bias_key = f"backbone.{tk.fold_bias_key}"
        return tk
    if sub[0] == "conv3x3_ocr":
        return _convbn("ocr.conv3x3_ocr.0", "ocr.conv3x3_ocr.1.0", sub[1:])
    if sub[0] == "aux_conv":
        return _convbn("ocr.aux_head.0", "ocr.aux_head.1.0", sub[1:])
    if sub[0] == "aux_cls":
        return _plain_conv("ocr.aux_head.2", sub[1:])
    if sub[0] == "ocr_distri":
        return _ocr_distri(sub[1:], base="ocr.ocr_distri_head")
    if sub[0] == "cls":
        return _plain_conv("ocr.cls_head", sub[1:])
    m = re.fullmatch(r"attn(\d)", sub[0])
    if m:
        i = int(m.group(1))
        if i == 2:
            return _plain_conv("scale_attn.conv2", sub[1:])
        return _convbn(f"scale_attn.conv{i}", f"scale_attn.bn{i}", sub[1:])
    return None


def fcnet_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """ResNetContextNet context='none' (models/nets.py) -> reference
    FcnNet / FcnNet_wo_dsn (nets/fcnet.py:21-105): backbone + cls_head
    Sequential(conv3x3, BNReLU, Dropout, 1x1) + optional dsn_head twin."""
    if path[0] == "backbone":
        tk = resnet_backbone_path(path[1:])
        if tk is not None:
            tk.key = f"backbone.{tk.key}"
            if tk.fold_bias_key:
                tk.fold_bias_key = f"backbone.{tk.fold_bias_key}"
        return tk
    if path[0] == "conv3x3":
        return _convbn("cls_head.0", "cls_head.1.0", path[1:])
    if path[0] == "cls":
        return _plain_conv("cls_head.3", path[1:])
    if path[0] == "dsn_conv":
        return _convbn("dsn_head.0", "dsn_head.1.0", path[1:])
    if path[0] == "dsn_cls":
        return _plain_conv("dsn_head.3", path[1:])
    return None


def spatial_ocrnet_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """SpatialOCRNet (models/nets.py) -> reference SpatialOCRNet
    (nets/ocrnet.py:19-69): backbone + conv_3x3 Sequential(conv, BNReLU)
    + spatial_ocr_head (SpatialOCR_Module) + head (1x1, bias) + dsn_head
    Sequential(conv, BNReLU, Dropout, 1x1 bias)."""
    if path[0] == "backbone":
        tk = resnet_backbone_path(path[1:])
        if tk is not None:
            tk.key = f"backbone.{tk.key}"
            if tk.fold_bias_key:
                tk.fold_bias_key = f"backbone.{tk.fold_bias_key}"
        return tk
    if path[0] == "conv3x3":
        return _convbn("conv_3x3.0", "conv_3x3.1.0", path[1:])
    if path[0] == "ocr_distri":
        return _ocr_distri(path[1:], base="spatial_ocr_head")
    if path[0] == "cls":
        return _plain_conv("head", path[1:])
    if path[0] == "dsn_conv":
        return _convbn("dsn_head.0", "dsn_head.1.0", path[1:])
    if path[0] == "dsn_cls":
        return _plain_conv("dsn_head.3", path[1:])
    return None


def hrnetnext_backbone_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """HRNetNext (models/hrnet.py:315-348) -> reference HighResolutionNext
    (hrnet_backbone.py:577-740): conv1/bn1 stem; transition{0..3} module
    lists (the newly spawned branch is a nested Sequential); stage{1..4}
    module lists share HighResolutionModule's branch/fuse naming.

    HighResolutionNext stage s holds s+1 branches, so the new branch in
    our transition{s}_b{i} is i == s (vs i == s-1 for the standard
    HRNet's transitions)."""
    name = path[0]
    if name == "stem":
        return _convbn("conv1", "bn1", path[1:])
    m = re.fullmatch(r"transition(\d)_b(\d)", name)
    if m:
        s, i = int(m.group(1)), int(m.group(2))
        base = f"transition{s - 1}.{i}"
        if i == s:
            base += ".0"
        return _convbn(f"{base}.0", f"{base}.1", path[1:])
    m = re.fullmatch(r"stage(\d)_module(\d+)", name)
    if m:
        s, mod = m.group(1), m.group(2)
        inner = path[1]
        b = re.fullmatch(r"branch(\d+)_block(\d+)", inner)
        if b:
            return _block(f"stage{s}.{mod}.branches.{b.group(1)}.{b.group(2)}",
                          path[2:])
        f = re.fullmatch(r"fuse(\d+)_(\d+)_ds(\d+)", inner)
        if f:
            base = (f"stage{s}.{mod}.fuse_layers."
                    f"{f.group(1)}.{f.group(2)}.{f.group(3)}")
            return _convbn(f"{base}.0", f"{base}.1", path[2:])
        f = re.fullmatch(r"fuse(\d+)_(\d+)", inner)
        if f:
            base = f"stage{s}.{mod}.fuse_layers.{f.group(1)}.{f.group(2)}"
            return _convbn(f"{base}.0", f"{base}.1", path[2:])
    return None


def _segfix_path(path: tuple[str, ...], backbone_fn) -> Optional[TorchKey]:
    """SegFixHRNet (models/nets.py) -> reference SegFix_HRNet
    (nets/segfix.py:25-89): HRNet backbone + twin 1x1 heads
    {mask,dir}_head = Sequential(conv bias=False, BNReLU, conv bias=False).
    Lets the published reference SegFix checkpoints drive our offset
    refiner."""
    if path[0] == "backbone":
        tk = backbone_fn(path[1:])
        if tk is not None:
            tk.key = f"backbone.{tk.key}"
            if tk.fold_bias_key:
                tk.fold_bias_key = f"backbone.{tk.fold_bias_key}"
        return tk
    m = re.fullmatch(r"(mask|dir)_conv", path[0])
    if m:
        return _convbn(f"{m.group(1)}_head.0", f"{m.group(1)}_head.1.0",
                       path[1:])
    m = re.fullmatch(r"(mask|dir)_cls", path[0])
    if m:
        return _plain_conv(f"{m.group(1)}_head.2", path[1:])
    return None


def segfix_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    return _segfix_path(path, hrnet_backbone_path)


def segfix_next_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """SegFix on the hrnet2x20 (HighResolutionNext) backbone — the
    run_hx_20_d_2*.sh script family."""
    return _segfix_path(path, hrnetnext_backbone_path)


def _self_attention(base: str, s: tuple[str, ...],
                    w_bn: bool = True) -> Optional[TorchKey]:
    """SelfAttention2D (models/attention.py) -> torch _SelfAttentionBlock:
    f_query/f_key are Sequentials [conv, BNReLU, conv, BNReLU]; f_value
    is a plain conv; W is [conv, BNReLU] (ISA flavor, ``w_bn``) or one
    plain conv (BaseOC flavor)."""
    m = re.fullmatch(r"f_(query|key)_(\d)", s[0])
    if m:
        idx = 0 if m.group(2) == "1" else 2
        return _plain_conv(f"{base}.f_{m.group(1)}.{idx}", s[1:])
    m = re.fullmatch(r"f_(query|key)_bn(\d)", s[0])
    if m:
        idx = 1 if m.group(2) == "1" else 3
        # BaseOC's f_query/f_key convs are biased (base_oc_block.py:54-69,
        # no bias= arg) -> fold into the BN; ISA's are bias=False.
        fold = (None if w_bn
                else f"{base}.f_{m.group(1)}.{idx - 1}")
        return _bnact(f"{base}.f_{m.group(1)}.{idx}.0", s[1:],
                      fold_conv=fold)
    if s[0] == "f_value":
        return _plain_conv(f"{base}.f_value", s[1:])
    if s[0] == "W":
        return _plain_conv(f"{base}.W.0" if w_bn else f"{base}.W", s[1:])
    if s[0] == "W_bn":
        return _bnact(f"{base}.W.1.0", s[1:]) if w_bn else None
    return None


def _asp_ocr(base: str, sub: tuple[str, ...]) -> Optional[TorchKey]:
    """SpatialOCRASP (models/ocr.py) -> SpatialOCR_ASP_Module
    (spatial_ocr_block.py:329-397): context = Sequential(conv3x3, BNReLU,
    SpatialOCR_Context); conv2..conv5 = the 1x1 + dilated branches;
    conv_bn_dropout = project.  The gather (object_head) is param-free."""
    if sub[0] == "context_conv":
        return _convbn(f"{base}.context.0", f"{base}.context.1.0", sub[1:])
    if sub[0] == "object_attention":
        return _object_attention(
            f"{base}.context.2.object_context_block", sub[1:])
    m = re.fullmatch(r"b(\d)", sub[0])
    if m:
        seq = f"{base}.conv{int(m.group(1)) + 2}"
        return _convbn(f"{seq}.0", f"{seq}.1.0", sub[1:])
    if sub[0] == "project":
        return _convbn(f"{base}.conv_bn_dropout.0",
                       f"{base}.conv_bn_dropout.1.0", sub[1:])
    return None


def asp_ocrnet_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """ASPOCRNet (models/nets.py) -> reference ASPOCRNet
    (nets/ocrnet.py:72-117): backbone + asp_ocr_head + head + dsn_head."""
    if path[0] == "backbone":
        tk = resnet_backbone_path(path[1:])
        if tk is not None:
            tk.key = f"backbone.{tk.key}"
            if tk.fold_bias_key:
                tk.fold_bias_key = f"backbone.{tk.fold_bias_key}"
        return tk
    if path[0] == "asp_ocr":
        return _asp_ocr("asp_ocr_head", path[1:])
    if path[0] == "cls":
        return _plain_conv("head", path[1:])
    if path[0] == "dsn_conv":
        return _convbn("dsn_head.0", "dsn_head.1.0", path[1:])
    if path[0] == "dsn_cls":
        return _plain_conv("dsn_head.3", path[1:])
    return None


def ce2p_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """CE2PNet context='asp_ocr' (models/ce2p.py) -> reference CE2P_ASPOCR
    (nets/ce2pnet.py:19-96): backbone + dsn + edgelayer (Edge_Module) +
    asp_ocr_head + decoder (CE2P_Decoder_Module) + cls fuse head.
    (CE2P_OCRNet/CE2P_IdealOCRNet are inexecutable upstream — see
    models/ce2p.py — so asp_ocr is the only importable variant.)"""
    if path[0] == "backbone":
        tk = resnet_backbone_path(path[1:])
        if tk is not None:
            tk.key = f"backbone.{tk.key}"
            if tk.fold_bias_key:
                tk.fold_bias_key = f"backbone.{tk.fold_bias_key}"
        return tk
    if path[0] == "dsn_conv":
        return _convbn("dsn.0", "dsn.1.0", path[1:])
    if path[0] == "dsn_cls":
        return _plain_conv("dsn.3", path[1:])
    if path[0] == "edge":
        s = path[1:]
        m = re.fullmatch(r"conv([123])", s[0])
        if m:
            seq = f"edgelayer.conv{m.group(1)}"
            return _convbn(f"{seq}.0", f"{seq}.1.0", s[1:])
        if s[0] in ("conv4", "conv5"):
            return _plain_conv(f"edgelayer.{s[0]}", s[1:])
        return None
    if path[0] == "context":
        return _asp_ocr("asp_ocr_head", path[1:])
    if path[0] == "decoder":
        s = path[1:]
        if s[0] in ("conv1", "conv2"):
            return _convbn(f"decoder.{s[0]}.0", f"decoder.{s[0]}.1.0", s[1:])
        if s[0] == "conv3a":
            return _convbn("decoder.conv3.0", "decoder.conv3.1.0", s[1:])
        if s[0] == "conv3b":
            return _convbn("decoder.conv3.2", "decoder.conv3.3.0", s[1:])
        if s[0] == "conv4":
            return _plain_conv("decoder.conv4", s[1:])
        return None
    if path[0] == "final_conv":
        return _convbn("cls.0", "cls.1.0", path[1:])
    if path[0] == "final_cls":
        return _plain_conv("cls.2", path[1:])
    return None


def _resnet_backbone_prefixed(path: tuple[str, ...]) -> Optional[TorchKey]:
    tk = resnet_backbone_path(path)
    if tk is not None:
        tk.key = f"backbone.{tk.key}"
        if tk.fold_bias_key:
            tk.fold_bias_key = f"backbone.{tk.fold_bias_key}"
    return tk


def base_ocnet_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """ResNetContextNet context='base_oc' -> reference BaseOCNet
    (nets/ocnet.py:18-62): oc_module_pre + BaseOC_Module (one stage,
    concat-with-input project) + cls + dropout-free dsn."""
    if path[0] == "backbone":
        return _resnet_backbone_prefixed(path[1:])
    if path[0] == "conv3x3":
        return _convbn("oc_module_pre.0", "oc_module_pre.1.0", path[1:])
    if path[0] == "context":
        s = path[1:]
        if s[0] == "attention":
            return _self_attention("oc_module.stages.0", s[1:], w_bn=False)
        if s[0] == "project":
            return _convbn("oc_module.conv_bn_dropout.0",
                           "oc_module.conv_bn_dropout.1.0", s[1:])
        return None
    if path[0] == "cls":
        return _plain_conv("cls", path[1:])
    if path[0] == "dsn_conv":
        return _convbn("dsn.0", "dsn.1.0", path[1:])
    if path[0] == "dsn_cls":
        return _plain_conv("dsn.2", path[1:])
    return None


def asp_ocnet_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """ResNetContextNet context='asp_oc' -> reference AspOCNet
    (nets/ocnet.py:64-100): context = Sequential(conv3x3, BNReLU,
    ASP_OC_Module) with a scale-2 BaseOC_Context branch."""
    if path[0] == "backbone":
        return _resnet_backbone_prefixed(path[1:])
    if path[0] == "conv3x3":
        return _convbn("context.0", "context.1.0", path[1:])
    if path[0] == "context":
        s = path[1:]
        asp = "context.2"
        if s[0] == "context_conv":
            return _convbn(f"{asp}.context.0", f"{asp}.context.1.0", s[1:])
        if s[0] == "oc":
            t = s[1:]
            ctx = f"{asp}.context.2"
            if t[0] == "attention":
                return _self_attention(f"{ctx}.stages.0", t[1:], w_bn=False)
            if t[0] == "ctx_bn":
                return _bnact(f"{ctx}.conv_bn_dropout.0.0", t[1:])
            return None
        m = re.fullmatch(r"b(\d)", s[0])
        if m:
            seq = f"{asp}.conv{int(m.group(1)) + 2}"
            return _convbn(f"{seq}.0", f"{seq}.1.0", s[1:])
        if s[0] == "project":
            return _convbn(f"{asp}.conv_bn_dropout.0",
                           f"{asp}.conv_bn_dropout.1.0", s[1:])
        return None
    if path[0] == "cls":
        return _plain_conv("cls", path[1:])
    if path[0] == "dsn_conv":
        return _convbn("dsn.0", "dsn.1.0", path[1:])
    if path[0] == "dsn_cls":
        return _plain_conv("dsn.2", path[1:])
    return None


def isanet_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """ResNetContextNet context='isa' -> reference ISANet
    (nets/isanet.py:9-48): isa_head = Sequential(conv3x3, BNReLU,
    ISA_Module) whose blocks hold long/short-range SelfAttentionBlock2D
    twins; residual project = conv_bn."""
    if path[0] == "backbone":
        return _resnet_backbone_prefixed(path[1:])
    if path[0] == "conv3x3":
        return _convbn("isa_head.0", "isa_head.1.0", path[1:])
    if path[0] == "context":
        s = path[1:]
        isa = "isa_head.2"
        m = re.fullmatch(r"isa(\d+)", s[0])
        if m:
            blk = f"{isa}.stages.{m.group(1)}"
            if s[1] == "long_range":
                return _self_attention(f"{blk}.long_range_sa", s[2:])
            if s[1] == "short_range":
                return _self_attention(f"{blk}.short_range_sa", s[2:])
            return None
        if s[0] == "up_conv":
            return _convbn(f"{isa}.up_conv.0", f"{isa}.up_conv.1.0", s[1:])
        if s[0] == "project":
            return _convbn(f"{isa}.conv_bn.0", f"{isa}.conv_bn.1.0", s[1:])
        return None
    if path[0] == "cls":
        return _plain_conv("cls_head", path[1:])
    if path[0] == "dsn_conv":
        return _convbn("dsn_head.0", "dsn_head.1.0", path[1:])
    if path[0] == "dsn_cls":
        return _plain_conv("dsn_head.3", path[1:])
    return None


def semantic_fpn_decoder_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """FPNSemanticDecoder (models/nets.py) -> reference SemanticFPN's
    neck (FPN) + decoder (SemanticFPNDecoder) (nets/semantic_fpn.py:
    11-206).  Scale-head Sequential indices: [conv, BNReLU(, Upsample)]
    per sub-stage, so conv k sits at 3k on upsampled levels and 2k on
    the stride-4 level.  (Backbone import is separate — reference PVT
    checkpoints are timm-format.)"""
    s = path[1:] if path[0] == "decoder" else path
    m = re.fullmatch(r"lateral(\d)", s[0])
    if m:
        return _plain_conv(f"neck.lateral_convs.{m.group(1)}", s[1:])
    m = re.fullmatch(r"fpn_conv(\d)", s[0])
    if m:
        return _plain_conv(f"neck.fpn_convs.{m.group(1)}", s[1:])
    m = re.fullmatch(r"scale_head(\d)_(\d)", s[0])
    if m:
        i, k = int(m.group(1)), int(m.group(2))
        idx = 3 * k if i > 0 else 2 * k
        base = f"decoder.scale_heads.{i}.{idx}"
        return _convbn(base, f"decoder.scale_heads.{i}.{idx + 1}.0", s[1:])
    if s[0] == "cls":
        return _plain_conv("decoder.cls_seg", s[1:])
    return None


def _linear_t(w: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] -> flax Dense kernel [in, out]."""
    return np.ascontiguousarray(np.asarray(w).T)


def _linear(base: str, sub: tuple[str, ...]) -> Optional[TorchKey]:
    """A flax nn.Dense: ('kernel',) / ('bias',) -> torch nn.Linear."""
    if sub == ("kernel",):
        return TorchKey(f"{base}.weight", _linear_t)
    if sub == ("bias",):
        return TorchKey(f"{base}.bias")
    return None


def _layernorm(base: str, sub: tuple[str, ...]) -> Optional[TorchKey]:
    """A flax nn.LayerNorm: ('scale',) / ('bias',) -> torch nn.LayerNorm."""
    if sub == ("scale",):
        return TorchKey(f"{base}.weight")
    if sub == ("bias",):
        return TorchKey(f"{base}.bias")
    return None


def _kv_half(first: bool):
    """Split torch's fused kv Linear [2C, C] into our separate k/v Dense."""
    def f(w: np.ndarray) -> np.ndarray:
        w = np.asarray(w)
        h = w.shape[0] // 2
        part = w[:h] if first else w[h:]
        return np.ascontiguousarray(part.T) if part.ndim == 2 else part
    return f


def _pvt_block(base: str, sub: tuple[str, ...]) -> Optional[TorchKey]:
    """PVTBlock (models/pvt.py) -> reference Block / GroupBlock
    ({pvt,pcpvt,svt}_backbone.py): norm1/attn/norm2/mlp(fc1,fc2); the
    torch kv Linear is fused (split into our k/v), SVT's local qkv is
    fused on both sides."""
    if sub[0] in ("norm1", "norm2"):
        return _layernorm(f"{base}.{sub[0]}", sub[1:])
    if sub[0] == "fc1":
        return _linear(f"{base}.mlp.fc1", sub[1:])
    if sub[0] == "fc2":
        return _linear(f"{base}.mlp.fc2", sub[1:])
    if sub[0] == "attn":
        s = sub[1:]
        if s[0] in ("q", "proj", "qkv"):
            return _linear(f"{base}.attn.{s[0]}", s[1:])
        if s[0] in ("k", "v"):
            if s[1] == "kernel":
                return TorchKey(f"{base}.attn.kv.weight",
                                _kv_half(s[0] == "k"))
            if s[1] == "bias":
                return TorchKey(f"{base}.attn.kv.bias",
                                _kv_half(s[0] == "k"))
            return None
        if s[0] == "sr":
            return _plain_conv(f"{base}.attn.sr", s[1:])
        if s[0] == "sr_norm":
            return _layernorm(f"{base}.attn.norm", s[1:])
    return None


def _pvt_family_path(path: tuple[str, ...],
                     v1: bool) -> Optional[TorchKey]:
    """PVT (models/pvt.py) -> reference backbones.  v1 (pvt_backbone.py):
    patch_embed{1..4} / pos_embed{1..4} / block{1..4}; pcpvt/svt
    ({pcpvt,svt}_backbone.py): patch_embeds.{i} / blocks.{i} /
    pos_block.{i}.proj.0 (the PEG depthwise conv)."""
    name = path[0]
    m = re.fullmatch(r"patch(\d)", name)
    if m:
        i = int(m.group(1))
        base = f"patch_embed{i + 1}" if v1 else f"patch_embeds.{i}"
        return _plain_conv(f"{base}.proj", path[1:])
    m = re.fullmatch(r"patch_norm(\d)", name)
    if m:
        i = int(m.group(1))
        base = f"patch_embed{i + 1}" if v1 else f"patch_embeds.{i}"
        return _layernorm(f"{base}.norm", path[1:])
    m = re.fullmatch(r"pos_embed(\d)", name)
    if m and len(path) == 1:
        def reshape_pe(a: np.ndarray) -> np.ndarray:
            a = np.asarray(a)  # [1, N, C]
            g = int(round(a.shape[1] ** 0.5))
            return np.ascontiguousarray(a.reshape(1, g, g, a.shape[2]))
        return TorchKey(f"pos_embed{int(m.group(1)) + 1}", reshape_pe)
    m = re.fullmatch(r"pos_cnn(\d)", name)
    if m:
        return _plain_conv(f"pos_block.{m.group(1)}.proj.0", path[1:])
    m = re.fullmatch(r"stage(\d)_block(\d+)", name)
    if m:
        i, b = int(m.group(1)), m.group(2)
        base = f"block{i + 1}.{b}" if v1 else f"blocks.{i}.{b}"
        return _pvt_block(base, path[1:])
    return None


def pvt_backbone_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    return _pvt_family_path(path, v1=True)


def pcpvt_backbone_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    return _pvt_family_path(path, v1=False)


def hrnet_mem_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """HRNet_W48_MEM (nets/hrnet.py:153-188) = HRNet_W48_CONTRAST under an
    ``encoder_q.`` prefix + 4 queue buffers (handled separately by
    extract_memory_queues)."""
    tk = hrnet_seg_path(path)
    if tk is not None:
        tk.key = f"encoder_q.{tk.key}"
        if tk.fold_bias_key:
            tk.fold_bias_key = f"encoder_q.{tk.fold_bias_key}"
    return tk


MEM_QUEUE_KEYS = ("segment_queue", "segment_queue_ptr",
                  "pixel_queue", "pixel_queue_ptr")


def _patch_linear_to_conv(w: np.ndarray) -> np.ndarray:
    """SETR's linear patch embed (setr.py:55,101-109) -> strided-conv kernel.

    torch Linear weight [emb, p*p*c] over patches flattened pixels-row-major
    with channels fastest == flax HWIO conv kernel [p, p, c, emb].  SETR
    always runs on RGB (num_channels=3 in every factory, setr.py:447 etc.).
    """
    w = np.asarray(w)
    emb, flat = w.shape
    c = 3
    p = int(round((flat // c) ** 0.5))
    assert p * p * c == flat, (emb, flat)
    return np.ascontiguousarray(w.T.reshape(p, p, c, emb))


def _setr_encoder_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """ViT encoder (models/vit.py ViT) -> reference SegmentationTransformer
    (setr.py:22-118 + transformer.py:87-119).  Blocks unroll to
    ``transformer.net.{2i}`` (attention residual: fn.norm / fn.fn.{qkv,proj})
    and ``transformer.net.{2i+1}`` (FF residual: fn.norm / fn.fn.net.{0,3})."""
    name = path[0]
    if name == "linear_encoding":
        if path[1:] == ("kernel",):
            return TorchKey("linear_encoding.weight", _patch_linear_to_conv)
        if path[1:] == ("bias",):
            return TorchKey("linear_encoding.bias")
        return None
    if name == "pos_embed" and len(path) == 1:
        return TorchKey("position_encoding.pe.weight")
    if name == "pre_head_ln":
        return _layernorm("pre_head_ln", path[1:])
    m = re.fullmatch(r"block(\d+)", name)
    if m:
        i = int(m.group(1))
        attn_base = f"transformer.net.{2 * i}.fn"
        ff_base = f"transformer.net.{2 * i + 1}.fn"
        sub = path[1:]
        if sub[0] == "norm1":
            return _layernorm(f"{attn_base}.norm", sub[1:])
        if sub[0] in ("qkv", "proj"):
            return _linear(f"{attn_base}.fn.{sub[0]}", sub[1:])
        if sub[0] == "norm2":
            return _layernorm(f"{ff_base}.norm", sub[1:])
        if sub[0] == "fc1":
            return _linear(f"{ff_base}.fn.net.0", sub[1:])
        if sub[0] == "fc2":
            return _linear(f"{ff_base}.fn.net.3", sub[1:])
    return None


def _setr_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    """SETR (models/vit.py) -> reference SETR_Naive/PUP/MLA (setr.py).

    Decoder names are disjoint across the three variants, so one mapper
    serves all: Naive conv1/bn1/conv2 (setr.py:191-210); PUP pup{0..4} ->
    decode_net.{0,2,4,6,8} (setr.py:272-289 — odd slots are Upsamples);
    MLA mla{k}_{in,intmd,out1,out2} -> net{k+1}_{in.layer_1,
    intmd.layer_intmd, out.layer_2, out.layer_3} + cls -> output_net.conv_1
    (setr.py:330-433).  The reference's ``net1_intmd`` is dead code (decode
    never calls it for the deepest tap, setr.py:364-367), so its two torch
    keys legitimately stay unused on import.
    """
    if path[0] == "backbone":
        return _setr_encoder_path(path[1:])
    name = path[0]
    if name in ("conv1", "conv2"):
        return _plain_conv(name, path[1:])
    if name == "bn1" and len(path) == 3 and path[1] == "bn":
        return TorchKey(f"bn1.{_BN_LEAF[path[2]]}")
    m = re.fullmatch(r"pup(\d)", name)
    if m:
        return _plain_conv(f"decode_net.{2 * int(m.group(1))}", path[1:])
    m = re.fullmatch(r"mla(\d)_(in|intmd|out1|out2)", name)
    if m:
        k, part = int(m.group(1)), m.group(2)
        layer = {"in": "in.layer_1", "intmd": "intmd.layer_intmd",
                 "out1": "out.layer_2", "out2": "out.layer_3"}[part]
        return _plain_conv(f"net{k + 1}_{layer}", path[1:])
    if name == "cls":
        return _plain_conv("output_net.conv_1", path[1:])
    return None


def setr_path(path: tuple[str, ...]) -> Optional[TorchKey]:
    return _setr_path(path)


def extract_memory_queues(torch_sd: dict) -> Optional[dict]:
    """Pop HRNet_W48_MEM's queue buffers (nets/hrnet.py:165-171) into our
    MemoryBank layout: [C, M, D] float32 queues + [C] int32 ring pointers
    (ops/queue.MemoryBank).  Returns None when the checkpoint has no
    queues (non-mem model)."""
    if "segment_queue" not in torch_sd:
        return None
    return {
        "segment_queue": np.asarray(torch_sd.pop("segment_queue"),
                                    np.float32),
        "segment_ptr": np.asarray(torch_sd.pop("segment_queue_ptr"),
                                  np.int32),
        "pixel_queue": np.asarray(torch_sd.pop("pixel_queue"), np.float32),
        "pixel_ptr": np.asarray(torch_sd.pop("pixel_queue_ptr"), np.int32),
    }


PATH_MAPPERS: dict[str, Callable[[tuple[str, ...]], Optional[TorchKey]]] = {
    "hrnet_seg": hrnet_seg_path,
    "hrnet_backbone": hrnet_backbone_path,
    "resnet_backbone": resnet_backbone_path,
    "deeplab": deeplab_path,
    "hrnet_ocr": hrnet_ocr_path,
    "ms_ocr": ms_ocr_path,
    "fcnet": fcnet_path,
    "spatial_ocrnet": spatial_ocrnet_path,
    "segfix": segfix_path,
    "segfix_next": segfix_next_path,
    "hrnetnext_backbone": hrnetnext_backbone_path,
    "asp_ocrnet": asp_ocrnet_path,
    "ce2p": ce2p_path,
    "base_ocnet": base_ocnet_path,
    "asp_ocnet": asp_ocnet_path,
    "isanet": isanet_path,
    "semantic_fpn_decoder": semantic_fpn_decoder_path,
    "hrnet_mem": hrnet_mem_path,
    "pvt_backbone": pvt_backbone_path,
    "pcpvt_backbone": pcpvt_backbone_path,
    "setr": setr_path,
}


def mapper_for_model(model_name: str) -> str:
    """Registry model name -> PATH_MAPPERS key (tools/import_torch_ckpt.py)."""
    if model_name == "ms_ocr":
        return "ms_ocr"
    if model_name.startswith("hrnet") and "mem" in model_name:
        # HRNet_W48_MEM checkpoints carry the encoder_q. prefix + queues.
        return "hrnet_mem"
    if "ocr" in model_name and model_name.startswith("hrnet"):
        return "hrnet_ocr"
    if model_name.startswith("deeplab"):
        return "deeplab"
    if model_name.startswith("fcnet"):
        return "fcnet"
    if model_name == "spatial_ocrnet" or model_name.startswith("ideal_"):
        # The ideal_* oracle nets share SpatialOCRNet's exact param layout
        # (ideal_ocrnet.py:19-263: conv_3x3 / spatial_ocr_head / head /
        # dsn_head; f_pixel/f_object exist even on the use_gt paths).
        return "spatial_ocrnet"
    if model_name.startswith("segfix"):
        return "segfix"
    if model_name == "spatial_asp_ocrnet":
        return "asp_ocrnet"
    if model_name == "ce2p_asp_ocrnet":
        return "ce2p"
    if model_name in ("base_ocnet", "asp_ocnet", "isanet"):
        return model_name
    if model_name.startswith("setr"):
        return "setr"
    if model_name.startswith("hrnet"):
        return "hrnet_seg"
    raise KeyError(
        f"no torch-import mapper for {model_name!r}; use --mapper to pick "
        f"one of {sorted(PATH_MAPPERS)} or import the backbone only"
    )


def convert_state_dict(
    variables: dict,
    torch_sd: dict[str, np.ndarray],
    mapper: Callable[[tuple[str, ...]], Optional[TorchKey]] | str = "hrnet_seg",
    strict: bool = True,
) -> tuple[dict, dict]:
    """Fill flax ``variables`` from a torch state dict.

    Returns (new_variables, report) where report lists ``loaded``,
    ``missing`` (flax leaves with no torch source) and ``unused`` (torch keys
    never consumed).  ``strict`` raises if any mappable leaf has a
    shape-mismatched or absent torch tensor.
    """
    if isinstance(mapper, str):
        mapper = PATH_MAPPERS[mapper]

    out = {}
    loaded, missing = [], []
    used: set[str] = set()
    for col in ("params", "batch_stats"):
        flat = flatten_dict(variables.get(col, {}))
        new_flat = {}
        for path, val in flat.items():
            tk = mapper(tuple(path))
            if tk is None or tk.key not in torch_sd:
                new_flat[path] = val
                missing.append("/".join(path))
                continue
            src = torch_sd[tk.key]
            arr = tk.transform(src) if tk.transform else np.asarray(src)
            if tk.fold_bias_key and tk.fold_bias_key in torch_sd:
                arr = arr - np.asarray(torch_sd[tk.fold_bias_key])
                used.add(tk.fold_bias_key)
            if arr.shape != val.shape:
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}: torch {tk.key} "
                    f"{arr.shape} vs flax {val.shape}"
                )
            new_flat[path] = arr.astype(np.asarray(val).dtype)
            used.add(tk.key)
            loaded.append("/".join(path))
        if new_flat:
            out[col] = unflatten_dict(new_flat)
    for col in variables:
        if col not in out:
            out[col] = variables[col]

    unused = [k for k in torch_sd if k not in used and "num_batches_tracked" not in k]
    report = {"loaded": loaded, "missing": missing, "unused": unused}
    if strict and not loaded:
        raise ValueError("no leaves were loaded — wrong mapper or state dict?")
    return out, report


def strip_prefixes(torch_sd: dict[str, Any], prefixes=("module.",)) -> dict[str, Any]:
    """Normalize checkpoint key layouts (module_runner.py:88-119 equivalents)."""
    out = {}
    for k, v in torch_sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
        out[k] = v
    return out


def save_variables(variables: dict, path: str) -> None:
    """Serialize converted variables with flax msgpack (trainer-loadable)."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {k: v for k, v in variables.items()}))


def load_variables(path: str) -> dict:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
