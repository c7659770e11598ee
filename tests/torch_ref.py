"""Test oracle: build reference (torch) models on CPU for parity checks.

Imports the UNTRUSTED read-only reference at /root/reference purely as a
numerical oracle (the pacnet-style dual-implementation pattern, SURVEY.md §4).
Nothing from here ships in the product package.

The reference's transformer backbones import `timm`, which is not installed;
a minimal in-process shim provides the three symbols they need.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import types

REFERENCE_ROOT = "/root/reference"


def _install_timm_shim():
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    models.__path__ = []  # mark as package
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")
    vit = types.ModuleType("timm.models.vision_transformer")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            t.normal_(mean, std).clamp_(a, b)
        return t

    def register_model(fn):
        return fn

    def _cfg(url="", **kwargs):
        return dict(url=url, **kwargs)

    class Mlp(nn.Module):
        # Faithful to old-timm Mlp: fc1/act/fc2 names — SVT's GroupBlock
        # subclasses timm's Block, so its state_dict keys must match the
        # real library's (mlp.fc1.*, not mlp.0.*).
        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    class Attention(nn.Module):
        def __init__(self, dim, num_heads=8, qkv_bias=False, qk_scale=None,
                     attn_drop=0.0, proj_drop=0.0, **kw):
            super().__init__()
            self.num_heads = num_heads
            self.scale = qk_scale or (dim // num_heads) ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, C // self.num_heads)
            q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)

    class Block(nn.Module):
        # Old-timm Block signature (positional through norm_layer), as
        # SVT's GroupBlock calls it (svt_backbone.py:130-135).
        def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                     qk_scale=None, drop=0.0, attn_drop=0.0, drop_path=0.0,
                     act_layer=nn.GELU, norm_layer=nn.LayerNorm, **kw):
            super().__init__()
            self.norm1 = norm_layer(dim)
            self.attn = Attention(dim, num_heads=num_heads,
                                  qkv_bias=qkv_bias, qk_scale=qk_scale,
                                  attn_drop=attn_drop, proj_drop=drop)
            self.drop_path = DropPath(drop_path)
            self.norm2 = norm_layer(dim)
            self.mlp = Mlp(dim, int(dim * mlp_ratio), act_layer=act_layer,
                           drop=drop)

        def forward(self, x):
            x = x + self.drop_path(self.attn(self.norm1(x)))
            return x + self.drop_path(self.mlp(self.norm2(x)))

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    registry.register_model = register_model
    vit.Attention = Attention
    vit.Block = Block
    vit._cfg = _cfg
    models.layers = layers
    models.registry = registry
    models.vision_transformer = vit
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers
    sys.modules["timm.models.registry"] = registry
    sys.modules["timm.models.vision_transformer"] = vit


def _install_yacs_shim():
    if "yacs" in sys.modules:
        return

    class CfgNode(dict):
        """Attribute-style dict, enough for hrnet_config.py's usage."""

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    yacs = types.ModuleType("yacs")
    yacs.__path__ = []
    config = types.ModuleType("yacs.config")
    config.CfgNode = CfgNode
    yacs.config = config
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = config


def _install_torchcontrib_shim():
    """segmentor/tools/optim_scheduler.py imports torchcontrib (SWA) at
    module top; only the swa_* policies touch it."""
    if "torchcontrib" in sys.modules:
        return
    torchcontrib = types.ModuleType("torchcontrib")
    optim = types.ModuleType("torchcontrib.optim")

    class SWA:  # placeholder: constructing it means a swa_* policy was used
        def __init__(self, *a, **k):
            raise NotImplementedError("torchcontrib SWA shim")

    optim.SWA = SWA
    torchcontrib.optim = optim
    sys.modules["torchcontrib"] = torchcontrib
    sys.modules["torchcontrib.optim"] = optim


def _install_thnn_shim():
    """pacnet/pac.py imports torch._thnn (removed in torch>=1.0); only the
    legacy CUDA Function paths dereference it — the native_impl=True code
    used as oracle never does."""
    if "torch._thnn" in sys.modules:
        return
    thnn = types.ModuleType("torch._thnn")
    thnn.type2backend = {}
    sys.modules["torch._thnn"] = thnn


def _patch_pil_cubic():
    """Pillow >= 10 removed Image.CUBIC (pil_aug_transforms.py) and
    Pillow >= 7 removed PILLOW_VERSION (csHelpers.py's sanity probe)."""
    try:
        import PIL
        from PIL import Image

        if not hasattr(Image, "CUBIC"):
            Image.CUBIC = Image.BICUBIC
        if not hasattr(Image, "NEAREST"):
            Image.NEAREST = Image.Resampling.NEAREST
        if not hasattr(PIL, "PILLOW_VERSION"):
            PIL.PILLOW_VERSION = PIL.__version__
    except ImportError:
        pass


def setup_reference():
    """Make `lib.*` importable; returns the reference root."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _install_timm_shim()
    _install_yacs_shim()
    _install_torchcontrib_shim()
    _install_thnn_shim()
    _patch_pil_cubic()
    return REFERENCE_ROOT


def build_configer(overrides: dict | None = None):
    """Reference Configer seeded with a minimal CPU-friendly config."""
    setup_reference()
    from lib.utils.tools.configer import Configer

    cfg = {
        "data": {"num_classes": 19},
        "network": {"backbone": "hrnet48", "bn_type": "torchbn",
                    "pretrained": None, "resume": None, "stride": 4,
                    "factors": [], "loss_weights": {"aux_loss": 0.4,
                                                    "seg_loss": 1.0}},
        "contrast": {"proj_dim": 256, "temperature": 0.1,
                     "base_temperature": 0.07, "max_samples": 1024,
                     "max_views": 100, "stride": 8, "warmup_iters": 0,
                     "loss_weight": 0.1, "use_rmi": False,
                     "use_lovasz": False, "with_memory": False,
                     "memory_size": 100, "pixel_update_freq": 10},
        "loss": {"loss_type": "contrast_ce_loss", "params": {
            "ce_reduction": "mean", "ce_ignore_index": -1}},
        "lr": {"base_lr": 0.01},
        "solver": {"display_iter": 10},
    }

    def _merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                _merge(dst[k], v)
            else:
                dst[k] = v

    if overrides:
        _merge(cfg, overrides)
    f = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
    json.dump(cfg, f)
    f.flush()
    return Configer(args_parser=argparse.Namespace(configs=f.name, REMAIN=[]))


def build_hrnet_contrast(num_classes=19, proj_dim=256, seed=0):
    """Reference HRNet_W48_CONTRAST (lib/models/nets/hrnet.py:59-95), eval mode."""
    import torch

    setup_reference()
    torch.manual_seed(seed)
    c = build_configer({"data": {"num_classes": num_classes},
                        "contrast": {"proj_dim": proj_dim}})
    from lib.models.nets.hrnet import HRNet_W48_CONTRAST

    net = HRNet_W48_CONTRAST(c)
    net.eval()
    return net


def state_dict_numpy(net) -> dict:
    """state_dict as {key: np.float32 array}.

    ``.copy()`` matters: ``.numpy()`` on a CPU tensor shares storage with
    the live parameter, so without it the snapshot silently tracks any
    later ``optimizer.step()`` (burned the trajectory-parity fixture)."""
    return {k: v.detach().cpu().numpy().copy()
            for k, v in net.state_dict().items()}


def build_hrnet_ocr_contrast(num_classes=19, proj_dim=256, seed=0):
    """Reference HRNet_W48_OCR_CONTRAST (lib/models/nets/hrnet.py:98-150)."""
    import torch

    setup_reference()
    torch.manual_seed(seed)
    c = build_configer({"data": {"num_classes": num_classes},
                        "contrast": {"proj_dim": proj_dim}})
    from lib.models.nets.hrnet import HRNet_W48_OCR_CONTRAST

    net = HRNet_W48_OCR_CONTRAST(c)
    net.eval()
    return net


def build_ms_ocr(num_classes=19, seed=0):
    """Reference MscaleOCR (lib/models/nets/ms_ocrnet.py:95-257)."""
    import torch

    setup_reference()
    torch.manual_seed(seed)
    c = build_configer({"data": {"num_classes": num_classes}})
    from lib.models.nets.ms_ocrnet import MscaleOCR

    net = MscaleOCR(c)
    net.eval()
    return net


def build_deeplab_contrast(num_classes=19, proj_dim=256, seed=0,
                           backbone="deepbase_resnet101_dilated8"):
    """Reference DeepLabV3Contrast (lib/models/nets/deeplab.py:8-41), eval."""
    import torch

    setup_reference()
    torch.manual_seed(seed)
    c = build_configer({"data": {"num_classes": num_classes},
                        "network": {"backbone": backbone,
                                    "multi_grid": [1, 1, 1]},
                        "contrast": {"proj_dim": proj_dim}})
    from lib.models.nets.deeplab import DeepLabV3Contrast

    net = DeepLabV3Contrast(c)
    net.eval()
    return net


def build_fcnet(num_classes=19, seed=0, wo_dsn=False,
                backbone="deepbase_resnet101_dilated8"):
    """Reference FcnNet / FcnNet_wo_dsn (lib/models/nets/fcnet.py:21-105),
    eval.  FcnNet_wo_dsn is absent from the reference's SEG_MODEL_DICT, so
    it is imported straight from the module."""
    import torch

    setup_reference()
    torch.manual_seed(seed)
    c = build_configer({"data": {"num_classes": num_classes},
                        "network": {"backbone": backbone,
                                    "multi_grid": [1, 1, 1]}})
    from lib.models.nets.fcnet import FcnNet, FcnNet_wo_dsn

    net = (FcnNet_wo_dsn if wo_dsn else FcnNet)(c)
    net.eval()
    return net


def build_spatial_ocrnet(num_classes=19, seed=0,
                         backbone="deepbase_resnet101_dilated8"):
    """Reference SpatialOCRNet (lib/models/nets/ocrnet.py:19-69), eval."""
    import torch

    setup_reference()
    torch.manual_seed(seed)
    c = build_configer({"data": {"num_classes": num_classes},
                        "network": {"backbone": backbone,
                                    "multi_grid": [1, 1, 1]}})
    from lib.models.nets.ocrnet import SpatialOCRNet

    net = SpatialOCRNet(c)
    net.eval()
    return net


def build_segfix_hrnet(seed=0, backbone="hrnet48"):
    """Reference SegFix_HRNet (lib/models/nets/segfix.py:25-89), eval.
    num_directions comes from DTOffsetConfig (env dt_num_classes, default 8)."""
    import torch

    setup_reference()
    torch.manual_seed(seed)
    c = build_configer({"network": {"backbone": backbone}})
    from lib.models.nets.segfix import SegFix_HRNet

    net = SegFix_HRNet(c)
    net.eval()
    return net


def build_asp_ocrnet(num_classes=19, seed=0,
                     backbone="deepbase_resnet101_dilated8"):
    """Reference ASPOCRNet (lib/models/nets/ocrnet.py:72-117), eval."""
    import torch

    setup_reference()
    torch.manual_seed(seed)
    c = build_configer({"data": {"num_classes": num_classes},
                        "network": {"backbone": backbone,
                                    "multi_grid": [1, 1, 1]}})
    from lib.models.nets.ocrnet import ASPOCRNet

    net = ASPOCRNet(c)
    net.eval()
    return net


def build_ce2p_asp_ocr(num_classes=20, seed=0,
                       backbone="deepbase_resnet101_dilated8"):
    """Reference CE2P_ASPOCR (lib/models/nets/ce2pnet.py:19-96), eval —
    the only executable CE2P variant (CE2P_OCRNet/CE2P_IdealOCRNet crash
    on Decoder_Module's signature)."""
    import torch

    setup_reference()
    torch.manual_seed(seed)
    c = build_configer({"data": {"num_classes": num_classes},
                        "network": {"backbone": backbone,
                                    "multi_grid": [1, 1, 1]}})
    from lib.models.nets.ce2pnet import CE2P_ASPOCR

    net = CE2P_ASPOCR(c)
    net.eval()
    return net


def build_oc_family(model, num_classes=19, seed=0,
                    backbone="deepbase_resnet101_dilated8",
                    factors=((8, 8),)):
    """Reference BaseOCNet / AspOCNet (nets/ocnet.py) / ISANet
    (nets/isanet.py), eval."""
    import torch

    setup_reference()
    torch.manual_seed(seed)
    c = build_configer({"data": {"num_classes": num_classes},
                        "network": {"backbone": backbone,
                                    "multi_grid": [1, 1, 1],
                                    "factors": [list(f) for f in factors]}})
    if model == "base_ocnet":
        from lib.models.nets.ocnet import BaseOCNet as Net
    elif model == "asp_ocnet":
        from lib.models.nets.ocnet import AspOCNet as Net
    elif model == "isanet":
        from lib.models.nets.isanet import ISANet as Net
    else:
        raise KeyError(model)

    net = Net(c)
    net.eval()
    return net


def build_semantic_fpn_head(num_classes=19, seed=0):
    """Reference FPN neck + SemanticFPNDecoder (nets/semantic_fpn.py),
    assembled standalone (the full SemanticFPN needs a PVT backbone whose
    checkpoints are timm-format; the neck+decoder is the reference-owned
    part).  Returns an eval nn.Module with .neck/.decoder submodules."""
    import torch
    import torch.nn as nn

    setup_reference()
    torch.manual_seed(seed)
    from lib.models.nets.semantic_fpn import FPN, SemanticFPNDecoder

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            self.neck = FPN(in_channels=[64, 128, 320, 512],
                            out_channels=256)
            self.decoder = SemanticFPNDecoder(
                feature_strides=[4, 8, 16, 32], num_classes=num_classes)

        def forward(self, feats):
            return self.decoder(self.neck(feats))

    net = Head()
    net.eval()
    return net


def build_ideal_ocrnet(variant, num_classes=7, seed=0,
                       backbone="deepbase_resnet50_dilated8"):
    """Reference Ideal*OCRNet oracle nets (nets/ideal_ocrnet.py:19-263),
    eval.  Their forwards hardcode ``.type(torch.cuda.FloatTensor)`` on
    the label map; on CPU we alias it to the CPU FloatTensor."""
    import torch

    setup_reference()
    if not torch.cuda.is_available():
        torch.cuda.FloatTensor = torch.FloatTensor
        torch.cuda.LongTensor = torch.LongTensor
        # label_to_onehot hard-calls .cuda() (spatial_ocr_block.py:30);
        # swap in a CPU-equivalent (clone instead of the in-place ignore
        # rewrite — outputs identical).
        from lib.models.modules import spatial_ocr_block as sob

        def _label_to_onehot_cpu(gt, num_classes, ignore_index=-1):
            x = gt.clone()
            x[x == ignore_index] = num_classes
            onehot = torch.zeros(*x.shape, num_classes + 1)
            onehot = onehot.scatter_(-1, x.unsqueeze(-1), 1)
            return onehot.permute(0, 3, 1, 2)

        sob.label_to_onehot = _label_to_onehot_cpu
    torch.manual_seed(seed)
    c = build_configer({"data": {"num_classes": num_classes},
                        "network": {"backbone": backbone,
                                    "multi_grid": [1, 1, 1]}})
    from lib.models.nets import ideal_ocrnet

    cls = {
        "spatial": ideal_ocrnet.IdealSpatialOCRNet,
        "spatial_b": ideal_ocrnet.IdealSpatialOCRNetB,
        "spatial_c": ideal_ocrnet.IdealSpatialOCRNetC,
        "gather": ideal_ocrnet.IdealGatherOCRNet,
        "distribute": ideal_ocrnet.IdealDistributeOCRNet,
    }[variant]
    net = cls(c)
    net.eval()
    return net


def build_hrnet_ocr_b(num_classes=19, seed=0):
    """Reference HRNet_W48_OCR_B (lib/models/nets/hrnet.py:248-293):
    the 256-wide OCR head variant."""
    import torch

    setup_reference()
    torch.manual_seed(seed)
    c = build_configer({"data": {"num_classes": num_classes}})
    from lib.models.nets.hrnet import HRNet_W48_OCR_B

    net = HRNet_W48_OCR_B(c)
    net.eval()
    return net


def build_hrnet_mem(num_classes=19, proj_dim=256, memory_size=40, seed=0):
    """Reference HRNet_W48_MEM (lib/models/nets/hrnet.py:153-188), eval:
    HRNet_W48_CONTRAST under an encoder_q. prefix + 4 queue buffers."""
    import torch

    setup_reference()
    torch.manual_seed(seed)
    c = build_configer({"data": {"num_classes": num_classes},
                        "contrast": {"proj_dim": proj_dim,
                                     "memory_size": memory_size}})
    from lib.models.nets.hrnet import HRNet_W48_MEM

    net = HRNet_W48_MEM(c, dim=proj_dim)
    net.eval()
    return net


def build_hrnet_plain(num_classes=19, seed=0):
    """Reference HRNet_W48 (lib/models/nets/hrnet.py:24-56), eval."""
    import torch

    setup_reference()
    torch.manual_seed(seed)
    c = build_configer({"data": {"num_classes": num_classes}})
    from lib.models.nets.hrnet import HRNet_W48

    net = HRNet_W48(c)
    net.eval()
    return net


def build_pvt_backbone(arch, img_size=64, seed=0):
    """Reference PVT / PCPVT / SVT backbones
    (lib/models/backbones/pvt/{pvt,pcpvt,svt}_backbone.py), eval.
    ``img_size`` feeds the factories' train input_size[0] read."""
    import torch

    setup_reference()
    torch.manual_seed(seed)
    c = build_configer({
        "network": {"backbone": arch},
        "train": {"data_transformer": {"input_size": [img_size, img_size]}},
    })
    if arch.startswith("pcpvt"):
        from lib.models.backbones.pvt import pcpvt_backbone as M
        fn = getattr(M, arch.replace("pcpvt", "pvt"))
    elif arch.startswith("svt"):
        from lib.models.backbones.pvt import svt_backbone as M
        fn = getattr(M, arch)
    else:
        from lib.models.backbones.pvt import pvt_backbone as M
        fn = getattr(M, arch)
    net = fn(configer=c)
    net.eval()
    return net


def build_setr(decoder, img_dim=64, patch_dim=16, num_classes=5,
               embedding_dim=32, num_heads=4, num_layers=4, hidden_dim=64,
               seed=0):
    """Reference SETR_Naive / SETR_PUP / SETR_MLA
    (lib/models/backbones/vit/setr.py:158-433) at test-sized dims, eval.
    Dropout rates zeroed (eval mode drops them anyway; keeps intent clear).
    """
    import torch

    setup_reference()
    torch.manual_seed(seed)
    from lib.models.backbones.vit import setr as S

    cls = {"naive": S.SETR_Naive, "pup": S.SETR_PUP, "mla": S.SETR_MLA}[decoder]
    net = cls(
        img_dim, patch_dim, 3, num_classes,
        embedding_dim=embedding_dim, num_heads=num_heads,
        num_layers=num_layers, hidden_dim=hidden_dim,
        dropout_rate=0.0, attn_dropout_rate=0.0,
        conv_patch_representation=False, positional_encoding_type="learned",
    )
    net.eval()
    return net
