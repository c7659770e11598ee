"""Backbone selector: string -> (module, feature contract).

Reference: BackboneSelector.get_backbone string-matching
(lib/models/backbones/backbone_selector.py:28-63).  Every backbone returns
a list of NHWC feature maps; `aux_main` says which two entries feed the
DSN-aux / main heads.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from contrastiveseg_tpu.models.hrnet import HRNET_SPECS, HRNEXT_SPECS, HRNet, HRNetNext
from contrastiveseg_tpu.models.mobilenet import (
    MobileNetSpec,
    MobileNetV1,
    MobileNetV2,
    MobileNetV3,
)
from contrastiveseg_tpu.models.pvt import PVT, PVT_SPECS
from contrastiveseg_tpu.models.resnet import (
    RESNET_SPECS,
    WIDE_RESNET_STRUCTURES,
    ResNet,
    WiderResNetA2,
)
from contrastiveseg_tpu.models.vit import VIT_SPECS, ViTFeatures


def build_backbone(name: str, dtype: Any = jnp.float32,
                   module_name: str = "backbone", img_size: int = 224):
    """Returns a flax module whose __call__(x, train) -> list of features.
    ``img_size`` sizes the PVT v1 absolute position-embedding grids
    (reference reads train input_size[0], pvt_backbone.py:277-280)."""
    # Exact names first: RESNET_SPECS carries the reference's full arch
    # zoo with per-name deep_base semantics (deepbase_resnet18 is deep,
    # resnet34 is not); the deepbase_ strip below remains for the repo's
    # historical short names, whose specs default deep_base=True.
    if name in RESNET_SPECS:
        return ResNet(RESNET_SPECS[name], dtype=dtype, name=module_name)
    if name in WIDE_RESNET_STRUCTURES:
        return WiderResNetA2(WIDE_RESNET_STRUCTURES[name], dtype=dtype,
                             name=module_name)
    name = name.replace("deepbase_", "")
    if name in HRNET_SPECS:
        return HRNet(HRNET_SPECS[name], dtype=dtype, name=module_name)
    if name in RESNET_SPECS:
        return ResNet(RESNET_SPECS[name], dtype=dtype, name=module_name)
    if name in PVT_SPECS:
        return PVT(PVT_SPECS[name], img_size=img_size, dtype=dtype,
                   name=module_name)
    if name in VIT_SPECS:
        return ViTFeatures(VIT_SPECS[name], dtype=dtype, name=module_name)
    if name in HRNEXT_SPECS:
        return HRNetNext(arch=name, dtype=dtype, name=module_name)
    if name.startswith("mobilenet"):
        # Accept both the reference's 'mobilenet_v1' spelling
        # (backbone_selector.py:52-58) and the compact 'mobilenetv1'.
        dilate = 8 if "dilated8" in name else (16 if "dilated16" in name else None)
        version = name.replace("mobilenet", "").replace("_", "")[:2]
        cls = {"v1": MobileNetV1, "v2": MobileNetV2,
               "v3": MobileNetV3}[version]
        return cls(MobileNetSpec(dilate_scale=dilate), dtype=dtype,
                   name=module_name)
    raise KeyError(
        f"unknown backbone {name!r}; known: "
        f"{sorted([*HRNET_SPECS, *HRNEXT_SPECS, *RESNET_SPECS, *WIDE_RESNET_STRUCTURES, *PVT_SPECS, *VIT_SPECS, 'mobilenetv1', 'mobilenetv2', 'mobilenetv3'])}"
    )
