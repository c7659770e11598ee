"""The full reference ResNet arch zoo (resnet_backbone.py:137-290): every
arch string resolves, and the new families (BasicBlock resnet18/34,
WiderResNetA2) run a real forward."""

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveseg_tpu.models.backbone_selector import build_backbone
from contrastiveseg_tpu.models.resnet import (
    RESNET_SPECS,
    WIDE_RESNET_STRUCTURES,
)

REFERENCE_ARCHS = [
    "deepbase_resnet18", "deepbase_resnet18_dilated8",
    "deepbase_resnet18_dilated16",
    "resnet34", "resnet34_dilated8", "resnet34_dilated16",
    "resnet50", "resnet50_dilated8", "resnet50_dilated16",
    "deepbase_resnet50", "deepbase_resnet50_dilated8",
    "deepbase_resnet50_dilated16",
    "resnet101", "resnet101_dilated8", "resnet101_dilated16",
    "deepbase_resnet101", "deepbase_resnet101_dilated8",
    "deepbase_resnet101_dilated16",
    "deepbase_resnet152_dilated8", "deepbase_resnet152_dilated16",
    "resnext101_32x8d_dilated8", "resnext101_32x16d_dilated8",
    "resnext101_32x32d_dilated8", "resnext101_32x48d_dilated8",
    "wide_resnet16_dilated8", "wide_resnet20_dilated8",
    "wide_resnet38_dilated8",
    "deepbase_resnest50_dilated8", "deepbase_resnest101_dilated8",
    "deepbase_resnest200_dilated8", "deepbase_resnest269_dilated8",
    "deepbase_dcn_resnet50_dilated8", "deepbase_dcn_resnet50_dilated16",
    "deepbase_dcn_resnet101_dilated8", "deepbase_dcn_resnet101_dilated16",
]


def test_every_reference_arch_resolves_and_traces():
    known = set(RESNET_SPECS) | set(WIDE_RESNET_STRUCTURES)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    for name in REFERENCE_ARCHS:
        assert name in known, name
        m = build_backbone(name)
        variables = jax.eval_shape(
            lambda k, xx, m=m: m.init({"params": k}, xx, True),
            jax.random.key(0), x,
        )
        assert variables["params"], name


def test_basicblock_resnet18_forward():
    m = build_backbone("deepbase_resnet18_dilated8")
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3), jnp.float32)
    v = m.init({"params": jax.random.key(1)}, x, train=False)
    feats = m.apply(v, x, train=False)
    # stride 8 with dilation; BasicBlock expansion 1 -> 512 final.
    assert feats[-1].shape == (1, 4, 4, 512)
    assert np.isfinite(np.asarray(feats[-1])).all()


def test_wider_resnet16_forward():
    m = build_backbone("wide_resnet16_dilated8")
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3), jnp.float32)
    v = m.init({"params": jax.random.key(1)}, x, train=False)
    feats = m.apply(v, x, train=False)
    # Reference tuple_features: mod4 (512), mod5 (1024), mod6 (2048),
    # bn_out(mod7) (4096) — wide_resnet_models.py:184-199.
    assert [f.shape[-1] for f in feats] == [512, 1024, 2048, 4096]
    assert feats[-1].shape[1:3] == (4, 4)  # output stride 8
    assert np.isfinite(np.asarray(feats[-1])).all()
