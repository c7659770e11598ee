"""Extended model zoo: output contracts for ISA/OC/CE2P/SegFix/MscaleOCR."""

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveseg_tpu.models.nets import MODELS
from contrastiveseg_tpu.utils.config import Config


def _cfg(model_name, backbone="resnet50_dilated8", num_classes=4):
    return Config.from_args(overrides=[
        f"data.num_classes={num_classes}",
        f"network.model_name={model_name}",
        f"network.backbone={backbone}",
    ])


def _run(model, hw=(32, 64), **kw):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, *hw, 3), dtype=np.float32)
    )
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x,
        train=False, **kw,
    )
    return model.apply(variables, x, train=False, **kw), hw


def test_isanet():
    out, hw = _run(MODELS.build("isanet", _cfg("isanet")))
    assert out["seg"].shape == (1, *hw, 4)
    assert out["seg_aux"].shape == (1, *hw, 4)


def test_base_ocnet():
    out, hw = _run(MODELS.build("base_ocnet", _cfg("base_ocnet")))
    assert out["seg"].shape == (1, *hw, 4)


def test_ce2p():
    out, hw = _run(MODELS.build("ce2p_ocrnet", _cfg("ce2p_ocrnet")))
    assert out["seg"].shape == (1, *hw, 4)
    assert out["edge"].shape == (1, *hw, 2)
    assert out["seg_final"].shape == (1, *hw, 4)


def test_segfix():
    out, hw = _run(MODELS.build(
        "segfix_hrnet", _cfg("segfix_hrnet", backbone="hrnet18")))
    assert out["mask"].shape == (1, hw[0] // 4, hw[1] // 4, 2)
    assert out["dir"].shape == (1, hw[0] // 4, hw[1] // 4, 8)


def test_ideal_ocrnet_variants_differ():
    """The five oracle variants (ideal_ocrnet.py:19-263) are distinct
    computations: same seed + input must give pairwise different outputs."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 32, 64, 3), dtype=np.float32))
    gt = jnp.asarray(rng.integers(-1, 4, size=(1, 32, 64)).astype(np.int32))
    outs = {}
    for name in ("ideal_spatial_ocrnet", "ideal_spatial_ocrnet_b",
                 "ideal_spatial_ocrnet_c", "ideal_gather_ocrnet",
                 "ideal_distribute_ocrnet"):
        model = MODELS.build(name, _cfg(name))
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x,
            gt_labels=gt, train=False,
        )
        out = model.apply(variables, x, gt_labels=gt, train=False)
        assert out["seg"].shape == (1, 32, 64, 4)
        assert np.isfinite(np.asarray(out["seg"])).all()
        outs[name] = np.asarray(out["seg"])
    names = list(outs)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            assert not np.allclose(outs[a], outs[b], atol=1e-5), (a, b)


def test_ccnet():
    """CCNet head consumes ops/cc_attention (VERDICT.md weak-3 wiring)."""
    out, hw = _run(MODELS.build("ccnet", _cfg("ccnet")))
    assert out["seg"].shape == (1, *hw, 4)
    assert out["seg_aux"].shape == (1, *hw, 4)
    assert np.isfinite(np.asarray(out["seg"])).all()


def test_variant_bottleneck_backbones():
    """resnext / wide / resnest / dcn bottleneck families (tiny depths)."""
    from contrastiveseg_tpu.models.resnet import ResNet, ResNetSpec

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 32, 64, 3), dtype=np.float32))
    specs = {
        "resnext": ResNetSpec((1, 1, 1, 1), deep_base=False, dilate_scale=8,
                              groups=8, width_per_group=4),
        "wide": ResNetSpec((1, 1, 1, 1), deep_base=False, dilate_scale=8,
                           width_mult=2.0),
        "resnest": ResNetSpec((1, 1, 1, 1), deep_base=False, dilate_scale=8,
                              radix=2),
        "dcn": ResNetSpec((1, 1, 1, 1), deep_base=False, dilate_scale=8,
                          dcn_layer4=True),
    }
    for name, spec in specs.items():
        m = ResNet(spec)
        v = m.init(jax.random.key(0), x, train=False)
        feats = m.apply(v, x, train=False)
        assert feats[-1].shape == (1, 4, 8, 2048), (name, feats[-1].shape)
        assert np.isfinite(np.asarray(feats[-1])).all(), name


def test_hanet_ocr():
    """hrnet_w48_ocr_b_ha counterpart (HANet height attention)."""
    out, hw = _run(MODELS.build(
        "hrnet_w18_ocr_b_ha", _cfg("hrnet_w18_ocr_b_ha", backbone="hrnet18")))
    assert out["seg"].shape == (1, *hw, 4)
    assert out["seg_aux"].shape == (1, *hw, 4)


def test_hrnet2x20_backbone():
    from contrastiveseg_tpu.models.backbone_selector import build_backbone

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 32, 64, 3), dtype=np.float32))
    m = build_backbone("hrnet2x20")
    v = m.init(jax.random.key(0), x, train=False)
    feats = m.apply(v, x, train=False)
    assert [f.shape[-1] for f in feats] == [20, 40, 80, 160, 320]
    assert feats[0].shape[1:3] == (16, 32)  # stride 2 base resolution


def test_mobilenet_v1_v3():
    from contrastiveseg_tpu.models.backbone_selector import build_backbone

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 32, 64, 3), dtype=np.float32))
    for name, main_ch in (("mobilenetv1_dilated8", 1024),
                          ("mobilenetv3_dilated8", 960)):
        m = build_backbone(name)
        v = m.init(jax.random.key(0), x, train=False)
        feats = m.apply(v, x, train=False)
        assert feats[-1].shape == (1, 4, 8, main_ch), (name, feats[-1].shape)


def test_mobilenet_reference_name_spelling():
    """The reference selector matches 'mobilenet_v1' etc. with underscores
    (backbone_selector.py:52-58); both spellings must resolve."""
    from contrastiveseg_tpu.models.backbone_selector import build_backbone

    for name, cls_name in (("mobilenet_v1", "MobileNetV1"),
                           ("mobilenet_v2_dilated8", "MobileNetV2"),
                           ("mobilenet_v3", "MobileNetV3"),
                           ("mobilenetv2", "MobileNetV2")):
        m = build_backbone(name)
        assert type(m).__name__ == cls_name
    assert build_backbone("mobilenet_v2_dilated8").spec.dilate_scale == 8


def test_fcnet_wo_dsn_single_output():
    """fcnet_wo_dsn (reference nets/fcnet.py:72-105, unregistered in the
    reference's own SEG_MODEL_DICT): same FCN head, no DSN aux output."""
    out, hw = _run(MODELS.build("fcnet_wo_dsn", _cfg("fcnet_wo_dsn")))
    assert out["seg"].shape == (1, *hw, 4)
    assert "seg_aux" not in out
    # The dsn head params must not exist (finetune/weight-count parity).
    with_aux = _run(MODELS.build("fcnet", _cfg("fcnet")))[0]
    assert "seg_aux" in with_aux


def test_pyramid_ocnet():
    """pyramid_ocnet (script run_r_101_d_8_pyramidoc_train.sh; model
    missing from the reference's SEG_MODEL_DICT — rebuilt from the OCNet
    paper's Pyramid-OC)."""
    out, hw = _run(MODELS.build("pyramid_ocnet", _cfg("pyramid_ocnet")))
    assert out["seg"].shape == (1, *hw, 4)
    assert out["seg_aux"].shape == (1, *hw, 4)


def test_hrnet_isa_both_spellings():
    """hrnet_w48_isa / hrnet48_isa (lip+pascal / coco isa scripts; model
    absent upstream) — HRNet concat -> ISA head, seg + aux outputs."""
    for name in ("hrnet_w48_isa", "hrnet48_isa"):
        out, hw = _run(MODELS.build(name, _cfg(name, backbone="hrnet18")))
        assert out["seg"].shape == (1, *hw, 4)
        assert out["seg_aux"].shape == (1, *hw, 4)


def test_setr_registry_smoke():
    """setr_{naive,pup,mla} registry nets (vit/setr.py:158-433) build and
    run at full vit_base dims; output is input-resolution logits.  (Parity
    on imported weights: test_torch_parity.py::test_setr_forward_parity_eval.)
    64x64 input -> 4x4 patch grid; decoders upsample x16 back to input."""
    for name in ("setr_naive", "setr_pup", "setr_mla"):
        out, hw = _run(MODELS.build(name, _cfg(name, backbone="vit_base")),
                       hw=(64, 64))
        assert out["seg"].shape == (1, *hw, 4), (name, out["seg"].shape)
        assert np.isfinite(np.asarray(out["seg"])).all(), name
