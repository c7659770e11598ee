"""Model zoo: forward output contracts at tiny shapes (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastiveseg_tpu.models.nets import MODELS
from contrastiveseg_tpu.utils.config import Config


def _cfg(model_name, backbone=None, num_classes=5):
    ov = [f"data.num_classes={num_classes}",
          f"network.model_name={model_name}"]
    if backbone:
        ov.append(f"network.backbone={backbone}")
    return Config.from_args(overrides=ov)


def _run(model, hw=(32, 64)):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, *hw, 3), dtype=np.float32)
    )
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x,
        train=False,
    )
    return model.apply(variables, x, train=False), hw


def test_hrnet_contrast_outputs():
    out, hw = _run(MODELS.build("hrnet_w18_contrast", _cfg("hrnet_w18_contrast")))
    assert out["seg"].shape == (1, hw[0] // 4, hw[1] // 4, 5)
    assert out["embed"].shape == (1, hw[0] // 4, hw[1] // 4, 256)
    n = np.linalg.norm(np.asarray(out["embed"]), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-4)


def test_hrnet_plain_upsamples():
    out, hw = _run(MODELS.build("hrnet_w18", _cfg("hrnet_w18")))
    assert out["seg"].shape == (1, *hw, 5)


def test_hrnet_ocr_outputs():
    out, hw = _run(MODELS.build("hrnet_w18_ocr", _cfg("hrnet_w18_ocr")))
    assert out["seg"].shape == (1, *hw, 5)
    assert out["seg_aux"].shape == (1, *hw, 5)


def test_deeplab_contrast_outputs():
    cfg = _cfg("deeplab_v3_contrast", backbone="resnet50_dilated8")
    out, hw = _run(MODELS.build("deeplab_v3_contrast", cfg))
    # dilated-8: stride 8 outputs (stem /2, pool /2, layer2 /2).
    assert out["seg"].shape == (1, hw[0] // 8, hw[1] // 8, 5)
    assert out["seg_aux"].shape == (1, hw[0] // 8, hw[1] // 8, 5)
    assert out["embed"].shape == (1, hw[0] // 8, hw[1] // 8, 256)


def test_registry_covers_reference_names():
    # SEG_MODEL_DICT parity for the families built so far.
    for name in [
        "hrnet_w48", "hrnet_w48_contrast", "hrnet_w48_mem", "hrnet_w48_ocr",
        "hrnet_w48_ocr_contrast", "deeplab_v3", "deeplab_v3_contrast",
        "spatial_ocrnet",
    ]:
        assert name in MODELS, name
