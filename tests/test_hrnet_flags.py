"""Env-var flag layer on HRNet: full_res_stem / drop_stage4 /
keep_imagenet_head (reference hrnet_backbone.py:303,547,557 — SURVEY.md §5
config; lifted into the typed config tree as network.* booleans)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastiveseg_tpu.models.hrnet import HRNET_SPECS, HRNet


@pytest.fixture(scope="module")
def x():
    return jax.random.normal(jax.random.key(0), (1, 32, 64, 3), jnp.float32)


def _run(x, **flags):
    model = HRNet(HRNET_SPECS["hrnet18"], **flags)
    variables = model.init({"params": jax.random.key(1)}, x, train=False)
    return model.apply(variables, x, train=False)


def test_default_four_branches(x):
    feats = _run(x)
    assert len(feats) == 4
    assert feats[0].shape[1:3] == (8, 16)  # stride 4


def test_full_res_stem_keeps_resolution(x):
    feats = _run(x, full_res_stem=True)
    assert len(feats) == 4
    assert feats[0].shape[1:3] == (32, 64)  # stride 1: no stem downsample


def test_drop_stage4_returns_three_branches(x):
    feats = _run(x, drop_stage4=True)
    assert len(feats) == 3
    assert feats[-1].shape[-1] == HRNET_SPECS["hrnet18"].stage3.num_channels[-1]


def test_keep_imagenet_head_channels(x):
    feats = _run(x, keep_imagenet_head=True)
    # incre cascade sums at 256/512/1024 wide; final map is 2048 wide at
    # the coarsest resolution (hrnet_backbone.py:557-572).
    assert [f.shape[-1] for f in feats] == [128, 256, 512, 2048]
    assert feats[-1].shape[1:3] == (1, 2)  # stride 32
    for f in feats:
        assert np.isfinite(np.asarray(f)).all()


def test_config_reachable():
    from contrastiveseg_tpu.models.nets import build_model
    from contrastiveseg_tpu.presets import get_preset

    cfg = get_preset("smoke_hrnet_w18")
    cfg = cfg.updated("network.drop_stage4", True)
    model = build_model(cfg)
    assert model.drop_stage4 is True
