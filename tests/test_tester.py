"""Tester inference modes, incl. the newly wired crf_ss_test and
ms_test_depth (reference segmentor/tester.py:147-167,425-503,535-575)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from PIL import Image

from contrastiveseg_tpu.engine.tester import Tester
from contrastiveseg_tpu.utils.config import Config

C = 4


class TinySeg(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return {"seg": nn.Conv(C, (3, 3), padding=1, name="cls")(x)}


def _tester(**over):
    cfg = Config.from_args(overrides=[f"data.num_classes={C}"])
    for k, v in over.items():
        cfg = cfg.updated(k, v)
    model = TinySeg()
    x = jnp.zeros((1, 16, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    state = types.SimpleNamespace(params=variables["params"], batch_stats={})
    return Tester(cfg, model, state)


def _img(b=1, h=16, w=32):
    return jnp.asarray(
        np.random.default_rng(0).standard_normal((b, h, w, 3), dtype=np.float32))


def test_ss_and_ms_modes():
    t = _tester()
    x = _img()
    assert t.ss_test(x).shape == (1, 16, 32, C)
    assert t.ms_test(x).shape == (1, 16, 32, C)


def test_sscrop_mode():
    t = _tester()
    out = t.sscrop_test(_img(), (8, 16))
    assert out.shape == (1, 16, 32, C)
    assert np.isfinite(np.asarray(out)).all()


def test_crf_ss_mode():
    t = _tester(**{"test.mode": "crf_ss_test"})
    out = np.asarray(t.infer(_img()))
    assert out.shape == (1, 16, 32, C)
    assert np.isfinite(out).all()
    # CRF output is a probability field.
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-4)


def test_ms_test_depth_fallback_matches_ms_test():
    """Without a stereo map the depth fusion degrades to uniform ms_test."""
    t = _tester(**{"test.mode": "ms_test_depth"})
    x = _img()
    depth = np.asarray(t.ms_test_depth(x, metas=[{"name": "missing"}]))
    plain = np.asarray(t.ms_test(x))
    np.testing.assert_allclose(depth, plain, atol=1e-4)


def test_ms_test_depth_with_stereo(tmp_path):
    t = _tester(**{"test.mode": "ms_test_depth",
                   "test.stereo_path": str(tmp_path)})
    x = _img()
    # 16-bit disparity PNG (raw/256 -> depth) at image resolution.
    raw = (np.random.default_rng(1).integers(256, 60000, size=(16, 32))
           .astype(np.uint16))
    Image.fromarray(raw).save(tmp_path / "frame.png")
    out = np.asarray(t.ms_test_depth(x, metas=[{"name": "frame"}]))
    assert out.shape == (1, 16, 32, C)
    assert np.isfinite(out).all()
    # Depth weighting must differ from the uniform fusion.
    plain = np.asarray(t.ms_test(x))
    assert not np.allclose(out, plain, atol=1e-4)


def test_test_offset_writes_npz(tmp_path):
    """SegFix offset test path writes {name}.npz consumable by
    tools/segfix.py apply (reference tester_offset.py)."""
    import types

    class TinySegFix(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            f = nn.Conv(8, (3, 3), padding=1, name="stem")(x[:, ::4, ::4])
            return {"mask": nn.Conv(2, (1, 1), name="mask")(f),
                    "dir": nn.Conv(8, (1, 1), name="dir")(f)}

    cfg = Config.from_args(overrides=[
        "data.num_classes=4", "network.model_name=segfix_hrnet",
        f"test.out_dir={tmp_path}"])
    model = TinySegFix()
    x = jnp.zeros((1, 16, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    state = types.SimpleNamespace(params=variables["params"], batch_stats={})
    t = Tester(cfg, model, state)

    batch = {
        "image": np.random.default_rng(0).standard_normal(
            (2, 16, 32, 3)).astype(np.float32),
        "meta": [{"ori_size": (32, 16), "name": "a"},
                 {"ori_size": (20, 10), "name": "b"}],
    }
    n = t.test_offset([batch])
    assert n == 2
    a = np.load(tmp_path / "offset" / "a.npz")
    assert a["mask"].shape == (16, 32) and a["dir_label"].shape == (16, 32)
    b = np.load(tmp_path / "offset" / "b.npz")
    assert b["mask"].shape == (10, 20)
    assert set(np.unique(a["mask"])) <= {0, 1}
    assert a["dir_label"].max() < 8


def test_save_gt_label_writes_gt_vis(tmp_path):
    # save_gt_label flag (reference tester.py:209-217): colorized GT maps
    # land in gt_vis/ alongside label/ + vis/ predictions.
    t = _tester(**{"test.save_gt_label": True, "dataset": "cityscapes"})
    rng = np.random.default_rng(1)
    batch = {
        "image": np.asarray(_img()),
        "label": rng.integers(0, C, size=(1, 16, 32)).astype(np.int32),
        "meta": [{"ori_size": (32, 16), "name": "sample0"}],
    }
    n = t.test(batches=[batch], out_dir=str(tmp_path))
    assert n == 1
    assert (tmp_path / "gt_vis" / "sample0.png").exists()
    gt_png = np.asarray(Image.open(tmp_path / "gt_vis" / "sample0.png"))
    assert gt_png.shape[:2] == (16, 32)
