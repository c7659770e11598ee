"""Small utils: meters, IO helpers, flops, counters, norms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from contrastiveseg_tpu.metrics.counters import (
    MultiLabelRunningScore,
    SimpleCounterRunningScore,
)
from contrastiveseg_tpu.utils.flops import conv2d_flops, xla_flops
from contrastiveseg_tpu.utils.io_helpers import JsonHelper, MaskHelper
from contrastiveseg_tpu.utils.meters import AverageMeter, Timer


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.count == 2


def test_simple_counter():
    s = SimpleCounterRunningScore()
    pred = np.array([0, 1, 2, 3])
    gt = np.array([0, 1, 0, -1])
    s.update(pred, gt)
    assert abs(s.get_mean_acc() - 2 / 3) < 1e-9


def test_multilabel_counter():
    s = MultiLabelRunningScore()
    pred = np.array([0, 1])
    gm = np.array([[1, 0, 1], [1, 0, 0]])
    s.update(pred, gm)
    assert s.get_mean_acc() == 0.5


def test_flops():
    assert conv2d_flops(8, 8, 4, 4, 3) == 2 * 8 * 8 * 4 * 4 * 9
    f = xla_flops(lambda a, b: a @ b, jnp.ones((64, 64)), jnp.ones((64, 64)))
    assert f >= 2 * 64 * 64 * 64 * 0.9  # at least the matmul


def test_mask_helper_and_json(tmp_path):
    onehot = MaskHelper.label_to_onehot(np.array([[0, 2], [-1, 1]]), 3)
    assert onehot[0, 0, 0] == 1 and onehot[1, 0].sum() == 0
    p = str(tmp_path / "x.json")
    JsonHelper.save_file({"a": 1}, p)
    assert JsonHelper.load_file(p) == {"a": 1}


def test_norms_forward():
    from contrastiveseg_tpu.models.norms import FRN, SwitchableNorm

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 8, 4), dtype=np.float32)
    )
    frn = FRN()
    v = frn.init(jax.random.key(0), x)
    y = frn.apply(v, x)
    assert y.shape == x.shape

    sn = SwitchableNorm()
    v = sn.init(jax.random.key(1), x, train=True)
    y, mut = sn.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_video_helper_roundtrip(tmp_path):
    """VideoHelper (reference video_helper.py): frames -> mp4 -> frames,
    list-like reader with accurate random access."""
    pytest.importorskip("cv2")
    from contrastiveseg_tpu.utils.io_helpers import ImageHelper, VideoHelper

    fdir = tmp_path / "frames"
    fdir.mkdir()
    shades = (10, 120, 240)
    for i, c in enumerate(shades):
        ImageHelper.save(str(fdir / f"{i:06d}.png"),
                         np.full((32, 48, 3), c, np.uint8))
    vid = str(tmp_path / "v.mp4")
    assert VideoHelper.frames2video(str(fdir), vid, fps=5) == 3

    r = VideoHelper.VideoReader(vid)
    assert len(r) == 3 and (r.width, r.height) == (48, 32)
    for i, c in enumerate(shades):
        assert abs(int(r[i].mean()) - c) < 6  # lossy codec tolerance
    assert abs(int(r[0].mean()) - shades[0]) < 6  # seek-back
    r.close()

    out = tmp_path / "back"
    assert VideoHelper.video2frames(vid, str(out)) == 3
    assert len(list(out.iterdir())) == 3


def test_profile_step_trace_parsing(tmp_path):
    """tools/profile_step.py trace aggregation: XLA-ish complete events
    aggregate by name with source attribution; non-XLA events drop."""
    import gzip
    import json
    import sys

    sys.path.insert(0, "tools")
    import profile_step as ps

    trace = {"traceEvents": [
        {"ph": "X", "name": "fusion.1", "dur": 100.0,
         "args": {"source": "hrnet.py:42"}},
        {"ph": "X", "name": "fusion.1", "dur": 50.0, "args": {}},
        {"ph": "X", "name": "convolution.7", "dur": 200.0, "args": {}},
        {"ph": "X", "name": "python_call", "dur": 999.0, "args": {}},
        {"ph": "M", "name": "fusion.1", "args": {}},
    ]}
    d = tmp_path / "plugins" / "profile"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump(trace, f)

    events = ps.collect_trace_events(str(tmp_path))
    assert len(events) == 5
    agg = ps.device_op_durations(events)
    assert agg["fusion.1"]["total_us"] == 150.0
    assert agg["fusion.1"]["count"] == 2
    assert agg["fusion.1"]["source"] == "hrnet.py:42"
    assert agg["convolution.7"]["total_us"] == 200.0
    assert "python_call" not in agg  # not an XLA op
