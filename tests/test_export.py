"""jax.export serving artifacts (tools/export_model.py).

The exported StableHLO blob must survive serialize -> deserialize and
reproduce the live eval forward exactly; the dynamic-batch export must
serve multiple batch sizes from one artifact.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from contrastiveseg_tpu.models.nets import build_model
from contrastiveseg_tpu.utils.config import Config


def _tiny_cfg():
    return Config.from_args(overrides=[
        "network.model_name=hrnet_w18",
        "network.backbone=hrnet18",
        "data.num_classes=5",
    ])


@pytest.fixture(scope="module")
def exported_pair():
    import sys

    sys.path.insert(0, "tools")
    from export_model import _build_forward

    from contrastiveseg_tpu.engine.state import restore_eval_state

    cfg = _tiny_cfg()
    model = build_model(cfg)
    state = restore_eval_state(cfg, model, (32, 32), batch=1)
    fwd = _build_forward(cfg, model, state, "ss")
    return cfg, fwd


def test_export_roundtrip_matches_live_forward(exported_pair):
    cfg, fwd = exported_pair
    spec = jax.ShapeDtypeStruct((1, 32, 32, 3), np.float32)
    exported = jax.export.export(jax.jit(fwd))(spec)
    blob = exported.serialize()
    assert len(blob) > 1000

    reloaded = jax.export.deserialize(blob)
    x = np.random.default_rng(0).uniform(-2, 2, (1, 32, 32, 3)).astype(
        np.float32)
    live = np.asarray(jax.jit(fwd)(jax.numpy.asarray(x)))
    served = np.asarray(reloaded.call(jax.numpy.asarray(x)))
    assert served.shape == (1, 32, 32, 5)
    # Same program, same backend: tolerance only for fusion-order noise.
    np.testing.assert_allclose(served, live, rtol=1e-5, atol=1e-4)


def test_export_dynamic_batch(exported_pair):
    cfg, fwd = exported_pair
    (b,) = jax.export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, 32, 32, 3), np.float32)
    exported = jax.export.export(jax.jit(fwd))(spec)
    reloaded = jax.export.deserialize(exported.serialize())
    for n in (1, 3):
        x = np.random.default_rng(n).uniform(-2, 2, (n, 32, 32, 3)).astype(
            np.float32)
        out = np.asarray(reloaded.call(jax.numpy.asarray(x)))
        assert out.shape == (n, 32, 32, 5)
        assert np.isfinite(out).all()
