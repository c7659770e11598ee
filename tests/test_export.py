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
    fwd, _ = _build_forward(cfg, model, state, "ss")
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


def test_sidecar_weights_roundtrip(tmp_path):
    """--weights sidecar: the weight-free artifact + npz sidecar must
    reproduce the baked artifact exactly, and the blob must not grow with
    the model (weights are arguments, not HLO constants)."""
    import sys

    sys.path.insert(0, "tools")
    from export_model import _build_forward

    from contrastiveseg_tpu.engine.state import restore_eval_state
    from contrastiveseg_tpu.utils.tree_io import load_tree_npz, save_tree_npz

    cfg = _tiny_cfg()
    model = build_model(cfg)
    state = restore_eval_state(cfg, model, (32, 32), batch=1)
    fwd_baked, _ = _build_forward(cfg, model, state, "ss")
    fwd_args, variables = _build_forward(cfg, model, state, "ss",
                                         weights_as_args=True)

    spec = jax.ShapeDtypeStruct((1, 32, 32, 3), np.float32)
    vspec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables)
    blob_baked = jax.export.export(jax.jit(fwd_baked))(spec).serialize()
    blob_args = jax.export.export(jax.jit(fwd_args))(vspec, spec).serialize()
    # hrnet18 at 32x32 has ~9.6M params (~38 MB fp32 of constants).
    assert len(blob_args) < len(blob_baked) / 10

    save_tree_npz(str(tmp_path / "w.weights.npz"), variables)
    loaded = load_tree_npz(str(tmp_path / "w.weights.npz"))
    reloaded = jax.export.deserialize(blob_args)
    x = np.random.default_rng(0).uniform(-2, 2, (1, 32, 32, 3)).astype(
        np.float32)
    served = np.asarray(reloaded.call(jax.device_put(loaded),
                                      jax.numpy.asarray(x)))
    live = np.asarray(jax.jit(fwd_baked)(jax.numpy.asarray(x)))
    # Baked and sidecar are DIFFERENT programs (constants folded into
    # fusions vs weights as runtime args), so this is cross-compilation
    # noise, not roundtrip noise: measured max 2e-3 abs on logits of
    # magnitude ~40 (rel ~5e-5).
    np.testing.assert_allclose(served, live, rtol=1e-4, atol=5e-3)


def test_http_serving_roundtrip(tmp_path, exported_pair):
    """tools/serve.py over an exported artifact: healthz + a segment
    request through a real HTTP socket."""
    import http.client
    import io
    import json
    import sys
    import threading

    cfg, fwd = exported_pair
    spec = jax.ShapeDtypeStruct((1, 32, 32, 3), np.float32)
    exported = jax.export.export(jax.jit(fwd))(spec)
    art = str(tmp_path / "art")
    with open(art + ".stablehlo", "wb") as f:
        f.write(exported.serialize())
    with open(art + ".json", "w") as f:
        json.dump({
            "input": {"shape": [1, 32, 32, 3]},
            "normalize": {"div_value": 255.0,
                          "mean": [0.485, 0.456, 0.406],
                          "std": [0.229, 0.224, 0.225]},
            "num_classes": 5,
        }, f)

    sys.path.insert(0, "tools")
    import serve as serve_mod

    runner = serve_mod.ArtifactRunner(art)
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                serve_mod.make_handler(runner))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok"

        img = np.random.default_rng(0).integers(
            0, 255, (32, 32, 3)).astype(np.uint8)
        buf = io.BytesIO()
        np.save(buf, img)
        conn.request("POST", "/segment", body=buf.getvalue())
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        labels = np.load(io.BytesIO(resp.read()), allow_pickle=False)
        assert labels.shape == (32, 32) and labels.dtype == np.int32
        assert labels.max() < 5

        # Matches the direct artifact call.
        direct = runner.segment(img)
        np.testing.assert_array_equal(labels, direct)

        # Malformed body -> 400, server stays alive.
        conn.request("POST", "/segment", body=b"not npy")
        assert conn.getresponse().status == 400
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["status"] == "ok"
    finally:
        httpd.shutdown()
