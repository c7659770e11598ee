"""Edge-void label variants (reference configs R_101_D_8_EDGE_VOID.json /
R_101_D_8_NON_EDGE_VOID.json):

  * tools/prepare_cityscapes.generate_edge golden-matched against the
    reference's edge_generator.generate_edge (cv2 oracle);
  * generate_edge_void directory layout;
  * data.label_edge2void / label_non_edge2void redirect in build_dataset
    (default_loader.py:114-118).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), os.pardir, "tools")
)

from prepare_cityscapes import (  # noqa: E402
    generate_edge,
    generate_edge_void,
)


def _reference_generate_edge():
    """Import the reference generator's module (pure functions; cv2)."""
    pytest.importorskip("cv2")
    path = ("/root/reference/lib/datasets/preprocess/cityscapes/"
            "edge_generator.py")
    if not os.path.exists(path):
        pytest.skip("reference tree unavailable")
    spec = importlib.util.spec_from_file_location("ref_edge_gen", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.generate_edge


@pytest.mark.parametrize("edge_width", [1, 3, 10])
def test_generate_edge_matches_reference(edge_width):
    ref_fn = _reference_generate_edge()
    rng = np.random.default_rng(3)
    # Blocky label map with some 255 ignore regions.
    label = rng.integers(0, 4, (6, 9)).astype(np.uint8)
    label = np.kron(label, np.ones((7, 7), np.uint8))  # 42 x 63
    label[:5, :5] = 255
    label[-6:, -4:] = 255
    ours = generate_edge(label, edge_width)
    ref = ref_fn(label.copy(), edge_width)
    np.testing.assert_array_equal(ours, ref)


def _make_layout(tmp_path):
    for split in ("train", "val"):
        os.makedirs(tmp_path / split / "image")
        os.makedirs(tmp_path / split / "label")
        lab = np.zeros((24, 24), np.uint8)
        lab[:, 12:] = 1
        Image.fromarray(lab).save(tmp_path / split / "label" / "a.png")
        img = np.zeros((24, 24, 3), np.uint8)
        Image.fromarray(img).save(tmp_path / split / "image" / "a.png")
    return tmp_path


def test_generate_edge_void_layout(tmp_path):
    root = _make_layout(tmp_path)
    counts = generate_edge_void(str(root), edge_width=4)
    assert counts == {"train": 1, "val": 1}
    ev = np.asarray(
        Image.open(root / "train" / "label_edge_void" / "a.png"))
    nv = np.asarray(
        Image.open(root / "train" / "label_non_edge_void" / "a.png"))
    edge = np.asarray(Image.open(root / "train" / "edge" / "a.png"))
    # Edge-void: boundary band -> 255, elsewhere original labels.
    assert (ev[edge == 255] == 255).all()
    assert set(np.unique(ev[edge == 0])) == {0, 1}
    # Non-edge-void: the complement.
    assert (nv[edge == 0] == 255).all()
    assert set(np.unique(nv[edge == 255])) == {0, 1}
    # The two partitions tile the image.
    assert ((ev == 255) ^ (nv == 255)).all()


def test_config_redirects_label_dir(tmp_path):
    from contrastiveseg_tpu.data.datasets import build_dataset
    from contrastiveseg_tpu.utils.config import Config

    root = _make_layout(tmp_path)
    generate_edge_void(str(root), edge_width=4)

    def make(overrides):
        return Config.from_args(overrides=[
            "dataset=cityscapes",
            f"data.data_dir={root}",
            "data.num_classes=2",
        ] + overrides)

    ds = build_dataset(make(["data.label_edge2void=true"]), "train")
    assert "label_edge_void" in ds.items[0][1]
    ds = build_dataset(make(["data.label_non_edge2void=true"]), "val")
    assert "label_non_edge_void" in ds.items[0][1]
    # Unset -> plain label dir; variant dir missing -> graceful fallback.
    ds = build_dataset(make([]), "train")
    assert os.sep + "label" + os.sep in ds.items[0][1]
    import shutil

    shutil.rmtree(root / "train" / "label_edge_void")
    ds = build_dataset(make(["data.label_edge2void=true"]), "train")
    assert os.sep + "label" + os.sep in ds.items[0][1]
