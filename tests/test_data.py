"""Data pipeline: transforms, collate, synthetic dataset, batching."""

import numpy as np

from contrastiveseg_tpu.data.collate import collate
from contrastiveseg_tpu.data.datasets import SyntheticSegDataset, encode_label_map
from contrastiveseg_tpu.data.pipeline import DataPipeline
from contrastiveseg_tpu.data.transforms import (
    Compose,
    Normalizer,
    RandomBrightness,
    RandomCrop,
    RandomHFlip,
    RandomResize,
)


def _sample(h=40, w=60, c=19, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8),
        "label": rng.integers(0, c, size=(h, w)).astype(np.int32),
        "meta": {"ori_size": [w, h]},
    }


def test_random_resize_scales_both_maps():
    s = _sample()
    rng = np.random.default_rng(1)
    out = RandomResize(scale_range=(2.0, 2.0), aspect_range=(1.0, 1.0),
                       ratio=1.0)(s, rng)
    assert out["image"].shape[:2] == (80, 120)
    assert out["label"].shape == (80, 120)
    # Nearest label resize preserves the label alphabet.
    assert set(np.unique(out["label"])) <= set(np.unique(s["label"]))


def test_random_crop_size_and_alignment():
    s = _sample(100, 200)
    rng = np.random.default_rng(2)
    out = RandomCrop(crop_size=(64, 32), ratio=1.0)(s, rng)
    assert out["image"].shape[:2] == (32, 64)
    assert out["label"].shape == (32, 64)
    # Crop must be a contiguous window: label/image stay aligned.
    # (verify by matching a distinctive label patch)


def test_hflip_flips_and_swaps():
    s = _sample()
    rng = np.random.default_rng(3)
    out = RandomHFlip(ratio=1.1, swap_pair=[(0, 1)])(s, rng)
    assert np.array_equal(out["image"], s["image"][:, ::-1])
    flipped = s["label"][:, ::-1]
    expect = flipped.copy()
    expect[flipped == 0] = 1
    expect[flipped == 1] = 0
    assert np.array_equal(out["label"], expect)


def test_brightness_bounds():
    s = _sample()
    rng = np.random.default_rng(4)
    out = RandomBrightness(shift_value=10, ratio=1.1)(s, rng)
    diff = out["image"].astype(int) - s["image"].astype(int)
    inner = (s["image"] > 20) & (s["image"] < 235)
    assert np.all(np.abs(diff[inner]) <= 10)
    assert len(np.unique(diff[inner])) == 1  # single global shift


def test_collate_pads_label_with_ignore():
    samples = [_sample(30, 50, seed=i) for i in range(2)]
    norm = Normalizer()
    for s in samples:
        s["image"] = norm(s["image"])
    batch = collate(samples, size_mode="fix_size", input_size=(64, 40),
                    align_method="only_pad", pad_mode="pad_right_down",
                    rng=np.random.default_rng(0))
    assert batch["image"].shape == (2, 40, 64, 3)
    assert batch["label"].shape == (2, 40, 64)
    assert np.all(batch["label"][:, :, 50:] == -1)
    assert np.all(batch["image"][:, :, 50:] == 0)
    assert batch["meta"][0]["input_size"] == [64, 40]


def test_collate_fit_stride():
    samples = [_sample(30, 50)]
    batch = collate(samples, size_mode="max_size", align_method="only_pad",
                    pad_mode="pad_right_down", fit_stride=8,
                    rng=np.random.default_rng(0))
    assert batch["image"].shape[1] % 8 == 0
    assert batch["image"].shape[2] % 8 == 0


def test_encode_label_map():
    lab = np.array([[7, 8, 0], [33, 5, 26]])
    out = encode_label_map(lab, [7, 8, 11, 33, 26])
    assert out.tolist() == [[0, 1, 255], [3, 255, 4]]


def test_synthetic_dataset_and_pipeline():
    ds = SyntheticSegDataset(num_classes=5, size_hw=(32, 48), length=6)
    s = ds[0]
    assert s["image"].shape == (32, 48, 3)
    assert s["label"].max() < 5
    # Deterministic per index.
    assert np.array_equal(ds[3]["label"], ds[3]["label"])

    pipe = DataPipeline(
        ds, batch_size=2,
        transforms=Compose([RandomHFlip(ratio=0.5)]),
        collate_kwargs={"size_mode": "fix_size", "input_size": (48, 32),
                        "align_method": "only_pad", "pad_mode": "random"},
    )
    batches = list(pipe.epoch_iter(0))
    assert len(batches) == 3
    b = batches[0]
    assert b["image"].shape == (2, 32, 48, 3)
    assert b["image"].dtype == np.float32
    assert b["label"].dtype == np.int32
