"""Golden test: our official Cityscapes evaluator vs the reference's port
(lib/metrics/cityscapes_evaluator.py) on a synthetic fixture — pixel IoU,
instance-weighted iIoU, and category scores must match exactly."""

import math
import os

import numpy as np
import pytest
from PIL import Image

from contrastiveseg_tpu.metrics.cityscapes_official import (
    CityscapesOfficialEvaluator,
    evaluate_dirs,
    find_pairs,
    train_ids_to_raw,
)

import torch_ref  # noqa: E402  (sys.path + shims for /root/reference)


def _make_fixture(tmp_path, n_images=2, hw=(64, 96)):
    """Synthetic gtFine-style fixture: labelIds + instanceIds + predictions."""
    rng = np.random.default_rng(0)
    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()
    names = [f"lindau_{i:06d}_000019" for i in range(n_images)]
    for i, name in enumerate(names):
        H, W = hw
        # Blocky ground truth over a mix of eval + ignored raw ids.
        ids = np.array([0, 1, 7, 8, 11, 17, 21, 23, 24, 26, 29, 33])
        gt = ids[rng.integers(0, len(ids), size=(H // 8, W // 8))]
        gt = np.kron(gt, np.ones((8, 8), int))
        # Instances: number person/car/bicycle/caravan regions.
        inst = gt.copy()
        for cls in (24, 26, 33, 29):
            mask = gt == cls
            if mask.any():
                # Two instances per class: split by column parity blocks.
                half = np.arange(W)[None, :] < W // 2
                inst[mask & half] = cls * 1000
                inst[mask & ~half] = cls * 1000 + 1
        # Prediction: ground truth with structured errors.
        pred = gt.copy()
        flip = rng.random((H, W)) < 0.25
        pred[flip] = ids[rng.integers(0, len(ids), size=int(flip.sum()))]
        Image.fromarray(gt.astype(np.uint8)).save(
            gt_dir / f"{name}_gtFine_labelIds.png")
        Image.fromarray(inst.astype(np.int32), mode="I").save(
            gt_dir / f"{name}_gtFine_instanceIds.png")
        Image.fromarray(pred.astype(np.uint8)).save(
            pred_dir / f"{name}_pred.png")
    return str(pred_dir), str(gt_dir), names


def _reference_results(pred_dir, gt_dir):
    import sys

    import PIL

    if not hasattr(PIL, "PILLOW_VERSION"):
        PIL.PILLOW_VERSION = PIL.__version__
    torch_ref.setup_reference()
    from lib.metrics.cityscapes_evaluator import CArgs, EvalPixel

    gts = sorted(
        os.path.join(gt_dir, f) for f in os.listdir(gt_dir)
        if f.endswith("labelIds.png"))
    preds = [
        g.replace(gt_dir, pred_dir)
        .replace("_gtFine_labelIds.png", "_pred.png")
        for g in gts
    ]
    args = CArgs(data_path=gt_dir, out_path=gt_dir, predict_path=pred_dir)
    args.quiet = True
    ev = EvalPixel(args, predictionImgList=preds, groundTruthImgList=gts)
    return ev.evaluateImgLists(preds, gts, args)


def _assert_scores_match(ours: dict, ref: dict, key: str):
    for name, ref_v in ref[key].items():
        our_v = ours[key][name]
        if math.isnan(ref_v):
            assert math.isnan(our_v), (key, name, our_v)
        else:
            assert abs(our_v - ref_v) < 1e-9, (key, name, our_v, ref_v)


def test_matches_reference_evaluator(tmp_path):
    pred_dir, gt_dir, _ = _make_fixture(tmp_path)
    ref = _reference_results(pred_dir, gt_dir)
    ours = evaluate_dirs(pred_dir, gt_dir)

    np.testing.assert_array_equal(
        ours["confMatrix"].astype(np.int64), np.asarray(ref["confMatrix"]))
    for key in ("classScores", "classInstScores", "categoryScores",
                "categoryInstScores"):
        _assert_scores_match(ours, ref, key)
    for key in ("averageScoreClasses", "averageScoreInstClasses",
                "averageScoreCategories", "averageScoreInstCategories"):
        assert abs(ours[key] - ref[key]) < 1e-9, (key, ours[key], ref[key])
    # Sanity: mIoU in a plausible band for 25% corruption.
    assert 0.2 < ours["averageScoreClasses"] < 0.95


def test_find_pairs_and_missing_pred(tmp_path):
    pred_dir, gt_dir, names = _make_fixture(tmp_path, n_images=1)
    pairs = find_pairs(pred_dir, gt_dir)
    assert len(pairs) == 1 and pairs[0][2] is not None
    os.remove(os.path.join(pred_dir, f"{names[0]}_pred.png"))
    with pytest.raises(FileNotFoundError):
        find_pairs(pred_dir, gt_dir)


def test_train_id_roundtrip():
    rng = np.random.default_rng(3)
    train = rng.integers(0, 19, size=(16, 16))
    raw = train_ids_to_raw(train)
    # Every raw id must map back to the same train id.
    from contrastiveseg_tpu.metrics.cityscapes_official import ID2LABEL

    back = np.vectorize(lambda r: ID2LABEL[r].train_id)(raw)
    np.testing.assert_array_equal(back, train)
