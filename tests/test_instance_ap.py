"""Instance-level AP evaluator vs the reference cityscapes-scripts port.

Golden check: drive the ACTUAL reference assignGt2Preds/evaluateMatches/
computeAverages (lib/metrics/cityscapes/evaluation/
evalInstanceLevelSemanticLabeling.py) on a synthetic fixture with real
mask PNGs, and demand our array-based InstanceAPEvaluator reproduce
allAp / allAp50% / per-class AP to 1e-9.  The fixture exercises every
branch: clean matches, a duplicate match (lower confidence -> FP), a
plain false positive, a prediction mostly covering void (ignored), a
group region, a too-small gt instance, and a class with gt but no
predictions.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from contrastiveseg_tpu.metrics.instance_ap import (  # noqa: E402
    InstanceAPEvaluator,
    instances_from_semantic,
)

CAR, PERSON = 26, 24  # cityscapes raw ids with instances
VOID = 0


def _fixture():
    """One 64x64 image: road background, 2 cars, a small car, a car
    group, 1 person, and a void strip."""
    gt = np.full((64, 64), 7, np.int32)   # road (valid, no instances)
    gt[:, 50:54] = VOID                   # a void strip
    gt[2:20, 2:20] = CAR * 1000 + 0       # car A (324 px)
    gt[2:20, 30:48] = CAR * 1000 + 1      # car B
    gt[30:34, 2:6] = CAR * 1000 + 2       # small car (16 px < 100)
    gt[40:60, 40:50] = CAR                # car group region
    gt[40:60, 4:24] = PERSON * 1000 + 0   # person (400 px)

    def box(y0, y1, x0, x1):
        m = np.zeros((64, 64), bool)
        m[y0:y1, x0:x1] = True
        return m

    preds = [
        (box(2, 20, 2, 20), CAR, 0.9),     # perfect match on car A
        (box(2, 20, 2, 20), CAR, 0.6),     # duplicate on car A -> FP
        (box(3, 19, 31, 47), CAR, 0.8),    # good match on car B (IoU ~.79)
        (box(40, 60, 40, 50), CAR, 0.7),   # covers the GROUP -> ignored
        (box(30, 34, 2, 6), CAR, 0.5),     # covers the SMALL gt -> ignored
        (box(50, 60, 26, 36), CAR, 0.4),   # plain false positive (road)
        (box(24, 36, 50, 54), CAR, 0.45),  # mostly VOID -> ignored
        (box(0, 10, 56, 64), PERSON, 0.3),  # FP on person (road area)
    ]
    return gt, preds


def _reference_eval(gt, preds, tmp_path):
    """Drive the reference pipeline with real PNG masks."""
    import torch_ref

    torch_ref.setup_reference()
    # The reference module does bare `from instances2dict import ...`
    # (it expects to run as a script from its own directory), and uses
    # the numpy<1.24 alias np.float (evaluateMatches:395).  np.bool is a
    # REAL alias again in numpy>=2 — never clobber it (doing so broke
    # numpy.testing.assert_allclose for the whole test session once).
    sys.path.append(
        "/root/reference/lib/metrics/cityscapes/evaluation")
    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001
    if not hasattr(np, "bool"):
        np.bool = np.bool_
    from PIL import Image

    from lib.metrics.cityscapes.evaluation import (
        evalInstanceLevelSemanticLabeling as ref,
    )

    args = ref.CArgs()
    args.overlaps = np.arange(0.5, 1.0, 0.05)
    args.minRegionSizes = np.array([100])
    args.distanceThs = np.array([float("inf")])
    args.distanceConfs = np.array([-float("inf")])
    args.distanceAvailable = False
    args.instLabels = ["person", "car"]  # reference label order
    args.quiet = True

    # gt instance dicts (what getGtInstances/instances2dict produces).
    def regions(class_id, name):
        out = []
        for v in np.unique(gt):
            if v == class_id or v // 1000 == class_id:
                out.append({
                    "instID": int(v),
                    "labelID": class_id,
                    "pixelCount": int((gt == v).sum()),
                    "medDist": 0.0,
                    "distConf": 1.0,
                })
        return out

    gt_instances = {"person": regions(PERSON, "person"),
                    "car": regions(CAR, "car")}

    pred_info = {}
    for i, (mask, class_id, conf) in enumerate(preds):
        p = str(tmp_path / f"mask_{i}.png")
        Image.fromarray((mask * 255).astype(np.uint8)).save(p)
        pred_info[p] = {"labelID": class_id, "conf": conf}

    gt_img = Image.fromarray(gt)
    cur_gt, cur_pred = ref.assignGt2Preds(gt_instances, gt_img,
                                          pred_info, args)
    matches = {"img0": {"groundTruth": cur_gt, "prediction": cur_pred}}
    aps = ref.evaluateMatches(matches, args)
    avg = ref.computeAverages(aps, args)
    return avg


def test_instance_ap_matches_reference(tmp_path):
    pytest.importorskip("torch")
    gt, preds = _fixture()
    ref_avg = _reference_eval(gt, preds, tmp_path)

    ev = InstanceAPEvaluator(instance_class_ids=(PERSON, CAR))
    ev.add_image(gt, preds)
    ours = ev.evaluate()

    assert ours["all_ap"] == pytest.approx(ref_avg["allAp"], abs=1e-9)
    assert ours["all_ap_50"] == pytest.approx(ref_avg["allAp50%"], abs=1e-9)
    assert ours["classes"][CAR]["ap"] == pytest.approx(
        ref_avg["classes"]["car"]["ap"], abs=1e-9)
    assert ours["classes"][PERSON]["ap"] == pytest.approx(
        ref_avg["classes"]["person"]["ap"], abs=1e-9)
    # Sanity on the fixture's designed outcome: car is partially found,
    # person has gt but only a non-overlapping FP -> ap 0.
    assert 0.0 < ours["classes"][CAR]["ap50"] <= 1.0
    assert ours["classes"][PERSON]["ap"] == 0.0


def test_instance_ap_perfect_and_empty():
    gt, _ = _fixture()
    ev = InstanceAPEvaluator(instance_class_ids=(PERSON, CAR))
    preds = [((gt == CAR * 1000 + 0), CAR, 0.9),
             ((gt == CAR * 1000 + 1), CAR, 0.8),
             ((gt == PERSON * 1000 + 0), PERSON, 0.9)]
    ev.add_image(gt, preds)
    r = ev.evaluate()
    assert r["all_ap"] == pytest.approx(1.0)
    # A class with no gt anywhere is NaN-excluded, not zero-averaged.
    ev2 = InstanceAPEvaluator(instance_class_ids=(PERSON, CAR, 31))
    ev2.add_image(gt, preds)
    r2 = ev2.evaluate()
    assert r2["all_ap"] == pytest.approx(1.0)
    assert np.isnan(r2["raw"][2]).all()


def test_instances_from_semantic_components():
    seg = np.zeros((32, 32), np.int32)
    seg[2:10, 2:10] = CAR
    seg[20:30, 20:30] = CAR
    seg[2:10, 20:28] = PERSON
    probs = np.full((32, 32), 0.5)
    probs[2:10, 2:10] = 0.9
    inst = instances_from_semantic(seg, probs,
                                   instance_class_ids=(PERSON, CAR))
    assert len(inst) == 3
    cars = [i for i in inst if i[1] == CAR]
    assert len(cars) == 2
    confs = sorted(c for _, _, c in cars)
    assert confs == [pytest.approx(0.5), pytest.approx(0.9)]
