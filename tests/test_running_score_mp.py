"""RunningScoreMP ≡ RunningScore (async thread-pool accumulation)."""

import numpy as np

from contrastiveseg_tpu.metrics.running_score import RunningScore
from contrastiveseg_tpu.metrics.running_score_mp import RunningScoreMP


def test_mp_matches_serial():
    rng = np.random.default_rng(0)
    a = RunningScore(7)
    b = RunningScoreMP(7, num_workers=3)
    for _ in range(5):
        pred = rng.integers(0, 7, size=(2, 31, 45)).astype(np.int32)
        lab = rng.integers(-1, 7, size=(2, 31, 45)).astype(np.int32)
        a.update(pred, lab)
        b.update(pred, lab)
    assert np.isclose(a.get_mean_iou(), b.get_mean_iou())
    np.testing.assert_array_equal(a.confusion, b.confusion)
    assert np.isclose(a.get_pixel_acc(), b.get_pixel_acc())
    assert np.isclose(a.get_f1_score(), b.get_f1_score())
    scores_a, scores_b = a.get_scores(), b.get_scores()
    for k in ("miou", "pixel_acc", "mean_acc", "fwavacc"):
        assert np.isclose(scores_a[k], scores_b[k]), k
    b.close()


def test_partial_hist_gather_contract():
    rng = np.random.default_rng(1)
    pred = rng.integers(0, 5, size=(4, 16, 16)).astype(np.int32)
    lab = rng.integers(0, 5, size=(4, 16, 16)).astype(np.int32)
    ref = RunningScore(5)
    ref.update(pred, lab)
    mp = RunningScoreMP(5)
    h1 = mp.hist(list(pred[:2]), list(lab[:2]))
    h2 = mp.hist(list(pred[2:]), list(lab[2:]))
    mp.gather_hist([h1, h2])
    np.testing.assert_array_equal(ref.confusion, mp.confusion)
    mp.close()
