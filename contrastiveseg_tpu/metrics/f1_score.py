"""Boundary F1 score with distance tolerance — reference-exact.

Re-implements F1RunningScore (/root/reference/lib/metrics/F1_running_score.py,
itself adapted from GSCNN's f_boundary.py) with the same estimator:

  * boundary maps via the Martin seg2bmap rule (e/s/se neighbor XOR,
    half-pixel offset toward the origin — F1_running_score.py:201-259);
  * distance tolerance = Euclidean disk dilation of radius
    ``ceil(boundary_threshold * ||(H, W)||)`` (or the threshold itself when
    >= 1), here computed as an exact Euclidean distance transform
    (``edt <= r`` == dilation by skimage ``disk(r)``, since both are
    x^2 + y^2 <= r^2 on the integer grid — no cv2/skimage dependency);
  * per-image, per-class F measure (precision from the predicted boundary,
    recall from the GT boundary, empty/empty counts as F=1 —
    F1_running_score.py:179-196), accumulated as the reference's
    ``_Fpc/_Fc`` and averaged per class then over classes
    (F1_running_score.py:111-121).

Equivalence is pinned against the real reference implementation in
tests/test_f1_reference_parity.py.  The multiprocessing Pool is dropped
(an execution detail, not semantics).
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def _seg2bmap(seg: np.ndarray) -> np.ndarray:
    """1-px-wide boundary map, offset 1/2 px toward the origin
    (F1_running_score.py:201-246, same-size path)."""
    seg = seg.astype(bool)
    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]
    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = False
    return b


def _f_measure(
    pred: np.ndarray,
    gt: np.ndarray,
    ignore: np.ndarray,
    bound_th: float,
    pred_is_boundary: bool = False,
) -> float:
    """db_eval_boundary (F1_running_score.py:127-198) for one (image, class)."""
    bound_pix = (
        bound_th if bound_th >= 1
        else np.ceil(bound_th * np.linalg.norm(pred.shape))
    )
    pred = pred & ~ignore
    gt = gt & ~ignore
    fg_boundary = pred if pred_is_boundary else _seg2bmap(pred)
    gt_boundary = _seg2bmap(gt)

    n_fg = int(np.sum(fg_boundary))
    n_gt = int(np.sum(gt_boundary))
    if n_fg == 0 and n_gt > 0:
        precision, recall = 1.0, 0.0
    elif n_fg > 0 and n_gt == 0:
        precision, recall = 0.0, 1.0
    elif n_fg == 0 and n_gt == 0:
        precision, recall = 1.0, 1.0
    else:
        # Dilation by a Euclidean disk == thresholded distance transform.
        fg_dil = ndimage.distance_transform_edt(~fg_boundary) <= bound_pix
        gt_dil = ndimage.distance_transform_edt(~gt_boundary) <= bound_pix
        precision = float(np.sum(fg_boundary & gt_dil)) / n_fg
        recall = float(np.sum(gt_boundary & fg_dil)) / n_gt
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


class F1RunningScore:
    def __init__(self, num_classes: int,
                 boundary_threshold: float = 0.00088):
        self.num_classes = num_classes
        self.boundary_threshold = boundary_threshold
        self._Fpc = np.zeros(num_classes)
        self._Fc = np.zeros(num_classes)

    def update(self, seg_map, gt_map) -> None:
        """seg_map: [H,W] label map (or [C,H,W] prob maps, thresholded at
        0.5 per class as boundary maps — F1_running_score.py:85-90);
        gt_map: [H,W] int labels with -1 ignore.  Leading batch dims ok."""
        seg_map = np.asarray(seg_map)
        gt_map = np.asarray(gt_map)
        if seg_map.ndim == gt_map.ndim == 2:
            seg_map, gt_map = seg_map[None], gt_map[None]
        elif seg_map.ndim == 3 and gt_map.ndim == 2:  # one [C,H,W] prob map
            seg_map, gt_map = seg_map[None], gt_map[None]
        for seg, gt in zip(seg_map, gt_map):
            ignore = gt == -1
            prob_mode = seg.ndim == 3 and seg.shape[0] == self.num_classes
            for c in range(self.num_classes):
                if prob_mode:
                    f = _f_measure(seg[c] > 0.5, gt == c, ignore,
                                   self.boundary_threshold,
                                   pred_is_boundary=True)
                else:
                    f = _f_measure(seg == c, gt == c, ignore,
                                   self.boundary_threshold)
                self._Fpc[c] += f
                self._Fc[c] += 1

    def get_scores(self) -> dict:
        with np.errstate(divide="ignore", invalid="ignore"):
            cls_f1 = self._Fpc / self._Fc
        f1 = float(np.sum(cls_f1) / self.num_classes)
        return {"f1": f1, "cls_f1": cls_f1}

    def reset(self) -> None:
        self._Fpc[:] = 0
        self._Fc[:] = 0
