"""Boundary F1 score with distance tolerance.

Re-implements F1RunningScore (/root/reference/lib/metrics/F1_running_score.py):
precision = boundary pixels of the prediction within `tolerance` of a GT
boundary pixel; recall symmetric; per-class F1 averaged.  The distance
test is a binary dilation (max-pool) of the boundary masks — O(HW) numpy.
"""

from __future__ import annotations

import numpy as np


def _boundary(mask: np.ndarray) -> np.ndarray:
    """4-neighborhood boundary of a binary mask."""
    b = np.zeros_like(mask, dtype=bool)
    b[1:, :] |= mask[1:, :] != mask[:-1, :]
    b[:-1, :] |= mask[1:, :] != mask[:-1, :]
    b[:, 1:] |= mask[:, 1:] != mask[:, :-1]
    b[:, :-1] |= mask[:, 1:] != mask[:, :-1]
    return b & mask


def _dilate(mask: np.ndarray, r: int) -> np.ndarray:
    out = mask.copy()
    for _ in range(r):
        grown = out.copy()
        grown[1:, :] |= out[:-1, :]
        grown[:-1, :] |= out[1:, :]
        grown[:, 1:] |= out[:, :-1]
        grown[:, :-1] |= out[:, 1:]
        out = grown
    return out


class F1RunningScore:
    def __init__(self, num_classes: int, boundary_threshold: int = 3):
        self.num_classes = num_classes
        self.tol = boundary_threshold
        self.tp_p = np.zeros(num_classes)  # predicted boundary hits
        self.n_p = np.zeros(num_classes)  # predicted boundary count
        self.tp_g = np.zeros(num_classes)  # gt boundary hits
        self.n_g = np.zeros(num_classes)  # gt boundary count

    def update(self, pred: np.ndarray, label: np.ndarray) -> None:
        if pred.ndim == 2:
            pred, label = pred[None], label[None]
        for p, g in zip(pred, label):
            for c in range(self.num_classes):
                pm, gm = p == c, g == c
                if not pm.any() and not gm.any():
                    continue
                pb, gb = _boundary(pm), _boundary(gm)
                gd, pd = _dilate(gb, self.tol), _dilate(pb, self.tol)
                self.tp_p[c] += np.sum(pb & gd)
                self.n_p[c] += np.sum(pb)
                self.tp_g[c] += np.sum(gb & pd)
                self.n_g[c] += np.sum(gb)

    def get_scores(self) -> dict:
        with np.errstate(divide="ignore", invalid="ignore"):
            precision = self.tp_p / self.n_p
            recall = self.tp_g / self.n_g
            f1 = 2 * precision * recall / (precision + recall)
        return {
            "f1": float(np.nanmean(f1)),
            "precision": float(np.nanmean(precision)),
            "recall": float(np.nanmean(recall)),
            "cls_f1": f1,
        }

    def reset(self) -> None:
        self.tp_p[:] = 0
        self.n_p[:] = 0
        self.tp_g[:] = 0
        self.n_g[:] = 0
