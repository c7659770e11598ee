"""Parallel (worker-pool) confusion-matrix accumulator.

Re-implements the reference's `running_score_mp.py` contract
(/root/reference/lib/metrics/running_score_mp.py:19-98): a RunningScore
split into per-chunk partial histograms (`hist`) plus a commutative merge
(`gather_hist`), so metric accumulation can ride a worker pool while the
main thread keeps feeding the accelerator.

TPU-native redesign: the reference hands `hist` to `multiprocessing.Pool`
workers in its validator; here the partial histograms are computed by the
native C kernel (ops/confusion.py → native/segdata.cpp) in a
*thread* pool — the C loop releases no GIL-bound Python work, and threads
avoid the fork+pickle overhead of shipping full-resolution label maps to
subprocesses.  Scores come from the same RunningScore math, so the two
classes stay numerically identical.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from contrastiveseg_tpu.metrics.running_score import RunningScore
from contrastiveseg_tpu.ops.confusion import confusion_matrix


class RunningScoreMP(RunningScore):
    """RunningScore with asynchronous, thread-pooled accumulation.

    `update` returns immediately after scheduling the histogram; any
    score getter (or `wait()`) drains the pending futures first.
    """

    def __init__(self, num_classes: int, ignore_index: int | None = None,
                 num_workers: int = 4):
        super().__init__(num_classes, ignore_index=ignore_index)
        self._pool = ThreadPoolExecutor(max_workers=num_workers)
        self._pending: list = []

    # -- reference API: partial hist + gather ---------------------------
    def hist(self, preds, labels) -> np.ndarray:
        """Partial confusion matrix for a list of (pred, label) maps
        (running_score_mp.py:53-57)."""
        cm = np.zeros((self.num_classes, self.num_classes), np.int64)
        for p, t in zip(preds, labels):
            cm += np.asarray(
                confusion_matrix(p[None], t[None], self.num_classes)
            ).astype(np.int64)
        return cm

    def gather_hist(self, hists) -> None:
        """Merge partial histograms (running_score_mp.py:59-61)."""
        for cm in hists:
            self.confusion += np.asarray(cm, dtype=np.int64)

    # -- async accumulation ---------------------------------------------
    def update(self, pred, label) -> None:
        pred = np.asarray(pred)
        label = np.asarray(label)
        self._pending.append(
            self._pool.submit(self.hist, list(pred), list(label))
        )

    def wait(self) -> None:
        pending, self._pending = self._pending, []
        self.gather_hist(f.result() for f in pending)

    def _iu(self) -> np.ndarray:
        self.wait()
        return super()._iu()

    def get_pixel_acc(self) -> float:
        self.wait()
        return super().get_pixel_acc()

    def get_mean_acc(self) -> float:
        self.wait()
        return super().get_mean_acc()

    def get_fwavacc(self) -> float:
        self.wait()
        return super().get_fwavacc()

    def get_f1_score(self) -> float:
        self.wait()
        return super().get_f1_score()

    def reset(self) -> None:
        self.wait()
        super().reset()

    def close(self) -> None:
        self.wait()
        self._pool.shutdown(wait=True)
