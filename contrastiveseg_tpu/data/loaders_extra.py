"""Specialized dataset loaders: LIP (edges), SegFix DT-offsets, multi-dataset.

Re-implements:
  * LipLoader (lib/datasets/loader/lip_loader.py:26-193): label + edge map
    targets for CE2P human parsing; edges derived from the label map when
    no precomputed edge directory exists;
  * DTOffsetLoader (loader/offset_loader.py:28-506): distance-transform +
    boundary-normal-angle ground truth for SegFix.  The reference loads
    offline-precomputed .mat files; here the distance transform and angles
    are computed on the fly (scipy EDT + large-support Sobel), removing the
    preprocessing step;
  * MultiDatasetLoader + balanced sampler (loader/multi_dataset_loader.py).
"""

from __future__ import annotations

import os

import numpy as np

from contrastiveseg_tpu.data.datasets import DirectorySegDataset
from contrastiveseg_tpu.utils.offset_helper import (
    DTOffsetConfig,
    angle_to_direction_label,
    distance_to_mask_label,
    sobel_kernel,
)


def label_to_edge(label: np.ndarray, ignore_index: int = -1) -> np.ndarray:
    """Binary semantic-boundary map from a label map (LIP edge target)."""
    edge = np.zeros_like(label, dtype=np.int32)
    d = label[1:, :] != label[:-1, :]
    edge[1:, :][d] = 1
    edge[:-1, :][d] = 1
    d = label[:, 1:] != label[:, :-1]
    edge[:, 1:][d] = 1
    edge[:, :-1][d] = 1
    edge[label == ignore_index] = 0
    return edge


class LipDataset(DirectorySegDataset):
    """Adds an `edge` target (maskmap) for the CE2P edge branch."""

    def __getitem__(self, idx: int) -> dict:
        sample = super().__getitem__(idx)
        if "label" in sample:
            sample["maskmap"] = label_to_edge(sample["label"])
        return sample


def compute_dt_targets(
    label: np.ndarray, cfg: DTOffsetConfig = DTOffsetConfig(),
    boundary_map: np.ndarray | None = None,
) -> dict:
    """Distance transform + boundary-normal direction labels from a label map.

    Replaces the reference's offline preprocessing
    (lib/datasets/preprocess/cityscapes/dt_offset_generator.py): per-class
    EDT to the nearest other-class pixel, Sobel of the distance field for
    the boundary-normal angle.

    ``boundary_map`` optionally supplies a different map for the boundary
    geometry (EDT + angle) than the ``label`` used for ignore handling —
    the reference's *instance* variant
    (preprocess/cityscapes/instance_dt_offset_generator.py) computes
    offsets from the instance-id map, so touching instances of the same
    class also get a supervised boundary between them.
    """
    from scipy import ndimage

    if boundary_map is None:
        boundary_map = label
    # Distance to the nearest boundary: EDT of "same-label region".
    edge = label_to_edge(boundary_map).astype(bool)
    distance = ndimage.distance_transform_edt(~edge).astype(np.float32)

    # Boundary-normal angle from the smoothed distance field.
    kx, ky = sobel_kernel(11)
    gx = ndimage.convolve(distance, kx, mode="nearest")
    gy = ndimage.convolve(distance, ky, mode="nearest")
    angle = np.degrees(np.arctan2(gy, gx)).astype(np.float32)

    mask_label = distance_to_mask_label(distance, label, cfg)
    dir_label = angle_to_direction_label(
        angle, seg_label_map=label, distance_map=distance, cfg=cfg
    )
    # Direction supervised only near boundaries; elsewhere ignore.
    dir_label = np.where(mask_label == 1, dir_label, -1)
    return {
        "distance_map": distance,
        "angle_map": angle,
        "mask_label": mask_label.astype(np.int32),
        "dir_label": dir_label.astype(np.int32),
    }


class DTOffsetDataset(DirectorySegDataset):
    """SegFix ground truth: label + mask_label + dir_label.

    ``boundary_source="instance"`` reads `{root}/{split}/instance/{name}.png`
    (the instance-id maps laid out by tools/prepare_cityscapes.py
    --instance, mirroring preprocess/cityscapes/cityscapes_instance_generator.py)
    and derives the boundary geometry from it — the reference's actual
    SegFix training setup (instance_dt_offset_generator.py), where touching
    same-class instances are separated by a supervised boundary.  Ignore
    regions still come from the semantic label.  Falls back to the semantic
    map per-image when no instance file exists.
    """

    def __init__(self, *args, dt_config: DTOffsetConfig = DTOffsetConfig(),
                 boundary_source: str = "label", **kwargs):
        super().__init__(*args, **kwargs)
        self.dt_config = dt_config
        if boundary_source not in ("label", "instance"):
            raise ValueError(f"boundary_source {boundary_source!r}")
        self.boundary_source = boundary_source

    def _instance_map(self, sample: dict) -> np.ndarray | None:
        from PIL import Image

        img_path = sample["meta"]["img_path"]
        name = sample["meta"]["name"]
        split_dir = os.path.dirname(os.path.dirname(img_path))
        for ext in (".png", ".bmp"):
            p = os.path.join(split_dir, "instance", name + ext)
            if os.path.exists(p):
                inst = np.asarray(Image.open(p)).astype(np.int64)
                return inst[..., 0] if inst.ndim == 3 else inst
        return None

    def __getitem__(self, idx: int) -> dict:
        sample = super().__getitem__(idx)
        if "label" in sample:
            boundary = None
            if self.boundary_source == "instance":
                boundary = self._instance_map(sample)
                if boundary is not None:
                    # Ignore pixels stay boundary-free (reference maps
                    # non-listed raw ids to 255 before the per-id EDT,
                    # instance_dt_offset_generator.py:80-84).
                    boundary = np.where(
                        sample["label"] < 0, -1, boundary
                    )
            sample.update(compute_dt_targets(
                sample["label"], self.dt_config, boundary_map=boundary
            ))
        return sample


class MultiDataset:
    """Concatenation with balanced per-dataset draws
    (loader/multi_dataset_loader.py:25-154): epoch indices interleave the
    datasets proportionally to `weights` (default: equal draws)."""

    def __init__(self, datasets, weights=None):
        self.datasets = list(datasets)
        self.weights = weights or [1.0] * len(self.datasets)
        self.sizes = [len(d) for d in self.datasets]
        self.offsets = np.cumsum([0] + self.sizes[:-1])

    def __len__(self) -> int:
        return sum(self.sizes)

    def __getitem__(self, idx: int) -> dict:
        for d, off, n in zip(self.datasets, self.offsets, self.sizes):
            if idx < off + n:
                s = d[idx - off]
                s.setdefault("meta", {})["dataset_index"] = int(
                    np.searchsorted(self.offsets, off)
                )
                return s
        raise IndexError(idx)

    def balanced_indices(self, epoch: int, seed: int = 0) -> np.ndarray:
        """MultiDatasetTrainingSampler semantics (multi_dataset_loader.py:
        124-154): an epoch of ``m * max(sizes)`` indices where position i
        always serves dataset ``i % m`` (round-robin interleave), each
        dataset cycling its own shuffled permutation (short datasets
        repeat).  Guarantees every batch of size k*m is dataset-balanced."""
        rng = np.random.default_rng(seed + epoch)
        m = len(self.datasets)
        target = max(self.sizes)
        cols = []
        for off, n in zip(self.offsets, self.sizes):
            reps = -(-target // n)
            perm = np.concatenate(
                [rng.permutation(n) for _ in range(reps)])[:target]
            cols.append(perm + off)
        # [target, m] row-major flatten = round-robin over datasets.
        return np.stack(cols, axis=1).reshape(-1)
