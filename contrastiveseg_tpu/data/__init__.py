from contrastiveseg_tpu.data.transforms import build_train_transforms, Normalizer
from contrastiveseg_tpu.data.collate import collate
from contrastiveseg_tpu.data.datasets import (
    DirectorySegDataset,
    SyntheticSegDataset,
    build_dataset,
)
from contrastiveseg_tpu.data.pipeline import DataPipeline, build_pipeline

__all__ = [
    "build_train_transforms",
    "Normalizer",
    "collate",
    "DirectorySegDataset",
    "SyntheticSegDataset",
    "build_dataset",
    "DataPipeline",
    "build_pipeline",
]
