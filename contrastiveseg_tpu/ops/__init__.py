from contrastiveseg_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_nearest,
    scale_target_nearest,
)
from contrastiveseg_tpu.ops.confusion import confusion_matrix

__all__ = [
    "resize_bilinear_align_corners",
    "resize_nearest",
    "scale_target_nearest",
    "confusion_matrix",
]
