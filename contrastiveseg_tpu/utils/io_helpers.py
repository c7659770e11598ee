"""File/image/JSON IO helpers.

Compact equivalents of the reference helper facade
(lib/utils/helpers/{image_helper,file_helper,json_helper,mask_helper}.py):
PIL-backed image IO (the reference wraps cv2/PIL), path utilities, JSON.
"""

from __future__ import annotations

import json
import os
from typing import Any, Sequence

import numpy as np
from PIL import Image


class ImageHelper:
    @staticmethod
    def read_image(path: str, mode: str = "RGB") -> np.ndarray:
        return np.asarray(Image.open(path).convert(mode))

    @staticmethod
    def save(path: str, img: np.ndarray) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        Image.fromarray(img).save(path)

    @staticmethod
    def resize(img: np.ndarray, size_wh: tuple[int, int],
               interpolation: str = "cubic") -> np.ndarray:
        from contrastiveseg_tpu.data.transforms import (
            _nearest_resize,
            _pil_resize_img,
        )

        if interpolation == "nearest":
            return _nearest_resize(img, size_wh)
        return _pil_resize_img(img, size_wh)

    @staticmethod
    def to_bgr(img: np.ndarray) -> np.ndarray:
        return img[..., ::-1]


class FileHelper:
    @staticmethod
    def make_dirs(path: str, is_file: bool = False) -> None:
        d = os.path.dirname(path) if is_file else path
        if d:
            os.makedirs(d, exist_ok=True)

    @staticmethod
    def list_dir(root: str, exts: Sequence[str] = (".png", ".jpg")) -> list[str]:
        out = []
        for base, _, files in os.walk(root):
            for f in files:
                if f.lower().endswith(tuple(exts)):
                    out.append(os.path.relpath(os.path.join(base, f), root))
        return sorted(out)


class JsonHelper:
    @staticmethod
    def load_file(path: str) -> Any:
        with open(path) as f:
            return json.load(f)

    @staticmethod
    def save_file(obj: Any, path: str) -> None:
        FileHelper.make_dirs(path, is_file=True)
        with open(path, "w") as f:
            json.dump(obj, f, indent=2)


class MaskHelper:
    @staticmethod
    def label_to_onehot(label: np.ndarray, num_classes: int) -> np.ndarray:
        safe = np.clip(label, 0, num_classes - 1)
        onehot = np.eye(num_classes, dtype=np.float32)[safe]
        onehot[label < 0] = 0
        return onehot
