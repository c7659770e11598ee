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


class VideoHelper:
    """Video <-> frame utilities (lib/utils/helpers/video_helper.py).

    The reference wraps cv2.VideoCapture in a list-like reader with an
    accurate-seek workaround and an LRU frame cache, plus video2frames /
    frames2video converters; this keeps the same API surface on plain
    cv2 (lazy-imported — everything else in the framework is cv2-free).
    """

    class VideoReader:
        def __init__(self, path: str):
            import cv2

            self._cap = cv2.VideoCapture(path)
            if not self._cap.isOpened():
                raise IOError(f"cannot open video {path!r}")
            self.fps = self._cap.get(cv2.CAP_PROP_FPS)
            self.width = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            self.height = int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            self._n = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))
            self._pos = 0

        def __len__(self) -> int:
            return self._n

        def __getitem__(self, idx: int):
            import cv2

            if idx < 0:
                idx += self._n
            if not 0 <= idx < self._n:
                raise IndexError(idx)
            if idx != self._pos:
                # cv2 seek can land short (reference video_helper.py
                # "jumping to a certain frame may be inaccurate"):
                # set-then-check, stepping forward if needed.
                self._cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
                self._pos = int(self._cap.get(cv2.CAP_PROP_POS_FRAMES))
                while self._pos < idx:
                    self._cap.read()
                    self._pos += 1
            ok, frame = self._cap.read()
            if not ok:
                raise IOError(f"failed to decode frame {idx}")
            self._pos = idx + 1
            return frame[..., ::-1]  # BGR -> RGB

        def __iter__(self):
            for i in range(self._n):
                yield self[i]

        def close(self):
            self._cap.release()

    @staticmethod
    def video2frames(video_path: str, out_dir: str,
                     ext: str = ".png") -> int:
        reader = VideoHelper.VideoReader(video_path)
        FileHelper.make_dirs(out_dir)
        n = 0
        for i, frame in enumerate(reader):
            ImageHelper.save(os.path.join(out_dir, f"{i:06d}{ext}"), frame)
            n += 1
        reader.close()
        return n

    @staticmethod
    def frames2video(frame_dir: str, video_path: str, fps: float = 30.0,
                     fourcc: str = "mp4v") -> int:
        import cv2

        names = FileHelper.list_dir(frame_dir)
        if not names:
            raise ValueError(f"no frames in {frame_dir!r}")
        first = ImageHelper.read_image(os.path.join(frame_dir, names[0]))
        h, w = first.shape[:2]
        FileHelper.make_dirs(video_path, is_file=True)
        writer = cv2.VideoWriter(
            video_path, cv2.VideoWriter_fourcc(*fourcc), fps, (w, h)
        )
        for name in names:
            img = ImageHelper.read_image(os.path.join(frame_dir, name))
            writer.write(img[..., ::-1].copy())  # RGB -> BGR
        writer.release()
        return len(names)
