"""ctypes bindings for the native data-path kernels (native/segdata.cpp).

Builds the shared library on first use (g++ is baked into the image;
pybind11 is not, hence the C ABI + ctypes).  Every entry point has a pure
numpy fallback, so the package works even where the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsegdata.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.resize_bicubic_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int,
        ]
        lib.resize_nearest_i32.argtypes = [
            i32p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_int,
        ]
        lib.resize_bicubic_window_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.normalize_pad_f32.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, f32p, f32p,
        ]
        lib.confusion_matrix_i64.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int, i64p,
        ]
        lib.normalize_f32.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int, f32p, ctypes.c_float,
            f32p, f32p,
        ]
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def resize_bicubic_u8(img: np.ndarray, size_wh: tuple[int, int]) -> Optional[np.ndarray]:
    """cv2.INTER_CUBIC-equivalent uint8 resize; None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    ch = img.shape[2] if img.ndim == 3 else 1
    dw, dh = size_wh
    out = np.empty((dh, dw, ch) if img.ndim == 3 else (dh, dw), np.uint8)
    lib.resize_bicubic_u8(
        _ptr(img, ctypes.c_uint8), h, w, ch,
        _ptr(out, ctypes.c_uint8), dh, dw,
    )
    return out


def resize_bicubic_window_u8(
    img: np.ndarray, virtual_wh: tuple[int, int],
    window_xywh: tuple[int, int, int, int],
) -> Optional[np.ndarray]:
    """The `window_xywh` = (x0, y0, w, h) crop of the virtual
    `virtual_wh` bicubic resize of ``img``, without materializing the rest
    — bit-identical to ``resize_bicubic_u8(img, virtual_wh)[y0:y0+h,
    x0:x0+w]``.  None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    ch = img.shape[2] if img.ndim == 3 else 1
    vdw, vdh = virtual_wh
    x0, y0, ow, oh = window_xywh
    out = np.empty((oh, ow, ch) if img.ndim == 3 else (oh, ow), np.uint8)
    lib.resize_bicubic_window_u8(
        _ptr(img, ctypes.c_uint8), h, w, ch,
        _ptr(out, ctypes.c_uint8), vdh, vdw, y0, x0, oh, ow,
    )
    return out


def resize_nearest_i32(x: np.ndarray, size_wh: tuple[int, int]) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.int32)
    h, w = x.shape
    dw, dh = size_wh
    out = np.empty((dh, dw), np.int32)
    lib.resize_nearest_i32(
        _ptr(x, ctypes.c_int32), h, w, _ptr(out, ctypes.c_int32), dh, dw
    )
    return out


def normalize_pad_f32(
    img: np.ndarray, canvas_hw: tuple[int, int], offset_yx: tuple[int, int],
    div_value: float, mean: np.ndarray, std: np.ndarray,
    out: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, ch = img.shape
    dh, dw = canvas_hw
    if out is None:
        out = np.empty((dh, dw, ch), np.float32)
    else:
        assert out.shape == (dh, dw, ch) and out.dtype == np.float32
        assert out.flags["C_CONTIGUOUS"]
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.normalize_pad_f32(
        _ptr(img, ctypes.c_uint8), h, w, ch,
        _ptr(out, ctypes.c_float), dh, dw, offset_yx[0], offset_yx[1],
        ctypes.c_float(div_value), _ptr(mean, ctypes.c_float),
        _ptr(std, ctypes.c_float),
    )
    return out


def normalize_f32(
    img: np.ndarray, div_value: float, mean: np.ndarray, std: np.ndarray
) -> Optional[np.ndarray]:
    """Bit-identical native ((img/div) - mean) / std for uint8 HWC input;
    None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    ch = img.shape[-1] if img.ndim == 3 else 1
    out = np.empty(img.shape, np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.normalize_f32(
        _ptr(img, ctypes.c_uint8), ctypes.c_int64(img.size // ch), ch,
        _ptr(out, ctypes.c_float), ctypes.c_float(div_value),
        _ptr(mean, ctypes.c_float), _ptr(std, ctypes.c_float),
    )
    return out


def confusion_matrix_i64(
    pred: np.ndarray, gt: np.ndarray, num_classes: int
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    pred = np.ascontiguousarray(pred.reshape(-1), np.int32)
    gt = np.ascontiguousarray(gt.reshape(-1), np.int32)
    out = np.zeros((num_classes, num_classes), np.int64)
    lib.confusion_matrix_i64(
        _ptr(pred, ctypes.c_int32), _ptr(gt, ctypes.c_int32),
        ctypes.c_int64(pred.size), num_classes, _ptr(out, ctypes.c_int64),
    )
    return out
