"""Visualization helpers (reference: lib/vis/seg_visualizer.py,
attention_visualizer.py, log_visualizer.py — PNG writers for predictions,
error maps, attention maps, and loss curves)."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from contrastiveseg_tpu.utils.palette import colorize, get_palette


def overlay_segmentation(
    image: np.ndarray, label: np.ndarray, palette: np.ndarray,
    alpha: float = 0.5,
) -> np.ndarray:
    """Blend a colorized label map over the RGB image."""
    color = colorize(label, palette)
    return np.clip(
        image.astype(np.float32) * (1 - alpha) + color.astype(np.float32) * alpha,
        0, 255,
    ).astype(np.uint8)


def error_map(pred: np.ndarray, label: np.ndarray,
              ignore_index: int = -1) -> np.ndarray:
    """Green = correct, red = wrong, black = ignored."""
    out = np.zeros((*pred.shape, 3), np.uint8)
    valid = label != ignore_index
    out[valid & (pred == label)] = [0, 160, 0]
    out[valid & (pred != label)] = [200, 0, 0]
    return out


def attention_map_to_image(attn: np.ndarray) -> np.ndarray:
    """[H, W] attention weights -> viridis-ish heat map."""
    a = attn - attn.min()
    a = a / max(a.max(), 1e-12)
    r = np.clip(a * 3 - 1.5, 0, 1)
    g = np.clip(a * 2, 0, 1) * (1 - r * 0.3)
    b = np.clip(1 - a * 1.5, 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def save_seg_visuals(
    out_dir: str, name: str, pred: np.ndarray,
    image: Optional[np.ndarray] = None, label: Optional[np.ndarray] = None,
    dataset: str = "cityscapes", num_classes: int = 19,
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    palette = get_palette(dataset, num_classes)
    Image.fromarray(colorize(pred, palette)).save(
        os.path.join(out_dir, f"{name}_pred.png")
    )
    if image is not None:
        Image.fromarray(
            overlay_segmentation(image, pred, palette)
        ).save(os.path.join(out_dir, f"{name}_overlay.png"))
    if label is not None:
        Image.fromarray(error_map(pred, label)).save(
            os.path.join(out_dir, f"{name}_error.png")
        )


def plot_loss_curve(log_file: str, out_png: str) -> int:
    """Parse `loss X.XXXX` lines from a training log into a simple PNG
    curve (reference log_visualizer)."""
    import re

    losses = []
    with open(log_file) as f:
        for line in f:
            m = re.search(r"loss (\d+\.\d+)", line)
            if m:
                losses.append(float(m.group(1)))
    if not losses:
        return 0
    h, w = 256, max(len(losses), 2)
    img = np.full((h, w, 3), 255, np.uint8)
    lo, hi = min(losses), max(losses)
    for i, v in enumerate(losses):
        y = int((1 - (v - lo) / max(hi - lo, 1e-9)) * (h - 1))
        img[y, min(i, w - 1)] = [200, 30, 30]
    Image.fromarray(img).resize((max(w, 512), h)).save(out_png)
    return len(losses)


def _to_heat(a: np.ndarray) -> np.ndarray:
    """Normalize one map to a 'Blues'-style heat image (uint8 RGB)."""
    a = a.astype(np.float64)
    a = a - a.min()
    a = a / max(a.max(), 1e-12)
    # white -> blue ramp (matplotlib Blues approximation).
    r = (1 - a) * 247 + a * 8
    g = (1 - a) * 251 + a * 48
    b = (1 - a) * 255 + a * 107
    return np.stack([r, g, b], -1).astype(np.uint8)


def save_attention_grid(
    out_png: str,
    attn: np.ndarray,  # [K, H, W] or [K, H*W] attention/region maps
    shape: Optional[tuple[int, int]] = None,
    image: Optional[np.ndarray] = None,
    label: Optional[np.ndarray] = None,
    dataset: str = "cityscapes",
    num_classes: int = 19,
    cols: int = 8,
    max_maps: int = 32,
    cell: int = 128,
) -> str:
    """Tiled attention-map figure (reference Vis_A2_Atten /
    visualize_map, lib/vis/attention_visualizer.py:98-199): optional
    image + colorized-label panels on the first row, then up to
    ``max_maps`` per-region heat maps in a ``cols``-wide grid.  Pure
    PIL/numpy — no matplotlib, no hard-coded output dirs, no pdb."""
    attn = np.asarray(attn)
    if attn.ndim == 2 and shape is not None:
        attn = attn.reshape(attn.shape[0], *shape)
    assert attn.ndim == 3, "attn must be [K, H, W] (or [K, HW] + shape)"
    k = min(attn.shape[0], max_maps)

    def fit(img):
        return np.asarray(
            Image.fromarray(img).resize((cell, cell), Image.BILINEAR))

    panels = []
    if image is not None:
        panels.append(fit(image.astype(np.uint8)))
    if label is not None:
        palette = get_palette(dataset, num_classes)
        panels.append(fit(colorize(label.astype(np.int32), palette)))
    maps = [fit(_to_heat(attn[i])) for i in range(k)]

    header_rows = 1 if panels else 0
    rows = header_rows + (k + cols - 1) // cols
    canvas = np.full((rows * cell, cols * cell, 3), 255, np.uint8)
    for i, p in enumerate(panels[:cols]):
        canvas[0:cell, i * cell:(i + 1) * cell] = p
    for i, m in enumerate(maps):
        r = header_rows + i // cols
        c = i % cols
        canvas[r * cell:(r + 1) * cell, c * cell:(c + 1) * cell] = m
    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    Image.fromarray(canvas).save(out_png)
    return out_png


def pixel_attention_map(
    sim: np.ndarray,  # [H*W, K] or [H, W, K] pixel->object similarities
    pixel_yx: tuple[int, int],
    shape: tuple[int, int],
    object_maps: Optional[np.ndarray] = None,  # [K, H, W] region supports
) -> np.ndarray:
    """Where does one pixel attend?  For OCR-style pixel->object attention
    the per-pixel weights are over K object regions; projected back
    through the region supports this yields a spatial map (the
    Vis_FastOC_Atten use case).  Returns a [H, W] float map."""
    h, w = shape
    sim = np.asarray(sim).reshape(h * w, -1)
    weights = sim[pixel_yx[0] * w + pixel_yx[1]]  # [K]
    if object_maps is None:
        k = weights.shape[0]
        side = int(np.ceil(np.sqrt(k)))
        grid = np.zeros(side * side, np.float64)
        grid[:k] = weights
        return grid.reshape(side, side)
    om = np.asarray(object_maps).reshape(weights.shape[0], h * w)
    return (weights[:, None] * om).sum(0).reshape(h, w)


def attention_histogram(attn: np.ndarray, bins: int = 50):
    """Weight-distribution histogram data (the reference's choice=1 path
    plots this; returning (counts, edges) keeps it dependency-free)."""
    return np.histogram(np.asarray(attn).ravel(), bins=bins)


def denormalize_image(
    arr: np.ndarray,
    div_value: float = 255.0,
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
) -> np.ndarray:
    """Undo the training normalization back to uint8 RGB
    (reference DeNormalize, lib/datasets/tools/transforms.py — used by
    lib/vis/tensor_visualizer.py vis_img)."""
    a = np.asarray(arr, np.float32)
    a = (a * np.asarray(std, np.float32) + np.asarray(mean, np.float32))
    return np.clip(a * div_value, 0, 255).astype(np.uint8)


def save_tensor_image(
    arr: np.ndarray, out_path: str,
    size: Optional[tuple[int, int]] = None,
    denormalize: bool = False,
    div_value: float = 255.0,
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
) -> str:
    """Dump one [H, W, C] (or [H, W]) activation/image array as a PNG,
    optionally resized to ``size`` (w, h) and de-normalized.

    Counterpart of lib/vis/tensor_visualizer.py (whose vis_tensor/vis_img
    pass cv2.imwrite's arguments swapped and so never ran upstream —
    re-specified here rather than reproduced)."""
    a = np.asarray(arr)
    if denormalize:
        a = denormalize_image(a, div_value, mean, std)
    elif a.dtype != np.uint8:
        lo, hi = float(a.min()), float(a.max())
        a = ((a - lo) / max(hi - lo, 1e-12) * 255).astype(np.uint8)
    img = Image.fromarray(a)
    if size is not None:
        img = img.resize(size, Image.BILINEAR)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    img.save(out_path)
    return out_path
