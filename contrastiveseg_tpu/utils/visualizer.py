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
