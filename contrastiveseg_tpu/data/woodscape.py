"""WoodScape fisheye -> rectified-pinhole preprocessing, vectorized numpy.

Re-implements the reference's vendored Valeo projection pipeline
(lib/datasets/preprocess/woodscape/{projection.py, calibrate_to_rect.py}):
each fisheye camera is described by a radial-polynomial lens
(rho = k1*theta + k2*theta^2 + k3*theta^3 + k4*theta^4) plus a rigid pose;
rectification builds a virtual pinhole camera (focal = k1, rotation
snapped to 90-degree multiples with a centered horizon —
calibrate_to_rect.py make_rect_cam) and remaps every rectified pixel back
through the fisheye model.

Only forward projections are needed (pinhole 2d->3d has a closed form and
the fisheye is applied 3d->2d), so unlike the reference's per-pixel
quartic `np.roots` loop nothing iterative is required — the whole map is
a handful of vectorized numpy expressions.  Images are resampled with
bilinear `scipy.ndimage.map_coordinates`, labels with nearest.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np


def _quat_to_matrix(q) -> np.ndarray:
    """xyzw quaternion -> rotation matrix (scipy convention, as the
    reference's SciRot.from_quat uses)."""
    x, y, z, w = np.asarray(q, float)
    n = x * x + y * y + z * z + w * w
    s = 0.0 if n == 0 else 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array([
        [1 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1 - (xx + yy)],
    ])


def _euler_zxz(mat: np.ndarray) -> np.ndarray:
    """Rotation matrix -> intrinsic zxz Euler angles (SciRot semantics)."""
    # scipy 'zxz': R = Rz(a) @ Rx(b) @ Rz(c)
    b = np.arccos(np.clip(mat[2, 2], -1.0, 1.0))
    if np.sin(b) > 1e-9:
        a = np.arctan2(mat[0, 2], -mat[1, 2])
        c = np.arctan2(mat[2, 0], mat[2, 1])
    else:  # gimbal: fold everything into a
        a = np.arctan2(mat[1, 0], mat[0, 0])
        c = 0.0
    return np.array([a, b, c])


def _matrix_zxz(angles) -> np.ndarray:
    a, b, c = angles

    def rz(t):
        return np.array([[np.cos(t), -np.sin(t), 0],
                         [np.sin(t), np.cos(t), 0], [0, 0, 1.0]])

    def rx(t):
        return np.array([[1.0, 0, 0], [0, np.cos(t), -np.sin(t)],
                         [0, np.sin(t), np.cos(t)]])

    return rz(a) @ rx(b) @ rz(c)


class WoodscapeCamera:
    """The reference Camera + RadialPolyCamProjection pair
    (projection.py:117-213) condensed to the fields the remap needs."""

    def __init__(self, coefficients, rotation, translation, size,
                 principle_point, aspect_ratio=1.0):
        self.coefficients = np.asarray(coefficients, float)
        self.rotation = np.asarray(rotation, float)
        self.translation = np.asarray(translation, float)
        self.size = np.asarray(size, int)  # (width, height)
        self.pp = (0.5 * self.size
                   + np.asarray(principle_point, float) - 0.5)
        self.aspect = np.array([1.0, float(aspect_ratio)])

    @classmethod
    def from_json(cls, path: str) -> "WoodscapeCamera":
        with open(path) as f:
            cfg = json.load(f)
        intr = cfg["intrinsic"]
        return cls(
            coefficients=[intr["k1"], intr["k2"], intr["k3"], intr["k4"]],
            rotation=_quat_to_matrix(cfg["extrinsic"]["quaternion"]),
            translation=cfg["extrinsic"]["translation"],
            size=(intr["width"], intr["height"]),
            principle_point=(intr["cx_offset"], intr["cy_offset"]),
            aspect_ratio=intr["aspect_ratio"],
        )

    def rect_rotation(self) -> np.ndarray:
        """make_rect_cam (calibrate_to_rect.py:20-37): snap the zxz Euler
        angles to 90-degree multiples and center the horizon."""
        rot = _euler_zxz(self.rotation)
        rot = np.round(rot / (np.pi / 2)) * (np.pi / 2)
        rot[1] = np.pi / 2
        return _matrix_zxz(rot)

    def fisheye_project(self, cam_points: np.ndarray) -> np.ndarray:
        """RadialPolyCamProjection.project_3d_to_2d (projection.py:122-133)
        + the screen transform: [..., 3] cam rays -> [..., 2] pixels."""
        x, y, z = cam_points[..., 0], cam_points[..., 1], cam_points[..., 2]
        chi = np.sqrt(x * x + y * y)
        theta = np.pi / 2.0 - np.arctan2(z, chi)
        rho = sum(c * theta ** (i + 1)
                  for i, c in enumerate(self.coefficients))
        scale = np.divide(rho, chi, out=np.zeros_like(chi),
                          where=chi != 0)
        lens = np.stack([x * scale, y * scale], axis=-1)
        return lens * self.aspect + self.pp


def rectification_maps(cam: WoodscapeCamera,
                       focal: Optional[float] = None):
    """(map_x, map_y) of fisheye source pixels for every rectified pixel
    (the reference's create_img_projection_maps with the make_rect_cam
    destination, projection.py:215-233)."""
    w, h = int(cam.size[0]), int(cam.size[1])
    f = float(focal if focal is not None else cam.coefficients[0])
    rect_rot = cam.rect_rotation()

    u, v = np.meshgrid(np.arange(w, dtype=float),
                       np.arange(h, dtype=float))
    # Pinhole 2d -> unit ray (PinholeLens.project_2d_to_3d with norm 1).
    lens = (np.stack([u, v], -1) - cam.pp) / cam.aspect
    xyn = np.stack([lens[..., 0] / f, lens[..., 1] / f,
                    np.ones_like(u)], -1)
    rays = xyn / np.linalg.norm(xyn, axis=-1, keepdims=True)
    # rect cam -> world -> fisheye cam (same translation cancels).
    world_dirs = rays @ rect_rot.T
    cam_dirs = world_dirs @ cam.rotation
    src = cam.fisheye_project(cam_dirs)
    return src[..., 0].astype(np.float32), src[..., 1].astype(np.float32)


def remap(image: np.ndarray, map_x: np.ndarray, map_y: np.ndarray,
          order: int = 1, fill=0) -> np.ndarray:
    """cv2.remap equivalent on numpy (bilinear order=1 / nearest order=0)."""
    from scipy import ndimage

    coords = np.stack([map_y, map_x])
    if image.ndim == 2:
        return ndimage.map_coordinates(image, coords, order=order,
                                       mode="constant", cval=fill)
    return np.stack([
        ndimage.map_coordinates(image[..., c], coords, order=order,
                                mode="constant", cval=fill)
        for c in range(image.shape[-1])
    ], axis=-1)
