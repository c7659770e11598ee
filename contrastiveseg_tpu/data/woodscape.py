"""WoodScape fisheye -> rectified-pinhole preprocessing, vectorized numpy.

Re-implements the reference's vendored Valeo projection pipeline
(lib/datasets/preprocess/woodscape/{projection.py, calibrate_to_rect.py}):
each fisheye camera is described by a radial-polynomial lens
(rho = k1*theta + k2*theta^2 + k3*theta^3 + k4*theta^4) plus a rigid pose;
rectification builds a virtual pinhole camera (focal = k1, rotation
snapped to 90-degree multiples with a centered horizon —
calibrate_to_rect.py make_rect_cam) and remaps every rectified pixel back
through the fisheye model.

Rectification needs only forward projections (pinhole 2d->3d has a closed
form and the fisheye is applied 3d->2d), so nothing iterative is required.
The reverse direction (cylindrical_to_fisheye.py: render fisheye frames
from cylindrical ones) needs the fisheye 2d->3d inverse; the reference
solves the quartic per-pixel with `np.roots`, replaced here by one
monotonic lookup table + `np.interp` over the whole image.  Images are
resampled with bilinear `scipy.ndimage.map_coordinates`, labels with
nearest.
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

    def fisheye_unproject(self, pixels: np.ndarray) -> np.ndarray:
        """RadialPolyCamProjection.project_2d_to_3d (projection.py:133-147)
        with norm=1: [..., 2] pixels -> [..., 3] unit rays in cam coords.

        The reference inverts the radial polynomial per-pixel with
        ``np.roots`` (min positive real root, projection.py:148-157);
        here the monotonic prefix of ``rho(theta)`` over [0, pi] is
        tabulated once and inverted with ``np.interp`` — vectorized and
        equivalent (the smallest root always lies on that prefix)."""
        lens = (np.asarray(pixels, float) - self.pp) / self.aspect
        rho = np.linalg.norm(lens, axis=-1)
        thetas = np.linspace(0.0, np.pi, 16384)
        rhos = sum(c * thetas ** (i + 1)
                   for i, c in enumerate(self.coefficients))
        stop = int(np.argmax(rhos)) + 1  # keep the increasing prefix
        theta = np.interp(rho, rhos[:stop], thetas[:stop])
        chi = np.sin(theta)
        z = np.cos(theta)
        scale = np.divide(chi, rho, out=np.zeros_like(rho),
                          where=rho != 0)
        return np.concatenate([scale[..., None] * lens, z[..., None]], -1)

    def cylindrical_project(self, cam_points: np.ndarray,
                            focal: Optional[float] = None) -> np.ndarray:
        """CylindricalProjection.project_3d_to_2d (projection.py:86-100)
        + the screen transform; focal defaults to k1
        (cylindrical_to_fisheye.py make_cylindrical_cam)."""
        f = float(focal if focal is not None else self.coefficients[0])
        x, y, z = cam_points[..., 0], cam_points[..., 1], cam_points[..., 2]
        theta = np.arctan2(x, z)
        chi = np.sqrt(x * x + z * z)
        v = f * np.divide(y, chi, out=np.zeros_like(chi), where=chi != 0)
        lens = np.stack([f * theta, v], axis=-1)
        return lens * self.aspect + self.pp

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


def cylindrical_to_fisheye_maps(cam: WoodscapeCamera,
                                focal: Optional[float] = None):
    """(map_x, map_y) of *cylindrical* source pixels for every fisheye
    destination pixel — the reference's
    preprocess/woodscape/cylindrical_to_fisheye.py, i.e.
    create_img_projection_maps(make_cylindrical_cam(cam), cam).  The
    cylindrical camera shares the fisheye's size/principal point/aspect
    and uses the 90-degree-snapped, horizon-centered rotation (the same
    ``rect_rotation``); its focal length is k1."""
    w, h = int(cam.size[0]), int(cam.size[1])
    cyl_rot = cam.rect_rotation()

    u, v = np.meshgrid(np.arange(w, dtype=float),
                       np.arange(h, dtype=float))
    rays = cam.fisheye_unproject(np.stack([u, v], -1))
    # fisheye cam -> world -> cylindrical cam (shared translation cancels).
    world_dirs = rays @ cam.rotation.T
    cyl_dirs = world_dirs @ cyl_rot
    src = cam.cylindrical_project(cyl_dirs, focal)
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
