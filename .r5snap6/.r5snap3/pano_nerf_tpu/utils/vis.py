"""Visualization + validation-product saving (PNG via PIL, EXR via io_exr).

Counterpart of the parts of /root/reference/utils/vis.py the pipeline uses:
`hotmap` depth colorization and `save_results` (vis.py:13-41).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Union

import numpy as np
from PIL import Image

from pano_nerf_tpu.data.io_exr import write_exr


def _jet(x: np.ndarray) -> np.ndarray:
    """Matplotlib-'jet'-style colormap, [H, W] in [0,1] -> [H, W, 3]."""
    x = np.clip(x, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return np.stack([r, g, b], axis=-1)


def hotmap(depth: np.ndarray) -> np.ndarray:
    """Colorize a normalized depth map. Accepts [H, W], [H, W, 1]; returns
    [H, W, 3] float in [0, 1]."""
    depth = np.asarray(depth)
    if depth.ndim == 3:
        depth = depth[..., 0]
    return _jet(depth).astype(np.float32)


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(np.uint8)


def save_results(image: np.ndarray, save_path: Union[str, Path]) -> None:
    """Save [H, W, C] float image: .exr for HDR, .png for LDR.

    Mirrors the reference dispatch (vis.py:25-41) without the torch CHW
    permutes — everything here is channels-last numpy.
    """
    save_path = Path(save_path)
    os.makedirs(save_path.parent, exist_ok=True)
    image = np.asarray(image)
    if image.ndim == 4:  # drop batch dim
        image = image[0]
    if save_path.suffix == ".exr":
        write_exr(str(save_path), image.astype(np.float32), pixel_type="half")
    else:
        if image.shape[-1] == 1:
            image = np.repeat(image, 3, axis=-1)
        Image.fromarray(to_uint8(image)).save(save_path)


# ---------------------------------------------------------------------------
# Depth visualization + render-path pose generation + frame stackers
# (reference utils/vis.py:119-301; channels-last numpy instead of CHW torch)
# ---------------------------------------------------------------------------

def visualize_depth(depth: np.ndarray) -> np.ndarray:
    """Min-max-normalize a depth map and colorize it; [H, W(, 1)] -> [H, W, 3].

    Reference: utils/vis.py:119-133 (cv2 JET colormap there; our _jet here).
    """
    x = np.asarray(depth, dtype=np.float32)
    if x.ndim > 2:
        x = np.squeeze(x)
    x = np.nan_to_num(x)
    mi, ma = float(x.min()), float(x.max())
    x = (x - mi) / max(ma - mi, 1e-8)
    return _jet(x).astype(np.float32)


def _euler_xyz_to_matrix(angles_deg: np.ndarray) -> np.ndarray:
    """Intrinsic xyz Euler angles (degrees) -> rotation matrix."""
    ax, ay, az = np.radians(angles_deg)
    cx, sx = np.cos(ax), np.sin(ax)
    cy, sy = np.cos(ay), np.sin(ay)
    cz, sz = np.cos(az), np.sin(az)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def _matrix_to_euler_xyz(m: np.ndarray) -> np.ndarray:
    """Rotation matrix -> intrinsic xyz Euler angles (degrees)."""
    sy = np.sqrt(m[0, 0] ** 2 + m[1, 0] ** 2)
    if sy > 1e-6:
        x = np.arctan2(m[2, 1], m[2, 2])
        y = np.arctan2(-m[2, 0], sy)
        z = np.arctan2(m[1, 0], m[0, 0])
    else:
        x = np.arctan2(-m[1, 2], m[1, 1])
        y = np.arctan2(-m[2, 0], sy)
        z = 0.0
    return np.degrees([x, y, z])


def gen_render_path(c2ws: np.ndarray, n_views: int = 30) -> np.ndarray:
    """Interpolate a closed camera path through the given poses.

    Euler-angle + position lerp between consecutive poses, wrapping back to
    the first. Reference: utils/vis.py:136-166.
    """
    N = len(c2ws)
    rotvec, positions = [], []
    rot_interp, pos_interp = [], []
    # At least one interpolant per segment: n_views < 3 would otherwise
    # produce an empty path (np.stack of nothing) — unchanged for >= 3.
    weight = np.linspace(1.0, 0.0, max(1, n_views // 3),
                         endpoint=False).reshape(-1, 1)
    for i in range(N):
        euler = _matrix_to_euler_xyz(c2ws[i, :3, :3]).reshape(1, 3)
        if i:
            mask = np.abs(euler - rotvec[0]) > 180
            euler[mask] += 360.0
        rotvec.append(euler)
        positions.append(c2ws[i, :3, 3:].reshape(1, 3))
        if i:
            rot_interp.append(weight * rotvec[i - 1] + (1 - weight) * rotvec[i])
            pos_interp.append(weight * positions[i - 1] + (1 - weight) * positions[i])
    rot_interp.append(weight * rotvec[-1] + (1 - weight) * rotvec[0])
    pos_interp.append(weight * positions[-1] + (1 - weight) * positions[0])

    out = []
    for angles, position in zip(np.concatenate(rot_interp),
                                np.concatenate(pos_interp)):
        c2w = np.eye(4)
        c2w[:3, :3] = _euler_xyz_to_matrix(angles)
        c2w[:3, 3] = position
        out.append(c2w)
    return np.stack(out)


def _normalize3(x):
    return x / np.linalg.norm(x)


def create_spiral_poses(radii, focus_depth: float, n_poses: int = 120
                        ) -> np.ndarray:
    """LLFF-style spiral render path, [n_poses, 3, 4].

    Reference: utils/vis.py:169-199.
    """
    poses = []
    for t in np.linspace(0, 4 * np.pi, n_poses + 1)[:-1]:
        center = np.array([np.cos(t), -np.sin(t), -np.sin(0.5 * t)]) * radii
        z = _normalize3(center - np.array([0, 0, -focus_depth]))
        y_ = np.array([0, 1, 0])
        x = _normalize3(np.cross(y_, z))
        y = np.cross(z, x)
        poses.append(np.stack([x, y, z, center], 1))
    return np.stack(poses, 0)


def create_spheric_poses(radius: float, n_poses: int = 120) -> np.ndarray:
    """Circular render path looking 36 degrees downward, [n_poses, 3, 4].

    Reference: utils/vis.py:202-242.
    """

    def spheric_pose(theta, phi, radius):
        trans_t = np.eye(4)
        trans_t[2, 3] = radius
        rot_phi = np.array([
            [1, 0, 0, 0],
            [0, np.cos(phi), -np.sin(phi), 0],
            [0, np.sin(phi), np.cos(phi), 0],
            [0, 0, 0, 1]])
        rot_theta = np.array([
            [np.cos(theta), 0, -np.sin(theta), 0],
            [0, 1, 0, 0],
            [np.sin(theta), 0, np.cos(theta), 0],
            [0, 0, 0, 1]])
        c2w = rot_theta @ rot_phi @ trans_t
        c2w = np.array([[-1, 0, 0, 0], [0, 0, 1, 0],
                        [0, 1, 0, 0], [0, 0, 0, 1]]) @ c2w
        return c2w[:3]

    return np.stack([spheric_pose(th, -np.pi / 5, radius)
                     for th in np.linspace(0, 2 * np.pi, n_poses + 1)[:-1]], 0)


def _to_rgb(img: np.ndarray) -> np.ndarray:
    if img.shape[-1] == 1:
        return np.repeat(img, 3, axis=-1)
    return img


def vstack_img(imgs) -> np.ndarray:
    """Stack [H, W, C] images vertically. Reference: utils/vis.py:245-260."""
    return np.concatenate([_to_rgb(np.asarray(i)) for i in imgs], axis=0)


def hstack_img(imgs) -> np.ndarray:
    """Stack [H, W, C] images horizontally with white separators.

    Reference: utils/vis.py:263-275.
    """
    out = []
    for i, img in enumerate(imgs):
        out.append(_to_rgb(np.asarray(img)))
        if i < len(imgs) - 1:
            out.append(np.ones((img.shape[0], 5, 3), np.float32))
    return np.concatenate(out, axis=1)


def stack_frame(imgs, hw=(2, 2)) -> np.ndarray:
    """Tile images into an h x w grid (zero-pad missing cells).

    Reference: utils/vis.py:278-301.
    """
    h, w = hw
    imgs = [_to_rgb(np.asarray(i)) for i in imgs]
    while len(imgs) < h * w:
        imgs.append(np.zeros_like(imgs[0]))
    rows = [np.concatenate(imgs[r * w:(r + 1) * w], axis=1) for r in range(h)]
    return np.concatenate(rows, axis=0)
