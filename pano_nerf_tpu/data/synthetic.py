"""Procedural panoramic scene generator (Replica-style data without Replica).

Renders an analytic Lambertian box room — emissive ceiling patch, per-face
procedurally varying albedo, exact depth and normals — into the on-disk
format the reference consumes (EXR quads + transforms_all.json,
/root/reference/datasets/pano_datasets.py:49-131). Radiance is a pure
function of the 3-D hit point, so multi-view supervision is consistent and a
radiance field can actually fit it: this powers end-to-end training tests and
the benchmark workload when the Replica `bathroom_0` scene is not on disk.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np

from pano_nerf_tpu.data.io_exr import write_exr
from pano_nerf_tpu.data.pano_dataset import bld_to_wd, equirect_camera_dirs

# Box half-extents (y is up) and the emissive ceiling patch. The emitter is
# deliberately large and moderately bright: a tiny very-bright source makes
# the K-direction irradiance estimator ill-conditioned (directions miss it),
# which destabilizes HDR recovery for this scene in the reference
# formulation and ours alike.
BOX = np.array([2.0, 1.5, 2.5], dtype=np.float64)
LIGHT_XZ = 1.3
LIGHT_RADIANCE = np.array([9.0, 8.4, 7.2])

_FACE_NORMALS = np.array([
    [-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1],
], dtype=np.float64)
_FACE_BASE_ALBEDO = np.array([
    [0.70, 0.25, 0.20], [0.20, 0.60, 0.65], [0.45, 0.40, 0.35],
    [0.75, 0.75, 0.70], [0.25, 0.30, 0.65], [0.60, 0.55, 0.20],
])


def _intersect_box(origins: np.ndarray, dirs: np.ndarray
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ray/box-interior intersection.

    Args:
      origins, dirs: [N, 3] (origins strictly inside the box, dirs unit).
    Returns:
      t [N], hit points [N, 3], face index [N].
    """
    n = origins.shape[0]
    t_best = np.full(n, np.inf)
    face = np.zeros(n, dtype=np.int64)
    for axis in range(3):
        for sign, f in ((-1.0, 2 * axis), (1.0, 2 * axis + 1)):
            denom = dirs[:, axis]
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (sign * BOX[axis] - origins[:, axis]) / denom
            valid = (t > 1e-6) & np.isfinite(t) & (t < t_best)
            if not valid.any():
                continue
            p = origins[valid] + t[valid, None] * dirs[valid]
            oth = [a for a in range(3) if a != axis]
            inside = ((np.abs(p[:, oth[0]]) <= BOX[oth[0]] + 1e-9)
                      & (np.abs(p[:, oth[1]]) <= BOX[oth[1]] + 1e-9))
            idx = np.where(valid)[0][inside]
            t_best[idx] = t[idx]
            face[idx] = f
    pts = origins + t_best[:, None] * dirs
    return t_best, pts, face


def _albedo_at(pts: np.ndarray, face: np.ndarray) -> np.ndarray:
    """Smoothly varying per-face albedo in the NeRFactor-ish [0.05, 0.8]."""
    base = _FACE_BASE_ALBEDO[face]
    wave = 0.5 + 0.5 * np.sin(2.1 * pts[:, 0]) * np.cos(1.7 * pts[:, 2]) \
        * np.sin(1.3 * pts[:, 1] + 0.7)
    alb = base * (0.6 + 0.4 * wave[:, None])
    return np.clip(alb, 0.05, 0.8)


def _is_light(pts: np.ndarray, face: np.ndarray) -> np.ndarray:
    return ((face == 3) & (np.abs(pts[:, 0]) < LIGHT_XZ)
            & (np.abs(pts[:, 2]) < LIGHT_XZ))


def _irradiance_at(pts: np.ndarray, normals: np.ndarray) -> np.ndarray:
    """Approximate irradiance from the ceiling patch + ambient bounce.

    Point-source approximation of the patch (center c, area A): E =
    L * A * cos(theta_r) * cos(theta_l) / d^2, plus a constant ambient term —
    smooth, positive, view-independent.
    """
    c = np.array([0.0, BOX[1], 0.0])
    area = (2 * LIGHT_XZ) ** 2
    v = c - pts
    d2 = np.sum(v * v, axis=-1) + 1e-6
    lv = v / np.sqrt(d2)[:, None]
    cos_r = np.clip(np.sum(normals * lv, axis=-1), 0.0, None)
    cos_l = np.clip(-lv[:, 1] * -1.0, 0.0, None)  # patch normal is -y (down)
    mean_L = LIGHT_RADIANCE.mean()
    direct = mean_L * area * cos_r * cos_l / d2
    ambient = 0.35 * mean_L * area / 20.0
    return (direct + ambient)[:, None] * (LIGHT_RADIANCE / mean_L)


def render_pano(origin: np.ndarray, height: int, width: int):
    """Render one panorama quad set from a camera at `origin` (world, y-up).

    Returns dict of float32 arrays: image [H,W,3] HDR, albedo [H,W,3],
    normal [H,W,3] in [0,1] encoding, depth [H,W,1].
    """
    dirs, _ = equirect_camera_dirs(height, width)
    dirs = dirs.reshape(-1, 3).astype(np.float64)
    origins = np.broadcast_to(origin, dirs.shape)
    t, pts, face = _intersect_box(origins, dirs)
    normals = _FACE_NORMALS[face] * -1.0  # inward-facing
    albedo = _albedo_at(pts, face)
    lit = _is_light(pts, face)

    irr = _irradiance_at(pts, normals)
    radiance = albedo / np.pi * irr
    radiance[lit] = LIGHT_RADIANCE

    out = {
        "image": radiance.reshape(height, width, 3),
        "albedo": albedo.reshape(height, width, 3),
        "normal": ((normals + 1) / 2).reshape(height, width, 3),
        "depth": t.reshape(height, width, 1),
    }
    return {k: v.astype(np.float32) for k, v in out.items()}


def generate_scene(out_dir: str, n_views: int = 6, height: int = 64,
                   width: int = 128, seed: int = 0, factor: int = 1) -> dict:
    """Write a synthetic scene in the reference's on-disk layout.

    `height`/`width` are the stored resolution; pass the matching
    `factor` to PanoDataset (files are stored at the requested size, so use
    factor=1 unless you want extra downsampling).
    """
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    meta = {m: [] for m in ("image", "albedo", "normal", "depth")}

    b2w = bld_to_wd()
    for i in range(n_views):
        origin = rng.uniform(-0.5, 0.5, 3) * np.array([1.0, 0.6, 1.0])
        quads = render_pano(origin, height, width)
        # The loader reconstructs origin as translate @ bld_to_wd()
        # (pano_datasets.py:96-97); store the pre-image of that map.
        translate = origin @ np.linalg.inv(b2w)
        mx = np.eye(4)
        mx[:3, -1] = translate
        for material, img in quads.items():
            sub = os.path.join(out_dir, material)
            os.makedirs(sub, exist_ok=True)
            rel = f"{material}/{i:03d}"
            write_exr(os.path.join(out_dir, rel + ".exr"), img,
                      pixel_type="float")
            meta[material].append({
                "file_path": rel,
                "transform_matrix": mx.tolist(),
            })

    with open(os.path.join(out_dir, "transforms_all.json"), "w") as fp:
        json.dump(meta, fp)
    return meta
