"""Panoramic EXR dataset: loading, equirectangular ray generation, batching.

Host-side (numpy) counterpart of /root/reference/datasets/pano_datasets.py.
TPU-native differences:

* No DataLoader worker pool (reference uses 28 torch workers,
  configs/panonerf.yaml:6). All rays for all training panoramas are generated
  once as flat numpy arrays; per-step batches are cheap fancy-index gathers
  that feed `jax.device_put` — the whole "pipeline" is one permutation and a
  take, which a single host thread saturates.
* An "epoch" is not a concept here; training is step-based. (The reference
  fakes epochs as 1000*batch_size samples, datasets/pano_datasets.py:277-281.)
* Rays are float32 end-to-end; env rays are not pre-cast to fp16 (the
  reference casts them, pano_datasets.py:263, because of torch AMP; on TPU
  the bf16 boundary lives inside the model).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from pano_nerf_tpu.core.rays import RAYS_KEYS, Rays
from pano_nerf_tpu.data.io_exr import read_exr


# ---------------------------------------------------------------------------
# Pose conventions (Blender -> world), reference pano_datasets.py:287-334
# ---------------------------------------------------------------------------

def _rot_x(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=np.float64)


def _rot_y(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float64)


def bld_to_wd(rm: Optional[np.ndarray] = None) -> np.ndarray:
    """Blender-to-world rotation fix (reference pano_datasets.py:287-295)."""
    b2w = _rot_x(np.pi / 2)
    if rm is None:
        return b2w
    w2b = _rot_x(-np.pi / 2)
    align_center = _rot_x(np.pi / 2)
    return b2w.T @ rm @ w2b.T @ align_center


def nor_to_nor(x: np.ndarray) -> np.ndarray:
    """Normal-map frame fix for pano scenes (reference pano_datasets.py:298)."""
    return x @ _rot_y(np.pi)


def scale_trans(c2w: np.ndarray, origin=None, scale=None):
    """Recenter camera translations on their mean (reference :302-313)."""
    trans = c2w[:, :3, -1].copy()
    if origin is None:
        origin = np.mean(trans, axis=0, keepdims=True)
    c2w[:, :3, -1] = trans - origin
    return c2w, origin, 1


def reform_c2w(c2w: np.ndarray, origin=None, scale=None, rot=None):
    c2w, origin, scale = scale_trans(c2w, origin, scale)
    return c2w, origin, scale, rot


# ---------------------------------------------------------------------------
# Equirectangular ray geometry
# ---------------------------------------------------------------------------

def equirect_camera_dirs(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-pixel unit directions + angular noise range for an equirect grid.

    Pixel (row phi, col theta) maps to
      theta = -(col+.5)/w * 2pi, phi = (row+.5)/h * pi,
      dir = (sin phi sin theta, cos phi, sin phi cos theta)
    — y is up, matching the reference (pano_datasets.py:157-173).
    """
    theta, phi = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32), indexing="xy")
    theta = -(theta + 0.5) / w * 2 * np.pi
    phi = (phi + 0.5) / h * np.pi
    y = np.cos(phi)
    x = np.sin(phi) * np.sin(theta)
    z = np.sin(phi) * np.cos(theta)
    dirs = np.stack([x, y, z], axis=-1)
    noise_range = (np.sin(phi) * np.pi / w).reshape(h, w, 1)
    return dirs, noise_range


def equirect_radii(directions: np.ndarray) -> np.ndarray:
    """Constant-per-column cone radii from mid-row neighbor spacing.

    The reference uses the equator row's horizontal pixel spacing for every
    row (pano_datasets.py:199-203), i.e. one radius per image.
    """
    h = directions.shape[0]
    mid = directions[h // 2]
    dx = np.sqrt(np.sum((mid[:-1] - mid[1:]) ** 2, -1))
    dx = np.concatenate([dx, dx[-2:-1]], 0)
    radii = np.tile(dx[None, :], (h, 1))[..., None] * 2 / np.sqrt(12)
    return radii.astype(np.float32)


def generate_lit_rays(num: int = 10, near: float = 0.0, far: float = 10.0,
                      radius: float = 0.01) -> Rays:
    """Fibonacci-sphere env directions with 4pi/num solid angles.

    Reference: pano_datasets.py:218-263 (`generate_lit_rays`).
    """
    i = np.arange(num, dtype=np.float64)
    golden = np.pi * (3.0 - np.sqrt(5.0))
    y = 1 - (i / (num - 1)) * 2
    r = np.sqrt(np.maximum(0.0, 1 - y * y))
    theta = golden * i
    dirs = np.stack([np.cos(theta) * r, y, np.sin(theta) * r], -1)

    ones = np.ones((num, 1), np.float32)
    dirs = dirs.astype(np.float32)
    viewdirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    return Rays(
        origins=np.zeros((num, 3), np.float32),
        directions=dirs,
        viewdirs=viewdirs.astype(np.float32),
        radii=np.full((num, 1), radius, np.float32),
        lossmult=ones * (4 * np.pi / num),
        near=ones * near,
        far=ones * far,
        noise_var=np.zeros((num, 1), np.float32),
    )


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------

def _resize_area(image: np.ndarray, factor: int) -> np.ndarray:
    """INTER_AREA-equivalent downsample by integer factor (box filter)."""
    h, w = image.shape[:2]
    nh, nw = h // factor, w // factor
    image = image[: nh * factor, : nw * factor]
    return image.reshape(nh, factor, nw, factor, -1).mean(axis=(1, 3))


class PanoDataset:
    """EXR panorama quads (image/albedo/normal/depth) + equirect rays.

    Parity target: /root/reference/datasets/pano_datasets.py:7-284. The
    constructor precomputes everything; `iter_batches` / indexing are pure
    numpy.
    """

    MATERIALS = ("image", "albedo", "normal", "depth")

    def __init__(self, data_dir: str, split: str = "train",
                 white_bkgd: bool = False, factor: int = 4,
                 num: Optional[Sequence[int]] = None,
                 range: Tuple[float, float] = (0, 10),
                 normalize_depth: bool = False, reform_cam: bool = False,
                 meta_file: str = "transforms_all"):
        self.data_dir = data_dir
        self.split = split
        self.white_bkgd = white_bkgd
        self.factor = factor
        self.num = num
        self.near, self.far = range
        self.normalize_depth = normalize_depth
        self.reform_cam = reform_cam
        self.meta_file = meta_file
        self.origin = None

        self._load_renderings()
        self._generate_rays()
        if split == "train":
            self._flatten_all()

    # ----- loading -------------------------------------------------------

    def _load_renderings(self) -> None:
        with open(os.path.join(self.data_dir, f"{self.meta_file}.json")) as fp:
            meta = json.load(fp)

        data_num = len(meta["image"])
        # NB: the ctor arg `range` shadows the builtin (kept for parity with
        # the reference signature, pano_datasets.py:19); use np.arange here.
        if self.num is None:
            self.data_list = np.arange(data_num).tolist()
        else:
            held = list(self.num)
            if self.split == "train":
                self.data_list = held
            else:
                self.data_list = [x for x in np.arange(data_num).tolist()
                                  if x not in held]

        store = {m: [] for m in self.MATERIALS}
        cams = []
        for material in self.MATERIALS:
            for i in self.data_list:
                frame = meta[material][i]
                fname = os.path.join(self.data_dir, frame["file_path"] + ".exr")
                image = read_exr(fname)
                if self.factor > 0:
                    image = _resize_area(image, self.factor)
                else:
                    raise ValueError(f"factor must be positive, got {self.factor}")

                if self.white_bkgd:
                    # Composite onto white using the last read channel
                    # (reference pano_datasets.py:82-83, applied to every
                    # material before the per-material handling). Quirk kept:
                    # the reference's reader only loads RGB
                    # (utils/io_exr.py:20-23), so `[..., -1:]` is the BLUE
                    # channel acting as alpha, not a true alpha plane.
                    image = (image[..., :3] * image[..., -1:]
                             + (1.0 - image[..., -1:]))

                if material == "image":
                    mx = np.array(frame["transform_matrix"], dtype=np.float32)
                    rm = mx[:3, :3]
                    if ("rot" in self.data_dir) or ("std" in self.data_dir):
                        mx[:3, :3] = bld_to_wd(rm)
                    else:
                        mx[:3, :3] = np.eye(3)
                    translate = mx[:3, -1].copy()
                    mx[:3, -1] = translate @ bld_to_wd()
                    cams.append(mx)

                    image = np.nan_to_num(image, nan=0)
                    image = np.clip(image[..., :3], 0, 1000)
                elif material == "depth":
                    if self.normalize_depth:
                        image = np.clip(image[..., :1], self.near, self.far)
                        image = (image - self.near) / (self.far - self.near)
                    else:
                        image = image[..., :1]
                elif material == "normal":
                    image = image * 2 - 1
                    if "pano" in self.data_dir:
                        image = nor_to_nor(image[..., :3])
                else:
                    image = image[..., :3]
                store[material].append(image.astype(np.float32))

        self.images = store["image"]
        self.albedos = store["albedo"]
        self.normals = store["normal"]
        self.depths = store["depth"]
        self.h, self.w = self.images[0].shape[:2]
        self.camtoworlds = cams
        self.n_examples = len(self.images)

    # ----- rays ----------------------------------------------------------

    def _generate_rays(self) -> None:
        if self.reform_cam:
            c2w, self.origin, _, _ = reform_c2w(np.array(self.camtoworlds))
            self.camtoworlds = list(c2w)

        camera_dirs, noise_range = equirect_camera_dirs(self.h, self.w)
        directions = [(camera_dirs @ c2w[:3, :3].T).astype(np.float32)
                      for c2w in self.camtoworlds]
        origins = [np.broadcast_to(c2w[:3, -1], v.shape).astype(np.float32).copy()
                   for v, c2w in zip(directions, self.camtoworlds)]
        viewdirs = [v / np.linalg.norm(v, axis=-1, keepdims=True)
                    for v in directions]
        radii = [equirect_radii(v) for v in directions]
        noise_var = [noise_range.astype(np.float32).copy()
                     for _ in self.camtoworlds]

        def scalar(x):
            return [np.full_like(origins[i][..., :1], x)
                    for i in np.arange(len(self.camtoworlds))]

        self.rays = Rays(origins=origins, directions=directions,
                         viewdirs=viewdirs, radii=radii,
                         lossmult=scalar(1.0), near=scalar(self.near),
                         far=scalar(self.far), noise_var=noise_var)
        self.radii = radii[0][0, 0, 0]

    def _flatten_all(self) -> None:
        def flat(xs: List[np.ndarray]) -> np.ndarray:
            return np.concatenate([x.reshape(-1, x.shape[-1]) for x in xs], 0)

        self.images = flat(self.images)
        self.depths = flat(self.depths)
        self.normals = flat(self.normals)
        self.albedos = flat(self.albedos)
        self.rays = Rays(*(flat(getattr(self.rays, k)) for k in RAYS_KEYS))
        self.num_rays = self.images.shape[0]

    # ----- access --------------------------------------------------------

    def generate_lit_rays(self, num: int = 10, near: float = 0.0,
                          far: float = 10.0) -> Rays:
        return generate_lit_rays(num, near, far, radius=float(self.radii))

    def obtain_w2c(self, index: int) -> np.ndarray:
        return np.array(self.camtoworlds[index])[:3, :3].T

    def __len__(self) -> int:
        if self.split == "train":
            return self.num_rays
        return self.n_examples

    def __getitem__(self, index: int):
        """val: one full panorama (rays + GT quads); train: one ray."""
        if self.split == "train":
            rays = Rays(*(getattr(self.rays, k)[index] for k in RAYS_KEYS))
            return (rays, self.images[index], self.depths[index],
                    self.normals[index], self.albedos[index])
        rays = Rays(*(getattr(self.rays, k)[index] for k in RAYS_KEYS))
        return (rays, self.images[index], self.depths[index],
                self.normals[index], self.albedos[index])

    def iter_batches(self, batch_size: int, seed: int = 0):
        """Infinite shuffled ray-batch iterator (train split).

        Epoch-style shuffling without replacement, like the reference's
        DataLoader(shuffle=True) over the flattened ray set.
        """
        assert self.split == "train"
        rng = np.random.default_rng(seed)
        n = self.num_rays
        while True:
            perm = rng.permutation(n)
            for s in np.arange(0, n - batch_size + 1, batch_size):
                idx = perm[s:s + batch_size]
                rays = Rays(*(getattr(self.rays, k)[idx] for k in RAYS_KEYS))
                yield (rays, self.images[idx], self.depths[idx],
                       self.normals[idx], self.albedos[idx])
