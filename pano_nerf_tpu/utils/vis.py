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
