"""Validation: full-panorama rendering, metric computation, product saving.

Counterpart of the reference `validation_step`/`render_image`
(/root/reference/systems/panonerf_system.py:77-192, mipnerf_system.py:55-131)
— with one deliberate fix: the reference never logs its checkpoint-monitor
metric `val_hdr/psnr_hdr_vol` (all self.log calls are commented out); here
the metric family (ws-PSNR/SSIM/MAE/depth) is computed and returned every
validation pass.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from pano_nerf_tpu.core.rays import Rays, rays_map
from pano_nerf_tpu.ops.shading import hdr_to_ldr
from pano_nerf_tpu.utils import metrics as M
from pano_nerf_tpu.utils.vis import hotmap, save_results


def _normalize(x: np.ndarray, axis=-1) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def render_full_pano(render_fn, params, rays: Rays, height: int, width: int
                     ) -> Dict[str, np.ndarray]:
    """Flatten a full pano's rays, render chunked, reshape to [H, W, C]."""
    flat = rays_map(lambda x: jnp.asarray(x.reshape(-1, x.shape[-1])), rays)
    out = render_fn(params, flat)
    return {k: np.asarray(v).reshape(height, width, -1)
            for k, v in out.items()}


def validation_metrics(products: Dict[str, np.ndarray],
                       gt_rgb: np.ndarray, gt_depth: np.ndarray,
                       gt_normal: np.ndarray,
                       gt_albedo: Optional[np.ndarray],
                       near: float, far: float) -> Dict[str, float]:
    """Solid-angle-weighted HDR/LDR/geometry metrics for one panorama."""
    pred_hdr = products["rgb_fine"]
    gt_hdr = gt_rgb[..., :3]
    pred_ldr = hdr_to_ldr(pred_hdr)
    gt_ldr = hdr_to_ldr(gt_hdr)

    out = {
        "psnr_hdr_vol": float(M.ws_psnr(jnp.asarray(pred_hdr), jnp.asarray(gt_hdr))),
        "psnr_ldr_vol": float(M.ws_psnr(jnp.asarray(pred_ldr), jnp.asarray(gt_ldr))),
        "ssim_ldr_vol": float(M.ssim(jnp.asarray(pred_ldr), jnp.asarray(gt_ldr))),
    }
    if "dep_fine" in products:
        pred_d = np.clip(products["dep_fine"], near, far)
        dm = M.depth_metrics(jnp.asarray(pred_d[..., 0]),
                             jnp.asarray(gt_depth[..., 0]),
                             jnp.asarray(np.ones_like(gt_depth[..., 0])))
        out.update({f"depth_{k}": float(v) for k, v in dm.items()})
    if "normal" in products and products.get("normal") is not None:
        out["normal_ws_mae"] = float(M.ws_mae(
            jnp.asarray(_normalize(products["normal"])),
            jnp.asarray(_normalize(gt_normal))))
    if "surf_rgb" in products:
        out["psnr_hdr_surf"] = float(M.ws_psnr(
            jnp.asarray(products["surf_rgb"]), jnp.asarray(gt_hdr)))
    if "albedo" in products and gt_albedo is not None:
        out["albedo_simse"] = float(M.scale_invariant_mse(
            jnp.asarray(products["albedo"]), jnp.asarray(gt_albedo)))
    return out


def save_validation_products(products: Dict[str, np.ndarray],
                             gt_rgb: np.ndarray, gt_depth: np.ndarray,
                             gt_normal: np.ndarray, save_dir: str,
                             index: int, near: float, far: float) -> None:
    """Write the reference's validation image tree (SURVEY.md §3.4):
    {gt,pred}_{hdr.exr, ldr.png, normal.png, depth.png} +
    pred_{hdr_surf.exr, ldr_surf.png, albedo.png} when present."""
    save_dir = Path(save_dir)
    gt_hdr = gt_rgb[..., :3]
    pred_hdr = products["rgb_fine"]

    def norm_img(x):
        return (_normalize(x) + 1) / 2

    def depth_img(x):
        return hotmap((np.clip(x, near, far) - near) / (far - near))

    save_results(gt_hdr, save_dir / "gt_hdr" / f"{index:03d}.exr")
    save_results(pred_hdr, save_dir / "pred_hdr" / f"{index:03d}.exr")
    save_results(np.asarray(hdr_to_ldr(gt_hdr)),
                 save_dir / "gt_ldr" / f"{index:03d}.png")
    save_results(np.asarray(hdr_to_ldr(pred_hdr, quantize=True)),
                 save_dir / "pred_ldr" / f"{index:03d}.png")
    save_results(norm_img(gt_normal), save_dir / "gt_normal" / f"{index:03d}.png")
    if products.get("normal") is not None:
        save_results(norm_img(products["normal"]),
                     save_dir / "pred_normal" / f"{index:03d}.png")
    save_results(depth_img(gt_depth), save_dir / "gt_depth" / f"{index:03d}.png")
    save_results(depth_img(products["dep_fine"]),
                 save_dir / "pred_depth" / f"{index:03d}.png")

    if products.get("surf_rgb") is not None:
        save_results(products["surf_rgb"],
                     save_dir / "pred_hdr_surf" / f"{index:03d}.exr")
        save_results(np.asarray(hdr_to_ldr(products["surf_rgb"], quantize=True)),
                     save_dir / "pred_ldr_surf" / f"{index:03d}.png")
    if products.get("albedo") is not None:
        save_results(products["albedo"],
                     save_dir / "pred_albedo" / f"{index:03d}.png")
    if products.get("emission") is not None:
        # Emissive-surface decomposition (nerf.emissive_head): the
        # composited self-emission, HDR — lets users inspect what the
        # decomposition attributes to sources vs reflection.
        save_results(products["emission"],
                     save_dir / "pred_emission" / f"{index:03d}.exr")
