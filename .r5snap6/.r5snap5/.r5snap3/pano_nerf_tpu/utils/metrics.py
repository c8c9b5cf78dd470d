"""Image/geometry/HDR metrics, including solid-angle-weighted panorama (ws_)
variants.

JAX counterparts of /root/reference/utils/metrics.py. Unlike the reference
(where the metric library exists but validation never calls it,
SURVEY.md §5), the eval loop here wires ws-PSNR/SSIM into validation logging.

Convention: images are channels-last [H, W, C] (or [B, H, W, C] for SSIM),
float32 in [0, 1] for LDR metrics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pano_nerf_tpu.ops.shading import solid_angle_refinement

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# Basic metrics
# ---------------------------------------------------------------------------

def mse(x: Array, y: Array) -> Array:
    return jnp.mean((x - y) ** 2)


def rmse(x: Array, y: Array) -> Array:
    return jnp.sqrt(mse(x, y))


def l1(x: Array, y: Array) -> Array:
    return jnp.mean(jnp.abs(x - y))


def psnr(x: Array, y: Array) -> Array:
    return -10.0 * jnp.log10(mse(x, y))


def mean_angular_error(x: Array, y: Array) -> Array:
    """Mean angle between 3-vector fields, in degrees
    (reference utils/metrics.py:240-250)."""
    xf = x.reshape(-1, 3)
    yf = y.reshape(-1, 3)
    denom = jnp.linalg.norm(xf, axis=-1) * jnp.linalg.norm(yf, axis=-1)
    cos = jnp.sum(xf * yf, axis=-1) / jnp.maximum(denom, 1e-12)
    angle = jnp.arccos(jnp.clip(cos, -1.0, 1.0)) / jnp.pi * 180.0
    return jnp.mean(jnp.nan_to_num(angle))


def scale_invariant_mse(x: Array, y: Array) -> Array:
    """var(x - y) — scale-invariant MSE for albedo
    (reference utils/metrics.py:400-404)."""
    return jnp.var(x - y)


# ---------------------------------------------------------------------------
# SSIM (gaussian window, from scratch — reference utils/metrics.py:10-207)
# ---------------------------------------------------------------------------

def _gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    x = np.arange(ksize, dtype=np.float64) - ksize // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(img1: Array, img2: Array, window_size: int = 11,
         sigma: float = 1.5, max_val: float = 1.0) -> Array:
    """Mean SSIM over a [H, W, C] (or [B, H, W, C]) image pair.

    Same formulation as the reference's from-scratch SSIM: 11x11 gaussian
    window (sigma 1.5), C1=(0.01 max)^2, C2=(0.03 max)^2, zero padding.
    """
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    kernel = jnp.asarray(_gaussian_kernel(window_size, sigma))
    pad = (window_size - 1) // 2

    def filt(x):
        # Depthwise conv: [B, H, W, C] with a single 2-D kernel per channel.
        # precision=HIGHEST: on TPU the default conv runs in bf16 passes,
        # and SSIM's variance terms (E[x^2] - mu^2) are catastrophic
        # cancellations — bf16 moments push the score far above 1.
        c = x.shape[-1]
        k = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, precision=jax.lax.Precision.HIGHEST)

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return jnp.mean(ssim_map)


# ---------------------------------------------------------------------------
# Depth metrics (reference utils/metrics.py:290-313)
# ---------------------------------------------------------------------------

def depth_metrics(pred: Array, gt: Array, mask: Array) -> dict:
    m = mask > 0
    diff = jnp.where(m, pred - gt, 0.0)
    count = jnp.maximum(jnp.sum(m), 1)
    abs_rel = jnp.sum(jnp.where(m, jnp.abs(diff) / jnp.maximum(gt, 1e-8), 0.0)) / count
    sq_rel = jnp.sum(jnp.where(m, diff ** 2 / jnp.maximum(gt, 1e-8), 0.0)) / count
    rms = jnp.sqrt(jnp.sum(jnp.where(m, diff ** 2, 0.0)) / count)
    valid_log = m & (pred > 1e-7) & (gt > 1e-7)
    count_log = jnp.maximum(jnp.sum(valid_log), 1)
    log_rms = jnp.sqrt(jnp.sum(jnp.where(
        valid_log, (jnp.log(jnp.maximum(pred, 1e-7))
                    - jnp.log(jnp.maximum(gt, 1e-7))) ** 2, 0.0)) / count_log)
    ratio = jnp.maximum(pred / jnp.maximum(gt, 1e-8),
                        gt / jnp.maximum(pred, 1e-8))
    deltas = {f"delta{d}": jnp.sum(jnp.where(m, (ratio < 1.25 ** d), False)) / count
              for d in (1, 2, 3)}
    return dict(abs_rel=abs_rel, sq_rel=sq_rel, rms=rms, log_rms=log_rms,
                **deltas)


# ---------------------------------------------------------------------------
# Solid-angle-weighted panorama metrics (reference utils/metrics.py:318-396)
# ---------------------------------------------------------------------------

def _ws_weights(h: int, w: int) -> Array:
    weights = solid_angle_refinement(h=h, w=w).reshape(h, w, 1)
    return jnp.asarray(weights / weights.sum())


def ws_mse(pred: Array, gt: Array) -> Array:
    """pred/gt: [H, W, C]."""
    h, w = pred.shape[:2]
    return jnp.sum((pred - gt) ** 2 * _ws_weights(h, w))


def ws_psnr(pred: Array, gt: Array) -> Array:
    return -10.0 * jnp.log10(ws_mse(pred, gt))


def ws_rmse(pred: Array, gt: Array) -> Array:
    return jnp.sqrt(ws_mse(pred, gt))


def ws_l1(pred: Array, gt: Array) -> Array:
    h, w = pred.shape[:2]
    return jnp.sum(jnp.abs(pred - gt) * _ws_weights(h, w))


def ws_mae(pred: Array, gt: Array) -> Array:
    """Solid-angle-weighted mean angular error (degrees), [H, W, 3] inputs."""
    h, w = pred.shape[:2]
    weights = _ws_weights(h, w)[..., 0]
    denom = (jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(gt, axis=-1))
    cos = jnp.sum(pred * gt, axis=-1) / jnp.maximum(denom, 1e-12)
    angle = jnp.arccos(jnp.clip(cos, -1.0, 1.0)) / jnp.pi * 180.0
    return jnp.sum(jnp.nan_to_num(angle) * weights)


def ws_cos_similarity(pred: Array, gt: Array) -> Array:
    h, w = pred.shape[:2]
    weights = _ws_weights(h, w)[..., 0]
    denom = (jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(gt, axis=-1))
    cos = jnp.sum(pred * gt, axis=-1) / jnp.maximum(denom, 1e-12)
    return jnp.sum(cos * weights)


# ---------------------------------------------------------------------------
# Aggregate helpers + perceptual metric (reference utils/metrics.py:129-183,
# 260-287)
# ---------------------------------------------------------------------------

def eval_errors(pred: Array, gt: Array) -> dict:
    """PSNR + SSIM pair for [H, W, 3] (or batched) LDR images."""
    return {"psnr": psnr(pred, gt), "ssim": ssim(pred, gt)}


def calc_lpips(pred, gt, net: str = "vgg"):
    """LPIPS perceptual distance via the optional `lpips` torch package.

    Inputs in [0, 1], channels-last numpy. Returns a float, or None when the
    optional dependency is absent (it is not part of the baked environment).
    Reference: utils/metrics.py:260-268.
    """
    try:
        import lpips as lpips_lib  # optional
        import torch
    except ImportError:
        return None
    loss_fn = lpips_lib.LPIPS(net=net)
    to_t = lambda x: torch.from_numpy(
        np.asarray(x, np.float32)).permute(2, 0, 1)[None] * 2 - 1
    with torch.no_grad():
        return float(loss_fn(to_t(pred), to_t(gt)))


def summarize_metrics(records: list) -> dict:
    """Mean of each numeric key over a list of per-image metric dicts."""
    keys = {k for r in records for k, v in r.items()
            if isinstance(v, (int, float))}
    return {k: float(np.mean([r[k] for r in records if k in r]))
            for k in sorted(keys)}
