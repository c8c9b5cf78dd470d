"""Surface shading: BRDFs, irradiance integration, solid angles, tone mapping.

JAX counterparts of /root/reference/utils/surface_rendering.py. All BRDFs are
expressed with plain broadcasting over a [B, D, ...] (batch, light-direction)
layout — no reshape/bmm gymnastics — so XLA fuses them into the surrounding
compositing elementwise graph.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pano_nerf_tpu.ops.mip import safe_normalize

Array = jax.Array


def _dot(a: Array, b: Array) -> Array:
    return jnp.sum(a * b, axis=-1, keepdims=True)


def lambertian_brdf(albedo: Array, normal: Array, l: Array, cos_th: float = 0.0
                    ) -> Tuple[Array, Array]:
    """Lambertian BRDF + clamped N.L.

    Args:
      albedo: [B, 3]; normal: [B, 3]; l: [B, D, 3] light directions.
    Returns:
      diffuse_brdf [B, 3], NoL [B, D, 1].

    Reference: /root/reference/utils/surface_rendering.py:104-126.
    """
    diffuse_brdf = albedo / jnp.pi
    NoL = _dot(normal[..., None, :], l)
    NoL = jax.nn.relu(NoL - cos_th) + cos_th
    return diffuse_brdf, NoL


def microfacet_brdf(albedo: Array, normal: Array, roughness: Array, l: Array,
                    v: Array) -> Tuple[Array, Array, Array]:
    """UE4-style GGX microfacet BRDF (image-based-lighting k).

    Args:
      albedo [B, 3]; normal [B, 3]; roughness [B, 1]; l [B, D, 3]; v [B, 3].
    Returns:
      diffuse_brdf [B, D, 3], specular_brdf [B, D, 1], NoL [B, D, 1].

    Reference: /root/reference/utils/surface_rendering.py:6-61
    ("Real Shading in Unreal Engine 4", 2013).
    """
    D = l.shape[-2]
    diffuse_brdf = jnp.broadcast_to((albedo / jnp.pi)[..., None, :],
                                    albedo.shape[:-1] + (D, 3))

    n = normal[..., None, :]
    vv = v[..., None, :]
    r = roughness[..., None, :]
    h = l + vv
    h = safe_normalize(h)  # finite backward at l == -v

    NoH = jax.nn.relu(_dot(n, h))
    VoH = jax.nn.relu(_dot(vv, h))
    NoL = jax.nn.relu(_dot(n, l))
    NoV = jax.nn.relu(_dot(n, vv))

    F0 = 0.04
    alpha = r ** 2
    k = r ** 2 / 2.0  # IBL variant
    D_term = alpha ** 2 / (jnp.pi * ((NoH ** 2) * (alpha ** 2 - 1.0) + 1.0) ** 2)
    F_term = F0 + (1.0 - F0) * 2.0 ** (-(5.55473 * VoH + 6.98316) * VoH)
    G_term = (NoL / ((1.0 - k) * NoL + k)) * (NoV / ((1.0 - k) * NoV + k))

    denom = 4.0 * NoL * NoV
    specular = jnp.where(denom > 0, D_term * F_term * G_term / jnp.maximum(denom, 1e-12), 0.0)
    specular = jnp.nan_to_num(specular, nan=0.0, posinf=0.0)
    return diffuse_brdf, specular, NoL


def blinn_phong_brdf(albedo: Array, normal: Array, roughness: Array, l: Array,
                     v: Array) -> Tuple[Array, Array, Array]:
    """Blinn-Phong BRDF. Reference utils/surface_rendering.py:64-101."""
    D = l.shape[-2]
    diffuse_brdf = jnp.broadcast_to((albedo / jnp.pi)[..., None, :],
                                    albedo.shape[:-1] + (D, 3))
    n = normal[..., None, :]
    vv = v[..., None, :]
    h = l + vv
    h = safe_normalize(h)  # finite backward at l == -v
    NoH = jax.nn.relu(_dot(n, h))
    NoL = _dot(n, l)
    specular = jnp.nan_to_num(NoH ** roughness[..., None, :], nan=0.0, posinf=0.0)
    return diffuse_brdf, specular, NoL


def surface_rendering(env: Array, albedo: Array, normal: Array,
                      roughness: Optional[Array], l: Array, v: Array,
                      solid_angle: Array
                      ) -> Tuple[Array, Array, Array, Optional[Array]]:
    """Integrate incident radiance against the BRDF over env directions.

    diffuse = albedo/pi * sum_d env_d * max(N.L_d, 0) * dOmega_d

    Args:
      env: [B, D, 3] incident radiance per direction.
      albedo [B, 3]; normal [B, 3]; roughness [B, 1] or None (Lambertian);
      l: [B, D, 3] light dirs; v: [B, 3] view dirs;
      solid_angle: [1, D, 1] or [D, 1] per-direction solid angle.
    Returns:
      rgb [B, 3], diffuse [B, 3], specular [B, 3], shading [B, 3] or None.

    Reference: /root/reference/utils/surface_rendering.py:129-165.
    """
    if solid_angle.ndim == 2:
        solid_angle = solid_angle[None]
    if roughness is not None:
        diffuse_brdf, specular_brdf, NoL = microfacet_brdf(albedo, normal, roughness, l, v)
        diffuse = jnp.sum(diffuse_brdf * env * NoL * solid_angle, axis=-2)
        specular = jnp.sum(specular_brdf * env * solid_angle, axis=-2)
        shading = None
    else:
        diffuse_brdf, NoL = lambertian_brdf(albedo, normal, l)
        shading = jnp.sum(env * NoL * solid_angle, axis=-2)
        diffuse = diffuse_brdf * shading
        specular = jnp.zeros_like(diffuse)
    return diffuse + specular, diffuse, specular, shading


def solid_angle_refinement(h: int = 8, w: int = 16, hemisp: bool = False
                           ) -> np.ndarray:
    """Per-cell solid angles of an equirectangular grid: sin(phi) dtheta dphi.

    Returns [1, h*w, 1]; the grid sums to 4*pi (2*pi if hemisp).
    Reference: /root/reference/utils/surface_rendering.py:294-316.
    """
    phi_range = np.pi / 2 if hemisp else np.pi
    d_phi = phi_range / h
    d_theta = 2 * np.pi / w
    yy = (np.arange(h, dtype=np.float64) + 0.5) / h
    sin_phi = np.sin(yy * phi_range)
    solid_angle = np.tile(sin_phi[:, None], (1, w)) * d_theta * d_phi
    return solid_angle.reshape(1, -1, 1).astype(np.float32)


# ---------------------------------------------------------------------------
# Tone mapping
# ---------------------------------------------------------------------------

_ACES_A, _ACES_B, _ACES_C, _ACES_D, _ACES_E = 2.51, 0.03, 2.43, 0.59, 0.14


def hdr_to_ldr(color, gamma: float = 2.2, quantize: bool = False,
               clamp: bool = True):
    """ACES filmic tonemap + gamma encode; optional 8-bit quantization.

    `quantize=True` matches the reference's `dtype='uint8'` mode used on
    ground truth (floor to 255 levels, /root/reference/utils/
    surface_rendering.py:332-334); predictions stay continuous so gradients
    flow through ACES+gamma. Works on jnp and np arrays alike.

    Reference: /root/reference/utils/surface_rendering.py:319-344.
    """
    xp = jnp if isinstance(color, jax.Array) else np
    color = (color * (_ACES_A * color + _ACES_B)) / (
        color * (_ACES_C * color + _ACES_D) + _ACES_E)
    if clamp:
        color = xp.clip(color, 0.0, 1.0)
    if quantize:
        color = xp.floor(color * 255.0).astype(xp.uint8).astype(xp.float32) / 255.0
    # Guard pow-gradient at exactly zero (softplus radiance keeps us away from
    # it in practice; the epsilon is below fp32 resolution of the result).
    if not quantize and xp is jnp:
        color = xp.maximum(color, 1e-10)
    return color ** (1.0 / gamma)


def compute_illumination(x: Array) -> Array:
    """Rec.709 luma of an RGB array (channels-last).

    Reference: /root/reference/utils/surface_rendering.py:347-354.
    """
    op = jnp.asarray([0.2126, 0.7152, 0.0722], dtype=x.dtype)
    return jnp.sum(x * op, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Extended surface-rendering variants (reference utils/surface_rendering.py:
# 168-291 — kept for API parity; the main pipeline uses `surface_rendering`)
# ---------------------------------------------------------------------------

def surface_rendering_wlit(env: Array, env_weight: Array, albedo: Array,
                           normal: Array, roughness, l: Array, v,
                           solid_angle: Array):
    """Lambertian shading under K weighted environment maps.

    Args:
      env: [B, K, D, 3]; env_weight: [B, K]; albedo/normal: [B, 3];
      l: [B, D, 3]; solid_angle: [D, 1].
    Returns (rgb, diffuse, specular, shading).
    Reference: utils/surface_rendering.py:168-203.
    """
    assert roughness is None, "only the Lambertian variant is implemented"
    diffuse_brdf, NoL = lambertian_brdf(albedo, normal, l)
    NoL = NoL[:, None]                          # [B, 1, D, 1]
    sa = solid_angle.reshape(1, 1, -1, 1)
    shading = jnp.sum(env * NoL * sa, axis=2)   # [B, K, 3]
    shading = jnp.sum(shading * env_weight[..., None], axis=1)  # [B, 3]
    diffuse = diffuse_brdf * shading
    specular = jnp.zeros_like(diffuse)
    return diffuse, diffuse, specular, shading


def surface_rendering_hemi(env: Array, env_weight: Array, albedo: Array,
                           NoL: Array, solid_angle: Array):
    """Hemispherical lighting with fixed per-direction N.L.

    Args:
      env: [B, K, D, 3]; env_weight: [B, K]; albedo: [B, 3]; NoL: [D, 1];
      solid_angle: [D, 1].
    Reference: utils/surface_rendering.py:206-234.
    """
    diffuse_brdf = albedo / jnp.pi
    NoL = NoL.reshape(1, 1, -1, 1)
    sa = solid_angle.reshape(1, 1, -1, 1)
    shading = jnp.sum(env * NoL * sa, axis=2)
    shading = jnp.sum(shading * env_weight[..., None], axis=1)
    diffuse = diffuse_brdf * shading
    return diffuse, diffuse, None, shading


def wrap_sg_lit(sg_lit: Array, position: Array) -> Array:
    """Re-anchor spherical-gaussian point lights to per-pixel positions.

    Args:
      sg_lit: [N, 8] = color(3) | dir(3) | dist(1) | steradian(1).
      position: [B, 3] surface points.
    Returns [B, N, 8] with updated dir/dist/steradian.
    Reference: utils/surface_rendering.py:267-291.
    """
    lit_col = sg_lit[:, :3]
    lit_dir = sg_lit[:, 3:6]
    lit_dist = sg_lit[:, 6:7]
    lit_ster = sg_lit[:, 7:8]

    lit_pos = lit_dir * lit_dist
    new_vec = lit_pos[None] - position[:, None]          # [B, N, 3]
    new_dist = jnp.linalg.norm(new_vec, axis=-1, keepdims=True)
    new_dir = new_vec / jnp.maximum(new_dist, 1e-12)
    new_ster = lit_ster[None] * lit_dist[None] ** 2 / (new_dist ** 2 + 1e-8)

    B = position.shape[0]
    col = jnp.broadcast_to(lit_col[None], (B,) + lit_col.shape)
    return jnp.concatenate([col, new_dir, new_dist, new_ster], axis=-1)


def surface_rendering_point_lit(point_lit: Array, albedo: Array,
                                normal: Array, position: Array):
    """Lambertian shading from 3-D point lights (spherical gaussians).

    Reference: utils/surface_rendering.py:237-264.
    """
    lit = wrap_sg_lit(point_lit, position)
    c = lit[..., :3]
    l = lit[..., 3:6]
    s = lit[..., 7:8]
    diffuse_brdf, NoL = lambertian_brdf(albedo, normal, l)
    shading = jnp.sum(c * NoL * s, axis=1)
    diffuse = diffuse_brdf * shading
    specular = jnp.zeros_like(diffuse)
    return diffuse, diffuse, specular, shading
