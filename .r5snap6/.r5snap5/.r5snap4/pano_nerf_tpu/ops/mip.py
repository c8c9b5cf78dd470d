"""mip-NeRF core math: conical frustum Gaussians, ray sampling, IPE, compositing.

Functional JAX counterparts of the reference ops in
/root/reference/models/mip.py (torch). Differences by design, not omission:

* Explicit PRNG keys replace global `torch.rand` (reference models/mip.py:145,
  186, 273). Eval paths (randomized=False) are bit-deterministic.
* Inverse-CDF resampling uses an O(N^2) broadcast-compare formulation rather
  than `searchsorted`+`gather` (reference models/mip.py:283-296): at N=64
  samples the comparison matrix is tiny, stays in registers/VMEM, and avoids
  gather ops that serialize badly on the VPU.
* Everything is static-shape and jit-stable; blurpool stop-gradient is
  `jax.lax.stop_gradient` (reference wraps in `torch.no_grad`,
  models/mip.py:322-336).

All ops compute in float32; callers downcast at the MLP boundary.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
_F32_EPS = float(jnp.finfo(jnp.float32).eps)


# ---------------------------------------------------------------------------
# Conical frustum -> Gaussian moments
# ---------------------------------------------------------------------------

def lift_gaussian(directions: Array, t_mean: Array, t_var: Array, r_var: Array,
                  diagonal: bool = True) -> Tuple[Array, Array]:
    """Lift a 1-D Gaussian along a ray into a 3-D (diagonal) Gaussian.

    Args:
      directions: [..., 3] ray directions (not necessarily unit norm).
      t_mean, t_var, r_var: [..., N] per-sample moments along/around the axis.
    Returns:
      mean [..., N, 3], cov_diag [..., N, 3].

    Reference: /root/reference/models/mip.py:8-33 (diagonal branch).
    """
    mean = directions[..., None, :] * t_mean[..., :, None]
    d_sq = directions ** 2
    d_norm_sq = jnp.sum(d_sq, axis=-1, keepdims=True) + 1e-10
    if diagonal:
        null_outer_diag = 1.0 - d_sq / d_norm_sq
        t_cov_diag = t_var[..., :, None] * d_sq[..., None, :]
        xy_cov_diag = r_var[..., :, None] * null_outer_diag[..., None, :]
        return mean, t_cov_diag + xy_cov_diag
    # Full covariance: [..., N, 3, 3]
    d_outer = directions[..., :, None] * directions[..., None, :]
    eye = jnp.eye(directions.shape[-1], dtype=directions.dtype)
    null_outer = eye - directions[..., :, None] * (directions / d_norm_sq)[..., None, :]
    t_cov = t_var[..., None, None] * d_outer[..., None, :, :]
    xy_cov = r_var[..., None, None] * null_outer[..., None, :, :]
    return mean, t_cov + xy_cov


def conical_frustum_to_gaussian(directions: Array, t0: Array, t1: Array,
                                base_radius: Array, diagonal: bool = True
                                ) -> Tuple[Array, Array]:
    """Stable Gaussian approximation of a conical frustum.

    Uses the numerically-stable moment formulas from the mip-NeRF paper
    (reference /root/reference/models/mip.py:36-64, `stable=True` branch).

    Args:
      directions: [..., 3] cone axes.
      t0, t1: [..., N] frustum start/end distances (fencepost pairs).
      base_radius: [..., 1] cone radius at unit distance.
    """
    mu = (t0 + t1) / 2.0
    hw = (t1 - t0) / 2.0
    denom = 3.0 * mu ** 2 + hw ** 2
    t_mean = mu + (2.0 * mu * hw ** 2) / denom
    t_var = (hw ** 2) / 3.0 - (4.0 / 15.0) * ((hw ** 4 * (12.0 * mu ** 2 - hw ** 2)) / denom ** 2)
    r_var = base_radius ** 2 * ((mu ** 2) / 4.0 + (5.0 / 12.0) * hw ** 2
                                - (4.0 / 15.0) * (hw ** 4) / denom)
    return lift_gaussian(directions, t_mean, t_var, r_var, diagonal)


def cast_rays(t_samples: Array, origins: Array, directions: Array, radii: Array,
              diagonal: bool = True) -> Tuple[Array, Array]:
    """Convert fencepost distances into per-frustum Gaussians.

    Args:
      t_samples: [..., N+1] fencepost distances.
      origins, directions: [..., 3]; radii: [..., 1].
    Returns:
      means [..., N, 3], covs [..., N, 3] (diagonal).

    Reference: /root/reference/models/mip.py:67-89 ('cone' shape only; the
    reference raises NotImplementedError for cylinders too).
    """
    t0 = t_samples[..., :-1]
    t1 = t_samples[..., 1:]
    means, covs = conical_frustum_to_gaussian(directions, t0, t1, radii, diagonal)
    means = means + origins[..., None, :]
    return means, covs


# ---------------------------------------------------------------------------
# Sampling along rays
# ---------------------------------------------------------------------------

def _stratify(key: jax.Array, t_edges: Array, randomized: bool) -> Array:
    """Jitter sorted fencepost distances within their local cells."""
    if not randomized:
        return t_edges
    mids = 0.5 * (t_edges[..., 1:] + t_edges[..., :-1])
    upper = jnp.concatenate([mids, t_edges[..., -1:]], axis=-1)
    lower = jnp.concatenate([t_edges[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, t_edges.shape, dtype=t_edges.dtype)
    return lower + (upper - lower) * t_rand


def sample_along_rays(key: jax.Array, origins: Array, directions: Array,
                      radii: Array, num_samples: int, near: Array, far: Array,
                      randomized: bool, disparity: bool = False
                      ) -> Tuple[Array, Tuple[Array, Array]]:
    """Stratified sampling of conical frustums along rays.

    Args:
      origins, directions: [B, 3]; radii, near, far: [B, 1].
    Returns:
      t_samples [B, N+1], (means [B, N, 3], covs [B, N, 3]).

    Reference: /root/reference/models/mip.py:113-151.
    """
    u = jnp.linspace(0.0, 1.0, num_samples + 1, dtype=origins.dtype)
    if disparity:
        t_edges = 1.0 / (1.0 / near * (1.0 - u) + 1.0 / far * u)
    else:
        t_edges = near + (far - near) * u
    t_edges = jnp.broadcast_to(t_edges, origins.shape[:-1] + (num_samples + 1,))
    t_samples = _stratify(key, t_edges, randomized)
    means, covs = cast_rays(t_samples, origins, directions, radii)
    return t_samples, (means, covs)


def sample_env_rays(key: jax.Array, point_origins: Array, directions: Array,
                    num_samples: int, near: Array, far: Array, radii: Array,
                    randomized: bool) -> Tuple[Array, Tuple[Array, Array], Array]:
    """Sample secondary (irradiance) rays from surface points toward env dirs.

    Instead of the reference's repeat+reshape to a flat [B*D, S] batch
    (/root/reference/models/mip.py:154-194), results stay in structured
    [B, D, ...] form; callers flatten at the MLP boundary. The reference also
    (accidentally) shares one stratified jitter across the whole batch via
    broadcasting (`torch.rand(num_points, S+1)` with num_points==1,
    models/mip.py:186); here jitter is drawn per (ray, direction).

    Args:
      point_origins: [B, 3] surface points.
      directions: [D, 3] env directions; near/far/radii: [D, 1].
    Returns:
      t_samples [B, D, S+1], (means [B, D, S, 3], covs [B, D, S, 3]),
      viewdirs [B, D, 3].
    """
    B = point_origins.shape[0]
    D = directions.shape[0]
    u = jnp.linspace(0.0, 1.0, num_samples + 1, dtype=point_origins.dtype)
    t_edges = near + (far - near) * u  # [D, S+1]
    t_edges = jnp.broadcast_to(t_edges, (B, D, num_samples + 1))
    t_samples = _stratify(key, t_edges, randomized)

    origins = jnp.broadcast_to(point_origins[:, None, :], (B, D, 3))
    dirs = jnp.broadcast_to(directions[None, :, :], (B, D, 3))
    radii_b = jnp.broadcast_to(radii[None, :, :], (B, D, 1))
    means, covs = cast_rays(t_samples, origins, dirs, radii_b)
    return t_samples, (means, covs), dirs


# ---------------------------------------------------------------------------
# Inverse-CDF resampling (fine level)
# ---------------------------------------------------------------------------

def sorted_piecewise_constant_pdf(key: jax.Array, bins: Array, weights: Array,
                                  num_samples: int, randomized: bool) -> Array:
    """Draw samples from a per-ray piecewise-constant PDF over sorted bins.

    Matches the semantics of /root/reference/models/mip.py:240-301, but finds
    CDF intervals with a broadcast max/min reduction over an [B, N+1, S]
    comparison mask instead of searchsorted+gather — reduction-friendly on the
    VPU, no dynamic indexing.

    Args:
      bins: [B, N+1] sorted fenceposts; weights: [B, N].
    Returns:
      samples [B, num_samples].
    """
    eps = 1e-5
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jnp.maximum(0.0, eps - weight_sum)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding

    pdf = weights / weight_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate([
        jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])
    ], axis=-1)  # [B, N+1]

    if randomized:
        s = 1.0 / num_samples
        u = jnp.arange(num_samples, dtype=cdf.dtype) * s
        u = u + jax.random.uniform(key, cdf.shape[:-1] + (num_samples,),
                                   dtype=cdf.dtype, maxval=s - _F32_EPS)
        u = jnp.minimum(u, 1.0 - _F32_EPS)
    else:
        u = jnp.linspace(0.0, 1.0 - _F32_EPS, num_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_samples,))

    # For each u, locate its CDF interval: the largest bin edge with
    # cdf <= u below, the smallest with cdf > u above.
    mask = u[..., None, :] >= cdf[..., :, None]  # [B, N+1, S]

    def lower_upper(x):
        x_lo = jnp.max(jnp.where(mask, x[..., None], x[..., :1, None]), axis=-2)
        x_hi = jnp.min(jnp.where(mask, x[..., -1:, None], x[..., None]), axis=-2)
        return x_lo, x_hi

    bins_lo, bins_hi = lower_upper(bins)
    cdf_lo, cdf_hi = lower_upper(cdf)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_lo) / denom
    return bins_lo + t * (bins_hi - bins_lo)


def resample_along_rays(key: jax.Array, origins: Array, directions: Array,
                        radii: Array, t_samples: Array, weights: Array,
                        randomized: bool, stop_grad: bool,
                        resample_padding: float,
                        num_samples: Optional[int] = None
                        ) -> Tuple[Array, Tuple[Array, Array]]:
    """Resample frustums proportionally to blurpooled coarse weights.

    Reference: /root/reference/models/mip.py:304-352. `num_samples`
    overrides the resampled SAMPLE count (default: same as the coarse
    level — the reference's behavior); fewer samples concentrate where
    the coarse CDF puts density mass (the eval FLOP-cut knob,
    BaseNeRF.eval_fine_samples).
    """
    weights_pad = jnp.concatenate(
        [weights[..., :1], weights, weights[..., -1:]], axis=-1)
    weights_max = jnp.maximum(weights_pad[..., :-1], weights_pad[..., 1:])
    weights_blur = 0.5 * (weights_max[..., :-1] + weights_max[..., 1:])
    weights_blur = weights_blur + resample_padding

    new_t_vals = sorted_piecewise_constant_pdf(
        key, t_samples, weights_blur,
        (num_samples + 1) if num_samples else t_samples.shape[-1],
        randomized)
    if stop_grad:
        new_t_vals = jax.lax.stop_gradient(new_t_vals)
    means, covs = cast_rays(new_t_vals, origins, directions, radii)
    return new_t_vals, (means, covs)


# ---------------------------------------------------------------------------
# Positional encodings
# ---------------------------------------------------------------------------

def expected_sin(x: Array, x_var: Array) -> Array:
    """E[sin(z)] for z ~ N(x, x_var). Reference models/mip.py:355-361."""
    return jnp.exp(-0.5 * x_var) * jnp.sin(x)


def _scale_select_matrix(dims: int, min_deg: int, max_deg: int,
                         squared: bool) -> np.ndarray:
    """[dims, L*dims] selection-and-scale matrix: column j = deg*dims + d
    picks input dim d scaled by 2^deg (or 4^deg). Lets the frequency
    broadcast run as one MXU matmul instead of building [..., L, dims]
    intermediates whose tiny minor dim wastes ~97% of each vector lane."""
    L = max_deg - min_deg
    sel = np.zeros((dims, L * dims), np.float32)
    for deg in range(L):
        s = (4.0 if squared else 2.0) ** (min_deg + deg)
        for d in range(dims):
            sel[d, deg * dims + d] = s
    return sel


def integrated_pos_enc(means: Array, covs_diag: Array, min_deg: int,
                       max_deg: int) -> Array:
    """Integrated positional encoding of Gaussians (diagonal covariance).

    Output feature order matches the reference exactly: degree-major then
    dimension, sin block then cos block
    (/root/reference/models/mip.py:394-428). The per-degree broadcast is
    expressed as a matmul with an exact power-of-two selection matrix —
    values up to 2^16 are exactly representable, so this is bitwise
    equivalent to the broadcast-and-reshape form but TPU-layout friendly.

    Args:
      means, covs_diag: [..., 3].
    Returns:
      [..., 2 * 3 * (max_deg - min_deg)].
    """
    dims = means.shape[-1]
    sel = jnp.asarray(_scale_select_matrix(dims, min_deg, max_deg, False))
    sel_sq = jnp.asarray(_scale_select_matrix(dims, min_deg, max_deg, True))
    # precision=HIGHEST is REQUIRED, not a nicety: the TPU's default bf16
    # matmul precision garbles the phase y = 2^deg * mean at every degree
    # whose attenuation hasn't killed the feature (y is large, sin(y) needs
    # the low bits), and — worse — XLA may duplicate this dot for different
    # consumers with different roundings, which breaks the analytic
    # derivative identity the explicit-normals path relies on
    # (models/normals.py). With HIGHEST the products are exact f32
    # (power-of-two scales), so every copy agrees bit-for-bit.
    y = jnp.matmul(means, sel, precision=jax.lax.Precision.HIGHEST)
    y_var = jnp.matmul(covs_diag, sel_sq,
                       precision=jax.lax.Precision.HIGHEST)
    return expected_sin(
        jnp.concatenate([y, y + 0.5 * jnp.pi], axis=-1),
        jnp.concatenate([y_var, y_var], axis=-1))


def pos_enc(x: Array, min_deg: int, max_deg: int,
            append_identity: bool = True) -> Array:
    """Classic NeRF positional encoding. Reference models/mip.py:431-441.
    Uses the same matmul-broadcast trick as `integrated_pos_enc`."""
    sel = jnp.asarray(
        _scale_select_matrix(x.shape[-1], min_deg, max_deg, False))
    # Exact phases (see integrated_pos_enc for why HIGHEST is required).
    xb = jnp.matmul(x, sel, precision=jax.lax.Precision.HIGHEST)
    four_feat = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
    if append_identity:
        return jnp.concatenate([x, four_feat], axis=-1)
    return four_feat


# ---------------------------------------------------------------------------
# Volume rendering
# ---------------------------------------------------------------------------

def distortion_loss(t_samples: Array, weights: Array) -> Array:
    """Mip-NeRF 360 distortion loss on normalized ray distances.

    L = sum_ij w_i w_j |m_i - m_j| + 1/3 sum_i w_i^2 (s_{i+1} - s_i), with
    s = (t - near) / (far - near) per ray and m the interval midpoints.
    Penalizes weight spread along the ray — phantom "fog" density in free
    space collapses onto surfaces. Not in the reference (its sparse-pano
    geometry keeps floaters that short-circuit the irradiance coupling the
    HDR recovery depends on; NOTES.md HDR study). Returns a scalar (mean
    over rays).

    Args:
      t_samples: [B, N+1] fenceposts; weights: [B, N].
    """
    near = t_samples[..., :1]
    far = t_samples[..., -1:]
    s = (t_samples - near) / jnp.maximum(far - near, 1e-10)
    mids = 0.5 * (s[..., 1:] + s[..., :-1])
    intervals = s[..., 1:] - s[..., :-1]
    dm = jnp.abs(mids[..., :, None] - mids[..., None, :])
    inter = jnp.sum(weights[..., :, None] * weights[..., None, :] * dm,
                    axis=(-2, -1))
    intra = jnp.sum(weights ** 2 * intervals, axis=-1) / 3.0
    return jnp.mean(inter + intra)


def volumetric_rendering(rgb: Array, density: Array, t_samples: Array,
                         dirs: Array, white_bkgd: bool
                         ) -> Tuple[Array, Array, Array, Array]:
    """Alpha-composite per-sample radiance along each ray.

    Args:
      rgb: [..., N, 3]; density: [..., N, 1]; t_samples: [..., N+1];
      dirs: [..., 3] (un-normalized — its norm scales the deltas).
    Returns:
      comp_rgb [..., 3], distance [...], acc [...], weights [..., N].

    Reference: /root/reference/models/mip.py:444-483.
    """
    t_mids = 0.5 * (t_samples[..., :-1] + t_samples[..., 1:])
    t_interval = t_samples[..., 1:] - t_samples[..., :-1]
    delta = t_interval * jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    density_delta = density[..., 0] * delta

    alpha = 1.0 - jnp.exp(-density_delta)
    trans = jnp.exp(-jnp.concatenate([
        jnp.zeros_like(density_delta[..., :1]),
        jnp.cumsum(density_delta[..., :-1], axis=-1),
    ], axis=-1))
    weights = alpha * trans

    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-1)
    # Softplus densities keep acc strictly positive; the epsilon only guards
    # autodiff through pathological all-zero inputs.
    distance = jnp.sum(weights * t_mids, axis=-1) / jnp.maximum(acc, 1e-10)
    distance = jnp.clip(distance, t_samples[..., 0], t_samples[..., -1])
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    return comp_rgb, distance, acc, weights


# ---------------------------------------------------------------------------
# mip-NeRF 360 extensions (present in the reference but outside its main
# path: models/mip.py:92-110, 364-391, 550-570)
# ---------------------------------------------------------------------------

def sample_along_rays_360(key: jax.Array, origins: Array, directions: Array,
                          radii: Array, num_samples: int, near: Array,
                          far: Array, randomized: bool
                          ) -> Tuple[Array, Tuple[Array, Array]]:
    """Linear-in-disparity sampling with full covariances (mip-NeRF 360).

    Returns t in *inverse* depth (the reference returns t_inv and casts rays
    at t = 1/t_inv, models/mip.py:92-110).
    """
    u = jnp.linspace(0.0, 1.0, num_samples + 1, dtype=origins.dtype)
    t_inv = (1.0 / far) * u + (1.0 - u) * (1.0 / near)
    t_inv = jnp.broadcast_to(t_inv, origins.shape[:-1] + (num_samples + 1,))
    # Note: stratification jitters in inverse-depth space.
    t_inv = _stratify(key, t_inv, randomized)
    t = 1.0 / t_inv
    means, covs = cast_rays(t, origins, directions, radii, diagonal=False)
    return t_inv, (means, covs)


_ICOSAHEDRON_BASIS = np.array([
    [0.8506508, 0.0, 0.5257311],
    [0.809017, 0.5, 0.309017],
    [0.5257311, 0.8506508, 0.0],
    [1.0, 0.0, 0.0],
    [0.809017, 0.5, -0.309017],
    [0.8506508, 0.0, -0.5257311],
    [0.309017, 0.809017, -0.5],
    [0.0, 0.5257311, -0.8506508],
    [0.5, 0.309017, -0.809017],
    [0.0, 1.0, 0.0],
    [-0.5257311, 0.8506508, 0.0],
    [-0.309017, 0.809017, -0.5],
    [0.0, 0.5257311, 0.8506508],
    [-0.309017, 0.809017, 0.5],
    [0.309017, 0.809017, 0.5],
    [0.5, 0.309017, 0.809017],
    [0.5, -0.309017, 0.809017],
    [0.0, 0.0, 1.0],
    [-0.5, 0.309017, 0.809017],
    [-0.809017, 0.5, 0.309017],
    [-0.809017, 0.5, -0.309017],
], dtype=np.float32).T  # [3, 21]


def safe_normalize(x: Array, eps: float = 1e-12) -> Array:
    """Unit vectors along the last axis with a FINITE backward at x == 0.

    The common `x / maximum(norm(x), eps)` guards only the forward:
    `norm`'s own backward contains sqrt'(0) = inf, so an exactly-zero
    vector (e.g. a sample whose density gradient has every ReLU path
    dead) turns into NaN gradients via 0 * inf — measured as the root
    cause of the round-3 long-run NaN events (grad[ort]/grad[surface]
    non-finite at a finite loss; NOTES.md spike forensics). Clamping the
    SQUARED norm before the sqrt keeps both passes finite (max's
    subgradient selects the constant branch at 0) and is bitwise
    identical to the naive form wherever ||x|| >= eps.

    Degenerate vectors (||x|| < eps) map to exactly zero with exactly
    zero gradient — the subgradient convention — so they neither NaN the
    step nor blow up the global norm the optimizer clip sees.
    """
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    # The inner maximum keeps the untaken branch finite: without it,
    # sqrt(0) puts an inf in the where, whose BACKWARD is 0 * inf = NaN
    # (the exact bug this helper exists to fix).
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return jnp.where(sq >= eps * eps, x / norm, 0.0)


def contract(x: Array) -> Array:
    """mip-NeRF 360 scene contraction: maps R^3 into a radius-2 ball.

    Reference: models/mip.py:550-552 (applied only where |x| > 1 by
    `parameterization`).
    """
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return (2.0 - 1.0 / norm) * x / norm


def parameterization(means: Array, covs: Array) -> Tuple[Array, Array]:
    """Contract means outside the unit ball; transport covariances by the
    contraction Jacobian: cov' = J cov J^T.

    Replaces the reference's boolean-mask + per-point `vmap(jacrev())`
    (models/mip.py:555-570) with a branch-free jnp.where formulation — no
    dynamic shapes, jit-stable.
    """
    norm = jnp.linalg.norm(means, axis=-1, keepdims=True)
    mask = norm[..., 0] > 1.0

    jac = jax.vmap(jax.jacfwd(contract))(
        means.reshape(-1, 3)).reshape(means.shape + (3,))
    contr_covs = jac @ covs @ jnp.swapaxes(jac, -1, -2)
    new_means = jnp.where(mask[..., None], contract(means), means)
    new_covs = jnp.where(mask[..., None, None], contr_covs, covs)
    return new_means, new_covs


def integrated_pos_enc_360(means: Array, covs: Array) -> Array:
    """IPE over the 21-direction icosahedral basis with full covariances
    (mip-NeRF 360). Reference: models/mip.py:364-391."""
    P = jnp.asarray(_ICOSAHEDRON_BASIS, dtype=means.dtype)
    means, covs = parameterization(means, covs)
    y = means @ P
    y_var = jnp.sum((covs @ P) * P, axis=-2)
    return expected_sin(
        jnp.concatenate([y, y + 0.5 * jnp.pi], axis=-1),
        jnp.concatenate([y_var, y_var], axis=-1))


# ---------------------------------------------------------------------------
# Alternative compositing + helpers
# ---------------------------------------------------------------------------

def volumetric_lighting_composing(rgb: Array, density: Array,
                                  t_samples: Array, dirs: Array,
                                  white_bkgd: bool
                                  ) -> Tuple[Array, Array, Array, Array]:
    """Volume rendering with inverse-square distance attenuation on radiance:
    comp = sum_i w_i * rgb_i / (1 + t_i^2).

    The reference keeps this variant for env-light compositing experiments
    (models/mip.py:486-527; its call site is commented out at
    models/pano_mip_nerf.py:340-343).
    """
    t_mids = 0.5 * (t_samples[..., :-1] + t_samples[..., 1:])
    t_interval = t_samples[..., 1:] - t_samples[..., :-1]
    delta = t_interval * jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    density_delta = density[..., 0] * delta
    alpha = 1.0 - jnp.exp(-density_delta)
    trans = jnp.exp(-jnp.concatenate([
        jnp.zeros_like(density_delta[..., :1]),
        jnp.cumsum(density_delta[..., :-1], axis=-1),
    ], axis=-1))
    weights = alpha * trans

    attenuation = 1.0 / (1.0 + t_mids ** 2)
    comp_rgb = jnp.sum((weights * attenuation)[..., None] * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-1)
    distance = jnp.sum(weights * t_mids, axis=-1) / jnp.maximum(acc, 1e-10)
    distance = jnp.clip(distance, t_samples[..., 0], t_samples[..., -1])
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    return comp_rgb, distance, acc, weights


def sample_env_rays_hemisphere(key: jax.Array, point_origins: Array,
                               directions: Array, num_samples: int,
                               near: Array, far: Array, radii: Array,
                               randomized: bool
                               ) -> Tuple[Array, Tuple[Array, Array], Array]:
    """Per-point env directions (e.g. normal-aligned hemispheres): like
    `sample_env_rays` but directions vary per batch element, [B, D, 3].

    Reference: models/mip.py:197-237 (`sample_each_points_hemisp`).
    """
    B, D = directions.shape[:2]
    u = jnp.linspace(0.0, 1.0, num_samples + 1, dtype=point_origins.dtype)
    t_edges = jnp.broadcast_to(near + (far - near) * u, (B, D, num_samples + 1))
    t_samples = _stratify(key, t_edges, randomized)
    origins = jnp.broadcast_to(point_origins[:, None, :], (B, D, 3))
    radii_b = jnp.broadcast_to(radii[None, :, :], (B, D, 1))
    means, covs = cast_rays(t_samples, origins, directions, radii_b)
    return t_samples, (means, covs), directions


def importance_env_directions(key: jax.Array, cell_dirs: Array,
                              cell_weights: Array, num_dirs: int,
                              uniform_mix: float = 0.5,
                              cap_scale: float = 2.0
                              ) -> Tuple[Array, Array]:
    """Importance-sample env directions from per-cell weights, with exact
    Monte-Carlo density weights.

    The estimator `sum_d L(w_d) cos / (D * pdf(w_d))` is unbiased for the
    irradiance integral for ANY strictly-positive pdf; this routine builds a
    defensive proposal concentrated on bright cells and returns the exact
    density of its own sampling process (no reference counterpart — the
    reference integrates a fixed direction set, pano_datasets.py:218-263,
    whose bias/variance destabilizes HDR recovery; see NOTES.md).

    Process (per batch element):
      1. cell c ~ p = uniform_mix/Dp + (1-uniform_mix) * w_c / sum(w),
      2. direction uniform on the spherical cap of area
         cap_scale * 4pi/Dp around cell center mu_c (caps overlap by
         construction — cap_scale > 1 makes their union cover the sphere,
         keeping the pdf strictly positive everywhere),
      3. pdf(w) = sum_c p_c * [w . mu_c >= cos_half] / A_cap  (exact for
         this process, including overlaps).

    Args:
      cell_dirs: [B, Dp, 3] unit cell centers (e.g. per-ray rotated
        Fibonacci); cell_weights: [B, Dp] non-negative proposal weights.
    Returns:
      dirs [B, num_dirs, 3] unit vectors, inv_density [B, num_dirs, 1]
      equal to 1 / (num_dirs * pdf) — the per-direction solid-angle weight
      that replaces the uniform 4pi/D lossmult.
    """
    B, Dp = cell_weights.shape
    k_cell, k_cos, k_phi = jax.random.split(key, 3)

    wsum = jnp.sum(cell_weights, axis=-1, keepdims=True)
    p = (uniform_mix / Dp
         + (1.0 - uniform_mix) * cell_weights / jnp.maximum(wsum, 1e-12))
    p = jnp.where(wsum > 0, p, jnp.full_like(p, 1.0 / Dp))

    cells = jax.random.categorical(
        k_cell, jnp.log(p)[:, None, :], shape=(B, num_dirs))  # [B, D]
    mu = jnp.take_along_axis(cell_dirs, cells[..., None], axis=1)  # [B,D,3]

    # Uniform on the cap: cos(theta) ~ U[cos_half, 1], phi ~ U[0, 2pi).
    cos_half = 1.0 - cap_scale * 2.0 / Dp
    A_cap = 2.0 * jnp.pi * (1.0 - cos_half)
    u = jax.random.uniform(k_cos, (B, num_dirs, 1))
    ct = cos_half + (1.0 - cos_half) * u
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    phi = jax.random.uniform(k_phi, (B, num_dirs, 1)) * 2.0 * jnp.pi
    # Orthonormal frame around mu (branch-free; the reference axis flips
    # where mu is near +-z to stay non-parallel).
    near_z = jnp.abs(mu[..., 2:3]) > 0.9
    ref = jnp.where(near_z, jnp.array([1.0, 0.0, 0.0]),
                    jnp.array([0.0, 0.0, 1.0]))
    a = jnp.cross(mu, ref)
    a = safe_normalize(a)
    b = jnp.cross(mu, a)
    dirs = ct * mu + st * (jnp.cos(phi) * a + jnp.sin(phi) * b)
    dirs = safe_normalize(dirs)

    # Exact density of the process (sum over every cap containing the
    # direction; >= with a small slack so a sample on its own cap boundary
    # never sees pdf = 0).
    inside = (jnp.einsum("bdi,bci->bdc", dirs, cell_dirs)
              >= cos_half - 1e-6)
    pdf = jnp.sum(p[:, None, :] * inside, axis=-1) / A_cap  # [B, D]
    inv_density = 1.0 / (num_dirs * jnp.maximum(pdf, 1e-12))
    return dirs, inv_density[..., None]


def stratified_env_directions(key: jax.Array, cell_dirs: Array,
                              cap_scale: float = 2.0
                              ) -> Tuple[Array, Array]:
    """Stratified env directions: one jittered sample per direction cell.

    Each of the D cell centers (e.g. a per-ray rotated Fibonacci set) emits
    exactly one direction, drawn uniformly on the spherical cap of area
    cap_scale * 4pi/D around it. With the overlap-corrected weight
    A_cap / n(w) (n = number of caps containing w) the estimator
    sum_d L(w_d) cos * weight_d is exactly unbiased:
      E[sum_d f(w_d) A/n(w_d)] = sum_d int_{cap_d} f/n = int f,
    since sum_d 1[w in cap_d] = n(w). Unlike iid rotation (same mean), the
    variance is per-stratum only — a bright emitter spanning >= 1 cell is
    hit every step — which is what stabilizes HDR source recovery
    (NOTES.md HDR study). cap_scale > 1 makes the caps' union cover the
    sphere (verified in tests for the shipped direction counts).

    Args:
      cell_dirs: [B, D, 3] unit cell centers.
    Returns:
      dirs [B, D, 3], weight [B, D, 1] (replaces the uniform 4pi/D).
    """
    B, D = cell_dirs.shape[:2]
    k_cos, k_phi = jax.random.split(key)
    cos_half = 1.0 - cap_scale * 2.0 / D
    A_cap = 2.0 * jnp.pi * (1.0 - cos_half)
    u = jax.random.uniform(k_cos, (B, D, 1))
    ct = cos_half + (1.0 - cos_half) * u
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    phi = jax.random.uniform(k_phi, (B, D, 1)) * 2.0 * jnp.pi
    mu = cell_dirs
    near_z = jnp.abs(mu[..., 2:3]) > 0.9
    ref = jnp.where(near_z, jnp.array([1.0, 0.0, 0.0]),
                    jnp.array([0.0, 0.0, 1.0]))
    a = jnp.cross(mu, ref)
    a = safe_normalize(a)
    b = jnp.cross(mu, a)
    dirs = ct * mu + st * (jnp.cos(phi) * a + jnp.sin(phi) * b)
    dirs = safe_normalize(dirs)
    n = jnp.sum(jnp.einsum("bdi,bci->bdc", dirs, cell_dirs)
                >= cos_half - 1e-6, axis=-1)
    weight = A_cap / jnp.maximum(n, 1)
    return dirs, weight[..., None]


def split_rays_into_chunks(rays, chunk_size: int = 4096):
    """Flatten an image's rays and split into chunk-sized bundles.

    Host-side counterpart of the reference `rearrange_render_image`
    (models/mip.py:530-547). The jit-side equivalent used by the systems is
    `BaseSystem._chunked` (lax.map over padded chunks); this version exists
    for API parity and host-side pipelines.
    Returns (list_of_chunk_rays, val_mask) where val_mask mirrors the
    reference's vestigial third-from-last field return.
    """
    fields = [getattr(rays, k) for k in rays._fields]
    val_mask = fields[-3]
    flat = [f.reshape(-1, f.shape[-1]) for f in fields]
    n = flat[0].shape[0]
    chunks = []
    for s in range(0, n, chunk_size):
        chunks.append(type(rays)(*[f[s:s + chunk_size] for f in flat]))
    return chunks, val_mask
