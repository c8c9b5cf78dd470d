"""Pano-NeRF: HDR panoramic radiance field with geometry-aware irradiance.

Functional JAX counterpart of /root/reference/models/pano_mip_nerf.py:117-363.
The MLP's 5 "density" channels split into density(1) + albedo(3) +
roughness(1) (reference :263-266 and systems/base_system.py:24). The fine
level adds density-gradient normals and, when `enable_surf`, the
surface/irradiance path: collocated surface points fire `num_ray_samples`
secondary env rays whose composited radiance is integrated against a
Lambertian BRDF (reference :315-359).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp

from pano_nerf_tpu.core.rays import Rays
from pano_nerf_tpu.models.base import BaseNeRF, LevelOutput
from pano_nerf_tpu.ops import mip, shading
from pano_nerf_tpu.utils import rotation


@dataclasses.dataclass(frozen=True)
class PanoMipNeRF(BaseNeRF):
    mlp_num_density_channels: int = 5

    @classmethod
    def from_hparams(cls, hparams: dict, **overrides):
        # 5 channels = density + albedo(3) + roughness, fixed by the system
        # factory in the reference (systems/base_system.py:24), independent of
        # the yaml's mlp.num_density_channels.
        overrides.setdefault("mlp_num_density_channels", 5)
        return super().from_hparams(hparams, **overrides)

    def _split_heads(self, raw_density: jax.Array):
        """density(1) | albedo(3) | roughness(1), with activations.

        Reference: models/pano_mip_nerf.py:263-278. Albedo range follows
        NeRFactor: sigmoid * 0.77 + 0.03.
        """
        raw_rough = raw_density[..., -1:]
        raw_albedo = raw_density[..., 1:-1]
        raw_sigma = raw_density[..., :1]
        albedo = jax.nn.sigmoid(raw_albedo) * 0.77 + 0.03
        roughness = jax.nn.softplus(raw_rough - 1.0)
        return raw_sigma, albedo, roughness

    def __call__(self, params, key: jax.Array, rays: Rays, env_rays: Rays,
                 randomized: bool, white_bkgd: bool, enable_surf: bool,
                 use_ort_loss: bool, first_order: bool = False
                 ) -> List[LevelOutput]:
        """Coarse/fine forward. `first_order=True` promises the caller will
        differentiate the outputs at most once (e.g. eval rendering), which
        lets the fine level use the fused Pallas kernel too; the coarse and
        env subgraphs always may (their outputs feed the loss directly,
        first-order, even in training)."""
        keys = jax.random.split(key, 2 * self.num_levels + 1)
        k_env = keys[-1]
        ret: List[LevelOutput] = []
        t_samples, weights = None, None
        for i_level in range(self.num_levels):
            t_samples, (means, covs) = self._sample_level(
                keys[2 * i_level], rays, i_level, t_samples, weights,
                randomized)
            fine_level = (i_level == self.num_levels - 1
                          and self.num_levels >= 2)

            def make_graph(covs, viewdirs, noise_key, fused):
                def fn(m):
                    raw_rgb, raw_density = self._raw_outputs(
                        params, m, covs, viewdirs, fused=fused)
                    raw_sigma, albedo, roughness = self._split_heads(
                        raw_density)
                    rgb, density = self._activate_rgb_density(
                        raw_rgb, raw_sigma, noise_key, randomized)
                    return rgb, density, albedo, roughness
                return jax.checkpoint(fn) if self.remat else fn

            fine = fine_level
            # Training fine level only: under `first_order` (eval) the vjp
            # path is cheaper — it rides the fused kernel and is
            # differentiated zero times.
            explicit = (fine and self.normals_impl == "explicit"
                        and not first_order)
            if explicit:
                # Forward + explicit density gradient in one pass: the whole
                # training step stays first-order (models/normals.py).
                raw_rgb, raw_density, d_raw_sigma = (
                    self._raw_outputs_density_grad(
                        params, means, covs, rays.viewdirs))
                raw_sigma, albedos, roughnesses = self._split_heads(
                    raw_density)
                raw_sigma = self._density_noise(
                    raw_sigma, keys[2 * i_level + 1], randomized)
                rgb = jax.nn.softplus(raw_rgb)
                rgb = rgb * (1.0 + 2.0 * self.rgb_padding) - self.rgb_padding
                density = jax.nn.softplus(raw_sigma + self.density_bias)
                # Chain softplus: d(density)/d(means) = sigmoid * d(raw).
                d_means = (jax.nn.sigmoid(raw_sigma + self.density_bias)
                           * d_raw_sigma)
            else:
                graph = make_graph(covs, rays.viewdirs, keys[2 * i_level + 1],
                                   fused=first_order or not fine_level)
                if fine:
                    (rgb, density, albedos, roughnesses), vjp_fn = jax.vjp(
                        graph, means)
                else:
                    rgb, density, albedos, roughnesses = graph(means)

            comp_rgb, distance, acc, weights = mip.volumetric_rendering(
                rgb, density, t_samples, rays.directions, white_bkgd)

            if not fine:
                ret.append(LevelOutput(rgb=comp_rgb, distance=distance, acc=acc))
                continue

            if not explicit:
                # --- normals from the density gradient (one shared bwd) ---
                (d_means,) = vjp_fn(
                    (jnp.zeros_like(rgb), jnp.ones_like(density),
                     jnp.zeros_like(albedos), jnp.zeros_like(roughnesses)))
            normal, ort_loss, w_norm = self._expected_normals(
                weights, -d_means, rays.directions, use_ort_loss)

            out = dict(rgb=comp_rgb, distance=distance, acc=acc,
                       ort_loss=ort_loss, normal=normal,
                       roughness=jnp.sum(w_norm[..., 0] * roughnesses[..., 0],
                                         axis=-1))
            if enable_surf:
                # Expected albedo along the primary ray.
                albedo = jnp.sum(w_norm * albedos, axis=-2)

                # Collocated surface point (gradient kept through distance,
                # matching detach_dist=False, reference :321-324).
                surf_origins = rays.origins + rays.directions * distance[..., None]

                if self.env_rotation and randomized:
                    # Per-ray Haar-random rotation of the direction set: the
                    # D-direction irradiance estimate becomes unbiased (each
                    # R @ d_i is uniform on the sphere, weight 4pi/D), fixing
                    # the emitter-radiance divergence the fixed Fibonacci set
                    # causes at small D. Same MLP cost; eval keeps the fixed
                    # set (randomized=False).
                    k_env, k_rot = jax.random.split(k_env)
                    rot = rotation.random_rotations(
                        k_rot, surf_origins.shape[:-1])
                    env_dirs = jnp.einsum(
                        "...ij,dj->...di", rot, env_rays.directions)
                    lit_t, (lit_means, lit_covs), lit_dirs = (
                        mip.sample_env_rays_hemisphere(
                            k_env, surf_origins, env_dirs,
                            self.num_env_samples, env_rays.near,
                            env_rays.far, env_rays.radii, randomized))
                else:
                    lit_t, (lit_means, lit_covs), lit_dirs = (
                        mip.sample_env_rays(
                            k_env, surf_origins, env_rays.directions,
                            self.num_env_samples, env_rays.near,
                            env_rays.far, env_rays.radii, randomized))

                # Secondary radiance query: [B, D, S, .] — always first-order
                # (its output feeds the loss directly), so may always fuse.
                env_graph = make_graph(lit_covs, lit_dirs, None, fused=True)
                e_rgb, e_density, _, _ = env_graph(lit_means)
                env_rgb, *_ = mip.volumetric_rendering(
                    e_rgb, e_density, lit_t, lit_dirs, white_bkgd=False)

                surf_rgb, diffuse, _, shade = shading.surface_rendering(
                    env_rgb, albedo, normal, None, lit_dirs, rays.viewdirs,
                    env_rays.lossmult)
                out.update(albedo=albedo, surf_rgb=surf_rgb, diffuse=diffuse,
                           shading=shade)
            ret.append(LevelOutput(**out))
        return ret
