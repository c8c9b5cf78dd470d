"""The mip-NeRF baseline: 2-level coarse/fine radiance field.

Functional JAX counterpart of /root/reference/models/mip_nerf.py:105-283.
The dead `get_weights`/`get_normals` methods of the reference (which crash on
an undefined `alb_activation`, mip_nerf.py:368,470) are deliberately not
reproduced.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from pano_nerf_tpu.core.rays import Rays
from pano_nerf_tpu.models.base import BaseNeRF, LevelOutput
from pano_nerf_tpu.ops import mip


class MipNeRF(BaseNeRF):
    """Baseline model: 1 density channel, no surface/irradiance path."""

    def __call__(self, params, key: jax.Array, rays: Rays, randomized: bool,
                 white_bkgd: bool, use_ort_loss: bool = False,
                 first_order: bool = False) -> List[LevelOutput]:
        """Coarse/fine forward pass.

        Reference: /root/reference/models/mip_nerf.py:170-283. `first_order`
        promises single differentiation, enabling the fused kernel on the
        normals-producing fine level.
        """
        if (first_order and self.use_fused_kernel_eval
                and not self.use_fused_kernel):
            # Eval-only kernel policy (BaseNeRF.use_fused_kernel_eval):
            # first-order calls ride the piecewise fused kernels.
            import dataclasses
            fused_self = dataclasses.replace(self, use_fused_kernel=True)
            return fused_self(params, key, rays, randomized, white_bkgd,
                              use_ort_loss, first_order)
        if not first_order:
            # Batch-aware training-kernel policy (BaseNeRF.
            # fused_batch_threshold; NOTES.md crossover measurement).
            auto = self._auto_fused_train(rays.origins.shape[0])
            if auto is not None:
                return auto(params, key, rays, randomized, white_bkgd,
                            use_ort_loss, first_order)
        keys = jax.random.split(key, 2 * self.num_levels)
        ret: List[LevelOutput] = []
        t_samples, weights = None, None
        for i_level in range(self.num_levels):
            t_samples, (means, covs) = self._sample_level(
                keys[2 * i_level], rays, i_level, t_samples, weights,
                randomized, eval_counts=first_order)
            fine_normals = i_level == self.num_levels - 1 and use_ort_loss

            def graph(m, fused=first_order or not fine_normals):
                raw_rgb, raw_density = self._raw_outputs(
                    params, m, covs, rays.viewdirs, fused=fused)
                return self._activate_rgb_density(
                    raw_rgb, raw_density, keys[2 * i_level + 1], randomized)

            if fine_normals:
                explicit = self.normals_impl == "explicit" and not first_order
                if explicit:
                    raw_rgb, raw_density, d_raw = (
                        self._raw_outputs_density_grad(
                            params, means, covs, rays.viewdirs))
                    rgb, density = self._activate_rgb_density(
                        raw_rgb, raw_density, keys[2 * i_level + 1],
                        randomized)
                    # NB: density noise feeds _activate_rgb_density before
                    # softplus; with density_noise > 0 the sigmoid below
                    # would need the noised raw value — recompute it.
                    raw_noised = self._density_noise(
                        raw_density, keys[2 * i_level + 1], randomized)
                    d_means = (jax.nn.sigmoid(raw_noised + self.density_bias)
                               * d_raw)
                else:
                    (rgb, density), vjp_fn = jax.vjp(graph, means)
                comp_rgb, distance, acc, weights = mip.volumetric_rendering(
                    rgb, density, t_samples, rays.directions, white_bkgd)
                if not explicit:
                    (d_means,) = vjp_fn(
                        (jnp.zeros_like(rgb), jnp.ones_like(density)))
                normal, ort_loss, _ = self._expected_normals(
                    weights, -d_means, rays.directions, use_ort_loss=True)
                ret.append(LevelOutput(rgb=comp_rgb, distance=distance,
                                       acc=acc, ort_loss=ort_loss,
                                       normal=normal))
            else:
                rgb, density = graph(means)
                comp_rgb, distance, acc, weights = mip.volumetric_rendering(
                    rgb, density, t_samples, rays.directions, white_bkgd)
                # Reference emits ones as a placeholder normal at the coarse
                # level (mip_nerf.py:281).
                ret.append(LevelOutput(rgb=comp_rgb, distance=distance,
                                       acc=acc,
                                       normal=jnp.ones_like(comp_rgb)))
        return ret
