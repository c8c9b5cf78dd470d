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
        # the yaml's mlp.num_density_channels. The emissive-head
        # decomposition (BaseNeRF.emissive_head) appends 3 self-emission
        # channels.
        overrides.setdefault(
            "mlp_num_density_channels",
            5 + (3 if bool(hparams.get("nerf.emissive_head", False)) else 0)
            + (3 if bool(hparams.get("nerf.chroma_head", False)) else 0))
        return super().from_hparams(hparams, **overrides)

    def _split_heads(self, raw_density: jax.Array):
        """density(1) | albedo(3) | roughness(1) [| emission(3)], with
        activations (emission is split separately via `_split_emission`).

        Reference: models/pano_mip_nerf.py:263-278. Albedo range follows
        NeRFactor: sigmoid * 0.77 + 0.03.
        """
        raw_sigma = raw_density[..., :1]
        raw_albedo = raw_density[..., 1:4]
        raw_rough = raw_density[..., 4:5]
        albedo = jax.nn.sigmoid(raw_albedo) * 0.77 + 0.03
        roughness = jax.nn.softplus(raw_rough - 1.0)
        return raw_sigma, albedo, roughness

    def _split_emission(self, raw_density: jax.Array):
        """Per-sample view-independent self-emission [..., 3] (HDR radiance,
        softplus biased by `emission_bias` so a fresh head emits
        softplus(bias)), or None when the emissive decomposition is off
        (see BaseNeRF.emissive_head)."""
        if not self.emissive_head:
            return None
        return jax.nn.softplus(raw_density[..., 5:8] + self.emission_bias)

    def _split_chroma(self, raw_density: jax.Array):
        """Per-sample view-independent chroma simplex [..., 3] (softmax —
        sums to 1), or None when the chroma factorization is off (see
        BaseNeRF.chroma_head). Rides the density head AFTER the emission
        channels: density(1) | albedo(3) | roughness(1) [| emission(3)]
        [| chroma(3)]."""
        if not self.chroma_head:
            return None
        off = 8 if self.emissive_head else 5
        return jax.nn.softmax(raw_density[..., off:off + 3], axis=-1)

    def _importance_dirs(self, k_env, make_graph, surf_origins, normal,
                         env_rays):
        """Probe-and-resample env directions (training only, flat [B, 3]).

        A stop-gradient probe pass over `env_probe_dirs` rotated Fibonacci
        cells (each marched with `env_probe_samples` samples) estimates
        incident radiance; the D main directions are then drawn from a
        defensive bright-cell mixture with exact Monte-Carlo weights
        (ops/mip.py::importance_env_directions).

        Returns (dirs [B, D, 3], solid_angle [B, D, 1], fresh k_env).
        """
        from pano_nerf_tpu.utils.spherical import sample_dir_by_uniform
        k_env, k_rot, k_probe, k_pick = jax.random.split(k_env, 4)
        Dp = self.env_probe_dirs
        origins = jax.lax.stop_gradient(surf_origins)
        cell_dirs = jnp.einsum(
            "bij,dj->bdi",
            rotation.random_rotations(k_rot, origins.shape[:-1]),
            jnp.asarray(sample_dir_by_uniform(Dp)))
        ones = jnp.ones((Dp, 1), origins.dtype)
        pt, (pmeans, pcovs), pdirs = mip.sample_env_rays_hemisphere(
            k_probe, origins, cell_dirs, self.env_probe_samples,
            ones * env_rays.near[0, 0], ones * env_rays.far[0, 0],
            ones * env_rays.radii[0, 0], True)
        probe_graph = make_graph(pcovs, pdirs, None, fused=True)
        p_rgb, p_density, _, _ = probe_graph(pmeans)
        probe_rgb, *_ = mip.volumetric_rendering(
            p_rgb, p_density, pt, pdirs, white_bkgd=False)
        luma = shading.compute_illumination(
            jax.lax.stop_gradient(probe_rgb))[..., 0]       # [B, Dp]
        cosw = jax.nn.relu(jnp.einsum(
            "bdi,bi->bd", cell_dirs,
            jax.lax.stop_gradient(normal))) + 0.05
        D = env_rays.directions.shape[0]
        dirs, inv_density = mip.importance_env_directions(
            k_pick, cell_dirs, (luma + 1e-3) * cosw, D)
        return dirs, inv_density, k_env

    def _apply_illum(self, params, env_rgb, surf_origins, lit_dirs):
        """Re-tint the secondary read with the illuminant field's chroma
        (BaseNeRF.illum_field) under a luma-preserving combine.

        env_rgb: [B, D, 3] secondary composite; surf_origins: [B, 3];
        lit_dirs: [B, D, 3]. The field's softmax chroma (x3, so the
        zero-init is the identity tint) multiplies the read, then the
        result is rescaled so its luma tracks the ORIGINAL read's — the
        irradiance loss calibrates intensity through the blurred read
        and the field may only redistribute it across channels. The eps
        degrades to the untinted read near zero luma instead of
        amplifying noise (same shape as the env_tight_chroma combine).
        """
        m = 3.0 * self._illum_chroma(params, surf_origins, lit_dirs)
        tinted = env_rgb * m
        c = 0.01
        luma_b = shading.compute_illumination(env_rgb)
        luma_t = shading.compute_illumination(tinted)
        return tinted * (luma_b + c) / (luma_t + c)

    def _resample_env(self, key, surf_origins, lit_dirs, radii, lit_t,
                      env_weights, randomized):
        """Second (tight-Gaussian) irradiance march for env_resample.

        Blurpool-CDF resample of the blurred placement march — the primary
        coarse->fine scheme (ops/mip.resample_along_rays) applied to the
        secondary rays, so the radiance evidence is carried by Gaussians
        at the IPE scale the primary views actually supervise
        (BaseNeRF.env_resample rationale).
        """
        B, D = lit_dirs.shape[:2]
        S = lit_t.shape[-1] - 1
        Sf = self.num_env_fine_samples
        k = jax.random.fold_in(key, 0xE5)
        origins = jnp.broadcast_to(surf_origins[:, None, :], (B, D, 3))
        rad = jnp.broadcast_to(jnp.reshape(radii, (1, -1, 1))[:, :D],
                               (B, D, 1))
        t2, (m2, c2) = mip.resample_along_rays(
            k, origins.reshape(B * D, 3), lit_dirs.reshape(B * D, 3),
            rad.reshape(B * D, 1), lit_t.reshape(B * D, S + 1),
            env_weights.reshape(B * D, S), randomized, stop_grad=True,
            resample_padding=self.resample_padding,
            num_samples=Sf)
        return (t2.reshape(B, D, Sf + 1),
                (m2.reshape(B, D, Sf, 3), c2.reshape(B, D, Sf, 3)))

    def _render_fused(self, params, key: jax.Array, rays: Rays,
                      env_rays: Rays, randomized: bool, white_bkgd: bool,
                      enable_surf: bool,
                      use_ort_loss: bool = False) -> List[LevelOutput]:
        """Eval render through the whole-level fused kernel.

        Semantics match the standard path at randomized=False (parity
        pinned by tests/test_fused_render.py); density noise is the one
        unsupported feature (the caller gates on it).
        """
        from pano_nerf_tpu.kernels.fused_render import fused_render_level

        def level(means, covs, viewdirs, t_samples, dirs, white_bkgd,
                  need):
            return fused_render_level(
                params, means, covs, viewdirs, t_samples, dirs,
                self.mlp_num_density_channels, self.min_deg_point,
                self.max_deg_point, self.deg_view, self.density_bias,
                self.rgb_padding, white_bkgd, need_normals=need,
                need_extras=need)

        keys = jax.random.split(key, 2 * self.num_levels + 1)
        k_env = keys[-1]
        ret: List[LevelOutput] = []
        t_samples, weights = None, None
        for i_level in range(self.num_levels):
            t_samples, (means, covs) = self._sample_level(
                keys[2 * i_level], rays, i_level, t_samples, weights,
                randomized, eval_counts=True)
            fine = (i_level == self.num_levels - 1 and self.num_levels >= 2)
            r = level(means, covs, rays.viewdirs, t_samples,
                      rays.directions, white_bkgd, need=fine)
            weights = r["weights"]
            if not fine:
                ret.append(LevelOutput(rgb=r["rgb"], distance=r["distance"],
                                       acc=r["acc"]))
                continue
            out = dict(rgb=r["rgb"], distance=r["distance"], acc=r["acc"],
                       normal=r["normal"], roughness=r["roughness"],
                       ort_loss=(jnp.mean(r["ort"]) if use_ort_loss
                                 else None))
            if enable_surf:
                albedo = r["albedo"]
                surf_origins = (rays.origins
                                + rays.directions * r["distance"][..., None])
                lit_t, (lm, lc), lit_dirs = mip.sample_env_rays(
                    k_env, surf_origins, env_rays.directions,
                    self._env_samples(True), env_rays.near, env_rays.far,
                    env_rays.radii, randomized)
                B, D, S2 = lm.shape[:3]
                re = level(lm.reshape(B * D, S2, 3),
                           lc.reshape(B * D, S2, 3),
                           lit_dirs.reshape(B * D, 3),
                           lit_t.reshape(B * D, S2 + 1),
                           lit_dirs.reshape(B * D, 3), False, need=False)
                if self.env_resample:
                    Sf = self.num_env_fine_samples
                    t2, (m2, c2) = self._resample_env(
                        k_env, surf_origins, lit_dirs, env_rays.radii,
                        lit_t, re["weights"].reshape(B, D, S2), randomized)
                    re = level(m2.reshape(B * D, Sf, 3),
                               c2.reshape(B * D, Sf, 3),
                               lit_dirs.reshape(B * D, 3),
                               t2.reshape(B * D, Sf + 1),
                               lit_dirs.reshape(B * D, 3), False,
                               need=False)
                env_rgb = re["rgb"].reshape(B, D, 3)
                if self.illum_field:
                    # Same illuminant re-tint as the standard path (the
                    # modulation runs outside the render kernel).
                    env_rgb = self._apply_illum(params, env_rgb,
                                                surf_origins, lit_dirs)
                surf_rgb, diffuse, _, shade = shading.surface_rendering(
                    env_rgb, albedo, out["normal"], None, lit_dirs,
                    rays.viewdirs, env_rays.lossmult)
                out.update(albedo=albedo, surf_rgb=surf_rgb,
                           diffuse=diffuse, shading=shade)
            ret.append(LevelOutput(**out))
        return ret

    def __call__(self, params, key: jax.Array, rays: Rays, env_rays: Rays,
                 randomized: bool, white_bkgd: bool, enable_surf: bool,
                 use_ort_loss: bool, first_order: bool = False,
                 use_vc_loss: bool = False,
                 use_scale_distill: bool = False) -> List[LevelOutput]:
        """Coarse/fine forward. `first_order=True` promises the caller will
        differentiate the outputs at most once (e.g. eval rendering), which
        lets the fine level use the fused Pallas kernel too; the coarse and
        env subgraphs always may (their outputs feed the loss directly,
        first-order, even in training)."""
        if (first_order and self.use_fused_kernel_eval
                and not self.use_fused_kernel):
            # Eval-only kernel policy (see BaseNeRF.use_fused_kernel_eval):
            # re-dispatch on a copy with the kernels on. Static bools, so
            # this is resolved at trace time.
            fused_self = dataclasses.replace(self, use_fused_kernel=True)
            return fused_self(params, key, rays, env_rays, randomized,
                              white_bkgd, enable_surf, use_ort_loss,
                              first_order, use_vc_loss, use_scale_distill)
        if not first_order:
            # Batch-aware training policy: large batches collapse XLA's
            # fusion windows and the v3 kernel wins (BaseNeRF.
            # fused_batch_threshold); batch 512 traces exactly as before.
            auto = self._auto_fused_train(rays.origins.shape[0])
            if auto is not None:
                return auto(params, key, rays, env_rays, randomized,
                            white_bkgd, enable_surf, use_ort_loss,
                            first_order, use_vc_loss, use_scale_distill)
        if (first_order and self.use_render_kernel
                and self.fused_scope == "all"
                and self._fused_ok("fine") and self.append_identity
                and self.env_tight_rgb == 0
                and (not randomized
                     or (self.density_noise == 0
                         and self._env_mode() == "fixed"))):
            # Whole-level render kernel: MLP + compositing + expectations
            # in VMEM, per-RAY boundary tensors (kernels/fused_render.py).
            # Unsupported combinations (density noise, randomized non-fixed
            # env sampling) fall through to the standard path above.
            return self._render_fused(params, key, rays, env_rays,
                                      randomized, white_bkgd, enable_surf,
                                      use_ort_loss)
        # Training megakernel policy (kernels/fused_render_train.py): the
        # coarse level and env queries render through one-pallas-call
        # fwd/bwd pairs with per-ray boundaries. Density noise is the one
        # unsupported feature; first-order calls use the eval kernels above.
        use_tk = (self.use_train_render_kernel and not first_order
                  and self._kernel_topology_ok()
                  and (not randomized or self.density_noise == 0))

        def train_kernel_level(means, covs, viewdirs, t_s, dirs_,
                               white_bkgd_):
            from pano_nerf_tpu.kernels.fused_render_train import (
                fused_render_train)
            return fused_render_train(
                params, means, covs, viewdirs, t_s, dirs_,
                self.mlp_num_density_channels, self.min_deg_point,
                self.max_deg_point, self.deg_view, self.density_bias,
                self.rgb_padding, white_bkgd_,
                save_acts=self.train_kernel_save_acts,
                rows_target=self.train_kernel_rows)

        keys = jax.random.split(key, 2 * self.num_levels + 1)
        k_env = keys[-1]
        ret: List[LevelOutput] = []
        t_samples, weights = None, None
        for i_level in range(self.num_levels):
            t_samples, (means, covs) = self._sample_level(
                keys[2 * i_level], rays, i_level, t_samples, weights,
                randomized, eval_counts=first_order)
            fine_level = (i_level == self.num_levels - 1
                          and self.num_levels >= 2)
            if (not fine_level and use_tk
                    and self.train_kernel_scope in ("all", "coarse")):
                r = train_kernel_level(means, covs, rays.viewdirs,
                                       t_samples, rays.directions,
                                       white_bkgd)
                weights = r["weights"]
                dist_loss = (mip.distortion_loss(t_samples, weights)
                             if randomized else None)
                ret.append(LevelOutput(rgb=r["rgb"], distance=r["distance"],
                                       acc=r["acc"], dist_loss=dist_loss))
                continue

            def make_graph(covs, viewdirs, noise_key, fused):
                def fn(m):
                    raw_rgb, raw_density = self._raw_outputs(
                        params, m, covs, viewdirs, fused=fused)
                    raw_sigma, albedo, roughness = self._split_heads(
                        raw_density)
                    rgb, density = self._activate_rgb_density(
                        raw_rgb, raw_sigma, noise_key, randomized,
                        chroma=self._split_chroma(raw_density))
                    em = self._split_emission(raw_density)
                    if em is not None:
                        # Total radiance = view-dependent + self-emission:
                        # coarse, env, and probe queries all see emission.
                        rgb = rgb + em
                    return rgb, density, albedo, roughness
                return jax.checkpoint(fn) if self.remat else fn

            fine = fine_level
            # Explicit density-gradient normals (models/normals.py): the
            # chain costs ~9 forward dots, vs a full MLP backward pass for
            # the vjp route — cheaper in training AND at eval
            # (`first_order`), where vjp_fn would execute a backward per
            # chunk just to read the gradient.
            explicit = fine and self.normals_impl == "explicit"
            # Point-normals mode (TRAINING only): skip the per-sample
            # gradient walk entirely and run ONE chain query at the
            # expected Gaussian after compositing (BaseNeRF._point_normal).
            # Eval/first-order calls keep the reference's per-sample
            # E[-grad] semantics on every backend (incl. the render
            # kernel), so validation products are computed identically
            # whichever mode trained the field.
            point = explicit and self.point_normals and not first_order
            bottleneck = None
            if explicit:
                # Forward + explicit density gradient in one pass: the whole
                # training step stays first-order (models/normals.py). The
                # view-consistency query re-uses the trunk's bottleneck
                # features (below) so it costs only the condition stack.
                want_bn = use_vc_loss and randomized and self.use_viewdirs
                out_dg = self._raw_outputs_density_grad(
                    params, means, covs, rays.viewdirs,
                    want_bottleneck=want_bn, want_grad=not point)
                raw_rgb, raw_density, d_raw_sigma = out_dg[:3]
                if want_bn:
                    bottleneck = out_dg[3]
                raw_sigma, albedos, roughnesses = self._split_heads(
                    raw_density)
                raw_sigma = self._density_noise(
                    raw_sigma, keys[2 * i_level + 1], randomized)
                chroma_s = self._split_chroma(raw_density)
                rgb = self._rgb_from_raw(raw_rgb, chroma_s)
                emission_s = self._split_emission(raw_density)
                if emission_s is not None:
                    rgb = rgb + emission_s
                density = jax.nn.softplus(raw_sigma + self.density_bias)
                # Chain softplus: d(density)/d(means) = sigmoid * d(raw).
                d_means = (None if point else
                           jax.nn.sigmoid(raw_sigma + self.density_bias)
                           * d_raw_sigma)
            else:
                if self.emissive_head and fine:
                    raise NotImplementedError(
                        "emissive_head requires normals_impl='explicit' "
                        "(the vjp path does not expose per-sample emission "
                        "for the surface/sparsity terms)")
                emission_s = None
                chroma_s = None  # make_graph applies the combine internally
                graph = make_graph(covs, rays.viewdirs, keys[2 * i_level + 1],
                                   fused=first_order or not fine_level)
                if fine:
                    (rgb, density, albedos, roughnesses), vjp_fn = jax.vjp(
                        graph, means)
                else:
                    rgb, density, albedos, roughnesses = graph(means)

            comp_rgb, distance, acc, weights = mip.volumetric_rendering(
                rgb, density, t_samples, rays.directions, white_bkgd)
            # Distortion loss (training only): collapses phantom free-space
            # density so secondary (irradiance) rays see real surfaces —
            # a prerequisite for HDR source recovery (NOTES.md HDR study).
            dist_loss = (mip.distortion_loss(t_samples, weights)
                         if randomized else None)

            if not fine:
                ret.append(LevelOutput(rgb=comp_rgb, distance=distance,
                                       acc=acc, dist_loss=dist_loss))
                continue

            if not explicit:
                # --- normals from the density gradient (one shared bwd) ---
                (d_means,) = vjp_fn(
                    (jnp.zeros_like(rgb), jnp.ones_like(density),
                     jnp.zeros_like(albedos), jnp.zeros_like(roughnesses)))
            if point:
                normal, ort_loss = self._point_normal(
                    params, means, covs, rays.viewdirs, weights,
                    rays.directions, use_ort_loss)
                w_norm = weights[..., None] / jnp.sum(
                    weights, axis=-1)[..., None, None]
            else:
                normal, ort_loss, w_norm = self._expected_normals(
                    weights, -d_means, rays.directions, use_ort_loss)

            out = dict(rgb=comp_rgb, distance=distance, acc=acc,
                       dist_loss=dist_loss,
                       ort_loss=ort_loss, normal=normal,
                       roughness=jnp.sum(w_norm[..., 0] * roughnesses[..., 0],
                                         axis=-1))
            if emission_s is not None:
                # Composited self-emission along the primary ray: feeds the
                # sparsity prior (engine/losses.py) and the surface render
                # below (the source's outgoing radiance the reflection-only
                # formulation cannot represent).
                out["emission"] = jnp.sum(weights[..., None] * emission_s,
                                          axis=-2)
            if use_vc_loss and randomized:
                # View-consistency query (round-3 HDR attack): re-evaluate
                # the SAME fine samples under a random view direction and
                # composite with stop-gradient weights. The resulting
                # rgb_alt ties the view-dependent radiance head across
                # directions (engine/losses.py), closing the measured
                # primary-view/env-view decoupling that blocks the
                # irradiance coupling from lifting saturated sources above
                # the tonemap knee (NOTES.md HDR study mechanism 2).
                # First-order subgraph (feeds the loss directly) — may fuse.
                k_vc = jax.random.fold_in(key, 0x5C)
                d_alt = jax.random.normal(k_vc, rays.viewdirs.shape)
                d_alt = mip.safe_normalize(d_alt)
                if bottleneck is not None:
                    # Condition-stack-only re-query on the saved bottleneck:
                    # identical values AND gradients to a full re-eval (the
                    # trunk is the same function of means/covs; gradient
                    # contributions sum by linearity), minus the second
                    # 8x256 trunk XLA could not CSE (measured ~15% of the
                    # train step — NOTES.md round-3). Stacking both dirs
                    # through ONE 2M-row condition matmul measured WORSE
                    # (111.9k vs 117.1k rays/s): the stacked tensor
                    # materializes and breaks fusion windows.
                    raw_rgb_alt = self._view_branch(params, bottleneck,
                                                    d_alt)
                    # chroma is view-independent (density-head channels):
                    # the alternate direction reuses the primary split.
                    chroma_alt = chroma_s
                else:
                    raw_rgb_alt, raw_density_alt = self._raw_outputs(
                        params, means, covs, d_alt, fused=True)
                    chroma_alt = self._split_chroma(raw_density_alt)
                rgb_alt_s = self._rgb_from_raw(raw_rgb_alt, chroma_alt)
                if emission_s is not None:
                    # Emission is view-independent by construction: include
                    # it in both composites so the vc pull acts only on the
                    # view-dependent part.
                    rgb_alt_s = rgb_alt_s + emission_s
                w_sg = jax.lax.stop_gradient(weights)
                rgb_alt = jnp.sum(w_sg[..., None] * rgb_alt_s, axis=-2)
                if white_bkgd:
                    rgb_alt = rgb_alt + (
                        1.0 - jax.lax.stop_gradient(acc)[..., None])
                out["rgb_alt"] = rgb_alt
            if use_scale_distill and randomized:
                # Cross-scale self-distillation query: re-march THIS primary
                # ray with num_env_samples uniform Gaussians — the exact
                # sampling geometry of a secondary irradiance ray (same
                # [near, far] span and count) — and composite. The loss ties
                # it to the fine composite (stop-gradient target), anchoring
                # the blurred-scale field the env queries read to the
                # primary-supervised fine-scale field. Without it that scale
                # is supervised ONLY by the irradiance loss and the
                # optimizer freely paints phantom radiance there (round-3
                # env-scale probe, NOTES.md). First-order subgraph — fused.
                k_sd = jax.random.fold_in(key, 0x5D)
                t_sd, (m_sd, c_sd) = mip.sample_along_rays(
                    k_sd, rays.origins, rays.directions, rays.radii,
                    self.num_env_samples, rays.near, rays.far, randomized,
                    self.disparity)
                sd_graph = make_graph(c_sd, rays.viewdirs, None, fused=True)
                sd_rgb, sd_den, _, _ = sd_graph(m_sd)
                rgb_scale, dist_scale, *_ = mip.volumetric_rendering(
                    sd_rgb, sd_den, t_sd, rays.directions, white_bkgd)
                out["rgb_scale"] = rgb_scale
                out["dist_scale"] = dist_scale
            if enable_surf:
                # Expected albedo along the primary ray.
                albedo = jnp.sum(w_norm * albedos, axis=-2)

                # Collocated surface point (gradient kept through distance,
                # matching detach_dist=False, reference :321-324).
                surf_origins = rays.origins + rays.directions * distance[..., None]

                solid_angle = env_rays.lossmult
                mode = self._env_mode() if randomized else "fixed"
                if mode == "importance":
                    # Importance-sampled irradiance (training): probe the
                    # radiance field over rotated Fibonacci cells, then draw
                    # the D main directions from a bright-cell-concentrated
                    # mixture with exact 1/(D*pdf) weights. Unbiased AND
                    # low-variance at small D — the fixed set has coverage
                    # bias and plain rotation has rectified-noise drift
                    # (NOTES.md HDR study). The probe pass is stop-gradient
                    # and adds Dp x Sp cheap MLP evals (~25% of step FLOPs
                    # at the 16x4 default).
                    env_dirs, solid_angle, k_env = self._importance_dirs(
                        k_env, make_graph, surf_origins, normal,
                        env_rays)
                    lit_t, (lit_means, lit_covs), lit_dirs = (
                        mip.sample_env_rays_hemisphere(
                            k_env, surf_origins, env_dirs,
                            self._env_samples(first_order), env_rays.near,
                            env_rays.far, env_rays.radii, randomized))
                elif mode in ("rotated", "stratified"):
                    # "rotated": per-ray Haar rotation of the set — each
                    # R @ d_i is uniform on the sphere, weight 4pi/D stays;
                    # unbiased at identical MLP cost. "stratified": rotate,
                    # then jitter each direction within its own cell with
                    # overlap-exact weights — same mean, per-stratum
                    # variance only. Eval keeps the fixed set.
                    k_env, k_rot, k_jit = jax.random.split(k_env, 3)
                    env_dirs = jnp.einsum(
                        "...ij,dj->...di",
                        rotation.random_rotations(
                            k_rot, surf_origins.shape[:-1]),
                        env_rays.directions)
                    if mode == "stratified":
                        env_dirs, solid_angle = (
                            mip.stratified_env_directions(k_jit, env_dirs))
                    lit_t, (lit_means, lit_covs), lit_dirs = (
                        mip.sample_env_rays_hemisphere(
                            k_env, surf_origins, env_dirs,
                            self._env_samples(first_order), env_rays.near,
                            env_rays.far, env_rays.radii, randomized))
                else:
                    lit_t, (lit_means, lit_covs), lit_dirs = (
                        mip.sample_env_rays(
                            k_env, surf_origins, env_rays.directions,
                            self._env_samples(first_order), env_rays.near,
                            env_rays.far, env_rays.radii, randomized))

                # Secondary radiance query: [B, D, S, .] — always first-order
                # (its output feeds the loss directly), so may always fuse.
                if (use_tk and self.train_kernel_scope in ("all", "env")
                        and not self.env_resample
                        and self.env_tight_rgb == 0):
                    B, D, S2 = lit_means.shape[:3]
                    re = train_kernel_level(
                        lit_means.reshape(B * D, S2, 3),
                        lit_covs.reshape(B * D, S2, 3),
                        lit_dirs.reshape(B * D, 3),
                        lit_t.reshape(B * D, S2 + 1),
                        lit_dirs.reshape(B * D, 3), False)
                    env_rgb = re["rgb"].reshape(B, D, 3)
                    env_acc = re["acc"].reshape(B, D)
                else:
                    env_graph = make_graph(lit_covs, lit_dirs, None,
                                           fused=True)
                    e_rgb, e_density, _, _ = env_graph(lit_means)
                    env_vr = mip.volumetric_rendering(
                        e_rgb, e_density, lit_t, lit_dirs, white_bkgd=False)
                    env_rgb = env_vr[0]
                    env_acc = env_vr[2]
                    if self.env_tight_rgb > 0 and not self.env_resample:
                        # Blur-dilution fix (BaseNeRF.env_tight_rgb): the
                        # blurred march keeps occlusion/placement, but the
                        # radiance carried to the irradiance integral is
                        # re-read at the same means with fine-scale
                        # covariances — per-channel color evidence stops
                        # being IPE-averaged with the emitter's
                        # surroundings and rides the primary-supervised
                        # scale instead.
                        if self.env_tight_top1:
                            # Dominant-hit chroma (BaseNeRF.env_tight_top1):
                            # the luma-ratio combine below strips magnitude
                            # anyway, so one tight MLP row per direction —
                            # at the blurred march's argmax-weight sample —
                            # carries the whole chroma signal at 1/S the
                            # re-read cost.
                            idx = jnp.argmax(env_vr[3], axis=-1)
                            gather = lambda x: jnp.take_along_axis(
                                x, idx[..., None, None], axis=-2)
                            tight_graph = make_graph(
                                gather(lit_covs) * self.env_tight_rgb,
                                lit_dirs, None, fused=True)
                            t_rgb, _, _, _ = tight_graph(gather(lit_means))
                            tight_read = t_rgb[..., 0, :]
                        elif self.env_tight_topk > 0:
                            # Top-K tight read (BaseNeRF.env_tight_topk):
                            # the K highest-weight samples of the blurred
                            # march, combined with their raw march weights
                            # — exactly the full-S weighted read restricted
                            # to its K largest terms (K = S reproduces it
                            # bitwise up to summation order), at K/S the
                            # re-read rows.
                            w_k, idx = jax.lax.top_k(
                                env_vr[3], self.env_tight_topk)
                            gather = lambda x: jnp.take_along_axis(
                                x, idx[..., None], axis=-2)
                            tight_graph = make_graph(
                                gather(lit_covs) * self.env_tight_rgb,
                                lit_dirs, None, fused=True)
                            t_rgb, _, _, _ = tight_graph(gather(lit_means))
                            tight_read = jnp.sum(
                                w_k[..., None] * t_rgb, axis=-2)
                        elif self.env_tight_weights:
                            # Occlusion fix (BaseNeRF.env_tight_weights):
                            # the whole composite rides the tight scale —
                            # radiance AND transmittance from the tight
                            # re-read, placement from the blurred march.
                            # The tight-scale density is what the primary
                            # views supervise, so a real occluder
                            # terminates the march (the blurred-scale
                            # composite is a measured per-direction fog:
                            # NOTES.md shadow study); no CDF feedback
                            # (the env_resample failure mode).
                            tight_graph = make_graph(
                                lit_covs * self.env_tight_rgb, lit_dirs,
                                None, fused=True)
                            t_rgb, t_den, _, _ = tight_graph(lit_means)
                            tight_read = mip.volumetric_rendering(
                                t_rgb, t_den, lit_t, lit_dirs,
                                white_bkgd=False)[0]
                        else:
                            tight_graph = make_graph(
                                lit_covs * self.env_tight_rgb, lit_dirs,
                                None, fused=True)
                            t_rgb, _, _, _ = tight_graph(lit_means)
                            tight_read = jnp.sum(
                                env_vr[3][..., None] * t_rgb, axis=-2)
                        if self.env_tight_chroma:
                            # Hybrid combine (BaseNeRF.env_tight_chroma):
                            # intensity from the blurred read (the scale
                            # the irradiance loss transmits it at), channel
                            # structure from the tight read (the scale the
                            # primary views supervise). A tight-scale miss
                            # (tight -> 0) degrades to the neutral blurred
                            # read via the eps, not to amplified noise.
                            c = self.env_tight_chroma_eps
                            luma_b = shading.compute_illumination(env_rgb)
                            luma_t = shading.compute_illumination(tight_read)
                            env_rgb = luma_b * (tight_read + c) / (
                                luma_t + c)
                        else:
                            env_rgb = tight_read
                    if self.env_resample:
                        # Two-level irradiance march: the blurred pass above
                        # only PLACES the tight second march that carries the
                        # radiance evidence (BaseNeRF.env_resample).
                        lit_t, (lit_means, lit_covs) = self._resample_env(
                            k_env, surf_origins, lit_dirs, env_rays.radii,
                            lit_t, env_vr[3], randomized)
                        env_graph2 = make_graph(lit_covs, lit_dirs, None,
                                                fused=True)
                        e_rgb2, e_den2, _, _ = env_graph2(lit_means)
                        env_vr2 = mip.volumetric_rendering(
                            e_rgb2, e_den2, lit_t, lit_dirs,
                            white_bkgd=False)
                        env_rgb = env_vr2[0]
                        env_acc = env_vr2[2]

                if self.env_distill_samples > 0 and randomized:
                    # Stochastic per-direction distillation (round-3
                    # occlusion study): the irradiance loss constrains only
                    # the cosine-weighted SUM over D directions, so the
                    # secondary read is free to be a per-direction FOG
                    # (measured: ~0.65 luma along every direction vs GT
                    # 0.17 wall / 8.2 emitter — probe_shadow.py). Pick ONE
                    # random direction per surface point, re-march it with
                    # env_distill_samples finer Gaussians (the scale the
                    # primary views supervise), and expose (read, target)
                    # for a log1p-space tie (loss.env_distill). Unlike
                    # scale_distill (primary rays, knee-bounded target,
                    # measured negative) the target here is exactly the
                    # quantity the integral SHOULD consume. Cost: one
                    # S_fine-row march per point (~1/D of the env
                    # subgraph). Training-only (randomized gates it).
                    k_ed = jax.random.fold_in(key, 0xED)
                    k_sel, k_mar = jax.random.split(k_ed)
                    B, D = lit_dirs.shape[:2]
                    idx = jax.random.randint(k_sel, (B, 1), 0, D)
                    dir_sel = jnp.take_along_axis(
                        lit_dirs, idx[..., None], axis=1)       # [B, 1, 3]
                    read_sel = jnp.take_along_axis(
                        env_rgb, idx[..., None], axis=1)[:, 0]  # [B, 3]
                    one = jnp.ones((1, 1), dtype=surf_origins.dtype)
                    ed_t, (ed_m, ed_c), ed_d = (
                        mip.sample_env_rays_hemisphere(
                            k_mar, surf_origins, dir_sel,
                            self.env_distill_samples,
                            one * env_rays.near[0, 0],
                            one * env_rays.far[0, 0],
                            one * env_rays.radii[0, 0], randomized))
                    ed_graph = make_graph(ed_c, ed_d, None, fused=True)
                    ed_rgb, ed_den, _, _ = ed_graph(ed_m)
                    ed_vr = mip.volumetric_rendering(
                        ed_rgb, ed_den, ed_t, ed_d, white_bkgd=False)
                    out["env_read"] = read_sel
                    out["env_fine"] = jax.lax.stop_gradient(ed_vr[0][:, 0])
                    # Transmittance half of the per-direction tie (round-5
                    # occlusion attack #13, loss.env_distill_acc): the
                    # radiance tie alone leaves the re-formed wall fog in
                    # the blurred march's OPACITY — expose the same
                    # direction's blurred acc and its fine-march target.
                    out["env_read_acc"] = jnp.take_along_axis(
                        env_acc, idx, axis=1)[:, 0]
                    out["env_fine_acc"] = jax.lax.stop_gradient(
                        ed_vr[2][:, 0])

                if self.illum_field:
                    # Spatially-varying illuminant re-tint (BaseNeRF.
                    # illum_field): applied AFTER the env_distill read
                    # extraction so the distill keeps supervising the
                    # radiance field itself, and BEFORE surface_rendering
                    # so the irradiance integral — the field's only
                    # supervisor — consumes the re-tinted read.
                    env_rgb = self._apply_illum(params, env_rgb,
                                                surf_origins, lit_dirs)
                surf_rgb, diffuse, _, shade = shading.surface_rendering(
                    env_rgb, albedo, normal, None, lit_dirs, rays.viewdirs,
                    solid_angle)
                if emission_s is not None:
                    # Outgoing = self-emission + reflected irradiance: the
                    # emitter's pixels become explainable by the surface
                    # loss instead of spuriously inflating albedo/shading.
                    surf_rgb = surf_rgb + out["emission"]
                out.update(albedo=albedo, surf_rgb=surf_rgb, diffuse=diffuse,
                           shading=shade)
            ret.append(LevelOutput(**out))
        return ret
