"""Whole-level fused render kernel parity (kernels/fused_render.py).

Compares `PanoMipNeRF._render_fused` (IPE + MLP + in-kernel alpha
compositing + normal/albedo expectations, per-ray outputs) against the
standard XLA eval path on identical inputs at randomized=False. Runs in
Pallas interpret mode on the CPU suite; the same comparison compiles on
TPU (PANO_NERF_TEST_TPU=1).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_rays

from pano_nerf_tpu.data.pano_dataset import generate_lit_rays
from pano_nerf_tpu.models.pano_mip_nerf import PanoMipNeRF


def xla_baseline(model):
    """A copy whose first-order calls CANNOT dispatch into any kernel, so
    the parity tests compare kernel vs genuine XLA on every backend (on
    TPU the plain model would re-dispatch into _render_fused itself)."""
    return dataclasses.replace(model, use_render_kernel=False,
                               use_fused_kernel_eval=False,
                               use_fused_kernel=False)


@pytest.fixture()
def interpret(monkeypatch):
    if jax.default_backend() not in ("tpu", "axon"):
        monkeypatch.setenv("PANO_NERF_PALLAS_INTERPRET", "1")


@pytest.fixture(scope="module")
def setup():
    model = PanoMipNeRF(num_samples=8, num_env_samples=4,
                        compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    env = jax.tree.map(jnp.asarray, generate_lit_rays(num=4, far=10.0))
    rays = make_rays(12, key=5)
    return model, params, env, rays


class TestRenderKernelParity:
    def test_full_level_outputs_match_standard_path(self, interpret, setup):
        model, params, env, rays = setup
        k = jax.random.PRNGKey(3)
        std = xla_baseline(model)(
            params, k, rays, env, randomized=False,
            white_bkgd=False, enable_surf=True, use_ort_loss=False,
            first_order=True)
        fused = model._render_fused(params, k, rays, env, randomized=False,
                                    white_bkgd=False, enable_surf=True)
        assert len(fused) == len(std)
        for lvl, (f, s) in enumerate(zip(fused, std)):
            np.testing.assert_allclose(
                np.asarray(f.rgb), np.asarray(s.rgb), rtol=0, atol=2e-2,
                err_msg=f"rgb level {lvl}")
            np.testing.assert_allclose(
                np.asarray(f.distance), np.asarray(s.distance), atol=2e-2,
                err_msg=f"distance level {lvl}")
            np.testing.assert_allclose(
                np.asarray(f.acc), np.asarray(s.acc), atol=1e-2,
                err_msg=f"acc level {lvl}")
        f, s = fused[-1], std[-1]
        # Normals are unit vectors; compare by angle. At random init some
        # rays' density gradients are noise-dominated (direction of a
        # near-zero vector is bf16-sensitive), so bound the distribution
        # rather than the worst ray.
        cos = np.sum(np.asarray(f.normal) * np.asarray(s.normal), -1)
        assert np.median(cos) > 0.998, np.median(cos)
        assert np.all(cos > 0.85), cos.min()
        np.testing.assert_allclose(np.asarray(f.albedo),
                                   np.asarray(s.albedo), atol=2e-2)
        np.testing.assert_allclose(np.asarray(f.roughness),
                                   np.asarray(s.roughness), atol=2e-2)
        # surf/shading integrate relu(N.L): restrict to rays whose normals
        # agree (the noise-dominated ones diverge by construction).
        ok = cos > 0.99
        assert ok.sum() >= len(cos) - 3
        np.testing.assert_allclose(np.asarray(f.surf_rgb)[ok],
                                   np.asarray(s.surf_rgb)[ok], rtol=0.1,
                                   atol=3e-2)
        np.testing.assert_allclose(np.asarray(f.shading)[ok],
                                   np.asarray(s.shading)[ok], rtol=0.1,
                                   atol=3e-2)

    def test_ort_loss_matches_standard_path(self, interpret, setup):
        """use_ort_loss=True through the render kernel reproduces the
        standard-path orientation loss (VERDICT r2 #7).

        Compared on IDENTICAL fine samples: at random init many rays'
        normals are noise-dominated, and relu(n.d)^2 chaotically amplifies
        the ~1e-4 resampling shift between the kernel and XLA coarse
        weights, so an end-to-end scalar comparison is meaningless (other
        outputs match; see the distribution-bounded checks above)."""
        from pano_nerf_tpu.kernels.fused_render import fused_render_level
        from pano_nerf_tpu.ops import mip
        model, params, env, rays = setup
        k = jax.random.PRNGKey(3)
        keys = jax.random.split(k, 5)
        t0, (m0, c0) = model._sample_level(keys[0], rays, 0, None, None,
                                           False)
        r0 = fused_render_level(
            params, m0, c0, rays.viewdirs, t0, rays.directions, 5,
            model.min_deg_point, model.max_deg_point, model.deg_view,
            model.density_bias, model.rgb_padding, False, False, False)
        t1, (m1, c1) = model._sample_level(keys[2], rays, 1, t0,
                                           r0["weights"], False)
        r1 = fused_render_level(
            params, m1, c1, rays.viewdirs, t1, rays.directions, 5,
            model.min_deg_point, model.max_deg_point, model.deg_view,
            model.density_bias, model.rgb_padding, False, True, True)
        # Standard-path ort on the SAME samples.
        base = xla_baseline(model)
        raw_rgb, raw_density, d_raw = base._raw_outputs_density_grad(
            params, m1, c1, rays.viewdirs)
        raw_sigma, _, _ = base._split_heads(raw_density)
        density = jax.nn.softplus(raw_sigma + base.density_bias)
        rgb = jax.nn.softplus(raw_rgb)
        d_means = jax.nn.sigmoid(raw_sigma + base.density_bias) * d_raw
        _, _, _, w = mip.volumetric_rendering(rgb, density, t1,
                                              rays.directions, False)
        _, ort_std, _ = base._expected_normals(w, -d_means, rays.directions,
                                               use_ort_loss=True)
        ort_kernel = float(jnp.mean(r1["ort"]))
        np.testing.assert_allclose(ort_kernel, float(ort_std), rtol=0.03,
                                   atol=1e-3)
        # Plumbing: _render_fused surfaces the scalar when requested.
        fused = model._render_fused(params, k, rays, env, randomized=False,
                                    white_bkgd=False, enable_surf=False,
                                    use_ort_loss=True)
        assert fused[-1].ort_loss is not None
        assert np.isfinite(float(fused[-1].ort_loss))

    def test_dispatch_falls_back_for_unsupported_combos(self, setup):
        """randomized + non-fixed env sampling must NOT take the render
        kernel (it would silently use the fixed env set)."""
        model, params, env, rays = setup
        rotated = dataclasses.replace(model, env_sampling="rotated")
        called = []
        orig = PanoMipNeRF._render_fused

        def spy(self, *a, **kw):
            called.append(True)
            return orig(self, *a, **kw)

        try:
            PanoMipNeRF._render_fused = spy
            rotated(params, jax.random.PRNGKey(0), rays, env,
                    randomized=True, white_bkgd=False, enable_surf=False,
                    use_ort_loss=False, first_order=True)
            assert not called  # fell back to the standard path
            rotated(params, jax.random.PRNGKey(0), rays, env,
                    randomized=False, white_bkgd=False, enable_surf=False,
                    use_ort_loss=False, first_order=True)
            if jax.default_backend() in ("tpu", "axon"):
                # Deterministic calls keep riding the kernel.
                assert called
        finally:
            PanoMipNeRF._render_fused = orig

    def test_white_bkgd_composites(self, interpret, setup):
        model, params, env, rays = setup
        k = jax.random.PRNGKey(3)
        fw = model._render_fused(params, k, rays, env, randomized=False,
                                 white_bkgd=True, enable_surf=False)
        fb = model._render_fused(params, k, rays, env, randomized=False,
                                 white_bkgd=False, enable_surf=False)
        want = np.asarray(fb[-1].rgb) + (1 - np.asarray(fb[-1].acc))[:, None]
        np.testing.assert_allclose(np.asarray(fw[-1].rgb), want, atol=1e-5)

    def test_weights_feed_resampling(self, interpret, setup):
        """Coarse weights from the kernel must match the standard path —
        they shape the fine level's sample distribution."""
        model, params, env, rays = setup
        k = jax.random.PRNGKey(3)
        std = xla_baseline(model)(
            params, k, rays, env, randomized=False,
            white_bkgd=False, enable_surf=False,
            use_ort_loss=False, first_order=True)
        fused = model._render_fused(params, k, rays, env,
                                    randomized=False, white_bkgd=False,
                                    enable_surf=False)
        # Fine-level outputs agree => the coarse weights driving the
        # resampling agreed too (resampling is deterministic here).
        np.testing.assert_allclose(np.asarray(fused[-1].distance),
                                   np.asarray(std[-1].distance), atol=2e-2)


class TestBlocking:
    @pytest.mark.parametrize("S,expect_mult", [(64, 8), (10, 8), (4, 8),
                                               (5, 8), (128, 8)])
    def test_rays_per_block_rows_aligned(self, S, expect_mult):
        from pano_nerf_tpu.kernels.fused_render import rays_per_block
        rpb = rays_per_block(S)
        assert rpb >= 1 and (rpb * S) % expect_mult == 0
