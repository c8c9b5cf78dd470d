"""Tests for the extended op surface: mip-360 ops, lighting-composing
variant, extended shading variants, schedule, losses."""

import jax
import jax.numpy as jnp
import numpy as np

from pano_nerf_tpu.engine.losses import (chromaticity_loss, masked_mse,
                                         thin_surface)
from pano_nerf_tpu.engine.schedule import mip_lr_decay
from pano_nerf_tpu.ops import mip, shading


class TestMip360:
    def test_contract_inside_unit_ball_identity_via_parameterization(self):
        m = jnp.asarray([[[0.1, 0.2, 0.3]]])
        c = jnp.broadcast_to(jnp.eye(3) * 0.01, (1, 1, 3, 3))
        nm, nc = mip.parameterization(m, c)
        np.testing.assert_allclose(np.asarray(nm), np.asarray(m), atol=1e-7)
        np.testing.assert_allclose(np.asarray(nc), np.asarray(c), atol=1e-7)

    def test_contract_maps_into_radius_2(self):
        rng = np.random.default_rng(0)
        m = jnp.asarray(rng.standard_normal((64, 3)).astype(np.float32) * 10)
        out = np.linalg.norm(np.asarray(mip.contract(m)), axis=-1)
        assert (out < 2.0 + 1e-5).all()

    def test_contract_preserves_direction(self):
        m = jnp.asarray([[3.0, 4.0, 0.0]])
        out = np.asarray(mip.contract(m))[0]
        np.testing.assert_allclose(out / np.linalg.norm(out), [0.6, 0.8, 0.0],
                                   atol=1e-6)

    def test_ipe360_shape_and_attenuation(self):
        m = jnp.asarray([[[0.3, 0.1, 0.2]]])
        c_small = jnp.broadcast_to(jnp.eye(3) * 1e-6, (1, 1, 3, 3))
        c_big = jnp.broadcast_to(jnp.eye(3) * 25.0, (1, 1, 3, 3))
        e_small = np.abs(np.asarray(mip.integrated_pos_enc_360(m, c_small)))
        e_big = np.abs(np.asarray(mip.integrated_pos_enc_360(m, c_big)))
        assert e_small.shape == (1, 1, 42)
        assert e_big.max() < e_small.max()

    def test_sample_360_inverse_depth(self):
        key = jax.random.PRNGKey(0)
        t_inv, (means, covs) = mip.sample_along_rays_360(
            key, jnp.zeros((2, 3)), jnp.asarray([[0.0, 0.0, 1.0]] * 2),
            jnp.full((2, 1), 0.01), 8, jnp.full((2, 1), 1.0),
            jnp.full((2, 1), 16.0), randomized=False)
        # Non-randomized t_inv spans [1/near, 1/far] linearly.
        np.testing.assert_allclose(np.asarray(t_inv[0, 0]), 1.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(t_inv[0, -1]), 1 / 16, rtol=1e-5)
        assert covs.shape == (2, 8, 3, 3)


class TestLightingComposing:
    def test_attenuation_reduces_radiance(self):
        t = jnp.tile(jnp.linspace(1.0, 3.0, 9), (1, 1))
        rgb = jnp.ones((1, 8, 3))
        density = jnp.full((1, 8, 1), 5.0)
        dirs = jnp.asarray([[0.0, 0.0, 1.0]])
        plain, *_ = mip.volumetric_rendering(rgb, density, t, dirs, False)
        atten, *_ = mip.volumetric_lighting_composing(rgb, density, t, dirs,
                                                      False)
        assert (np.asarray(atten) < np.asarray(plain)).all()
        # At t ~= 1, attenuation 1/(1+t^2) ~= 1/2.
        np.testing.assert_allclose(np.asarray(atten) / np.asarray(plain),
                                   0.5, atol=0.1)


class TestShadingVariants:
    def test_wlit_matches_single_env(self):
        """K=1 env with weight 1 must reduce to plain surface_rendering."""
        rng = np.random.default_rng(0)
        B, D = 4, 16
        env = jnp.asarray(rng.uniform(0, 2, (B, D, 3)).astype(np.float32))
        alb = jnp.full((B, 3), 0.4)
        nor = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (B, 1))
        l = rng.standard_normal((B, D, 3)).astype(np.float32)
        l = jnp.asarray(l / np.linalg.norm(l, axis=-1, keepdims=True))
        sa = jnp.full((D, 1), 4 * np.pi / D)
        rgb0, dif0, _, sh0 = shading.surface_rendering(env, alb, nor, None, l,
                                                       None, sa)
        rgb1, dif1, _, sh1 = shading.surface_rendering_wlit(
            env[:, None], jnp.ones((B, 1)), alb, nor, None, l, None, sa)
        np.testing.assert_allclose(np.asarray(dif0), np.asarray(dif1),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sh0), np.asarray(sh1), rtol=1e-5)

    def test_hemi_uniform_env(self):
        B, K, D = 2, 1, 64
        env = jnp.ones((B, K, D, 3))
        NoL = jnp.full((D, 1), 0.5)
        sa = jnp.full((D, 1), 2 * np.pi / D)
        rgb, dif, spec, sh = shading.surface_rendering_hemi(
            env, jnp.ones((B, K)), jnp.full((B, 3), np.pi), NoL, sa)
        np.testing.assert_allclose(np.asarray(sh), np.pi, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dif), np.pi, rtol=1e-4)

    def test_point_lit_inverse_square(self):
        """Moving a point light 2x farther quarters its steradian."""
        lit = jnp.asarray([[1.0, 1.0, 1.0, 0.0, 1.0, 0.0, 2.0, 0.1]])
        pos_near = jnp.asarray([[0.0, 0.0, 0.0]])
        pos_far = jnp.asarray([[0.0, -2.0, 0.0]])
        wrapped_n = shading.wrap_sg_lit(lit, pos_near)
        wrapped_f = shading.wrap_sg_lit(lit, pos_far)
        np.testing.assert_allclose(
            float(wrapped_f[0, 0, 7] / wrapped_n[0, 0, 7]), 0.25, rtol=1e-3)

    def test_blinn_phong_finite(self):
        B, D = 3, 8
        rng = np.random.default_rng(0)
        n = rng.standard_normal((B, 3))
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        l = rng.standard_normal((B, D, 3))
        l /= np.linalg.norm(l, axis=-1, keepdims=True)
        d, s, NoL = shading.blinn_phong_brdf(
            jnp.full((B, 3), 0.5), jnp.asarray(n.astype(np.float32)),
            jnp.full((B, 1), 8.0), jnp.asarray(l.astype(np.float32)),
            jnp.asarray(-n.astype(np.float32)))
        assert np.isfinite(np.asarray(s)).all()


class TestSchedule:
    def test_endpoints(self):
        sched = mip_lr_decay(2e-4, 2e-5, 1000, 0, 1.0)
        np.testing.assert_allclose(float(sched(0)), 2e-4, rtol=1e-6)
        np.testing.assert_allclose(float(sched(1000)), 2e-5, rtol=1e-6)

    def test_log_linear_midpoint(self):
        sched = mip_lr_decay(1e-2, 1e-4, 100, 0, 1.0)
        np.testing.assert_allclose(float(sched(50)), 1e-3, rtol=1e-5)

    def test_warmup(self):
        sched = mip_lr_decay(2e-4, 2e-5, 44000, 120, 0.01)
        assert float(sched(0)) < 2e-4 * 0.011
        np.testing.assert_allclose(float(sched(120)), 2e-4 * np.exp(
            np.log(2e-4 / 2e-4) * 0) * (2e-5 / 2e-4) ** (120 / 44000),
            rtol=1e-4)
        assert float(sched(119)) < float(sched(120)) + 1e-9


class TestLossHelpers:
    def test_masked_mse_ignores_masked(self):
        pred = jnp.asarray([[1.0, 1.0, 1.0], [9.0, 9.0, 9.0]])
        gt = jnp.zeros((2, 3))
        mask = jnp.asarray([[1.0], [0.0]])
        np.testing.assert_allclose(float(masked_mse(pred, gt, mask)), 3.0,
                                   rtol=1e-6)

    def test_chromaticity_invariant_to_scale(self):
        rng = np.random.default_rng(0)
        a = jnp.asarray(np.abs(rng.standard_normal((8, 3))).astype(np.float32))
        loss = chromaticity_loss(a, a * 7.0)
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-10)

    def test_thin_surface(self):
        n = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
        d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])
        w = jnp.ones((2,))
        out = np.asarray(thin_surface(n, d, w))
        np.testing.assert_allclose(out[:, 0], [1.0, 0.0], atol=1e-7)
