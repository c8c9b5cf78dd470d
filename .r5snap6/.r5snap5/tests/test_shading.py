"""Tests for shading ops: BRDFs, irradiance integration, tonemap, solid angles."""

import jax
import jax.numpy as jnp
import numpy as np

from pano_nerf_tpu.ops import shading


def fibonacci_sphere(n):
    """Golden-spiral directions (same construction as the env-ray generator)."""
    i = np.arange(n)
    phi = np.pi * (3.0 - np.sqrt(5.0))
    y = 1 - (i / (n - 1)) * 2
    radius = np.sqrt(1 - y * y)
    theta = phi * i
    return np.stack([np.cos(theta) * radius, y, np.sin(theta) * radius], -1)


class TestSolidAngle:
    def test_sums_to_sphere(self):
        # Midpoint rule over sin(phi) slightly overshoots: ~0.4% at h=16.
        sa = shading.solid_angle_refinement(16, 32)
        np.testing.assert_allclose(sa.sum(), 4 * np.pi, rtol=5e-3)
        sa = shading.solid_angle_refinement(64, 128)
        np.testing.assert_allclose(sa.sum(), 4 * np.pi, rtol=3e-4)

    def test_hemisphere(self):
        sa = shading.solid_angle_refinement(16, 32, hemisp=True)
        np.testing.assert_allclose(sa.sum(), 2 * np.pi, rtol=5e-3)


class TestLambertian:
    def test_uniform_env_irradiance(self):
        """Uniform unit radiance over the sphere: shading -> pi * L,
        diffuse -> albedo/pi * pi * L = albedo * L."""
        n = 2000
        dirs = fibonacci_sphere(n).astype(np.float32)
        env = jnp.ones((1, n, 3))
        albedo = jnp.asarray([[0.6, 0.4, 0.2]])
        normal = jnp.asarray([[0.0, 1.0, 0.0]])
        sa = jnp.full((1, n, 1), 4 * np.pi / n)
        rgb, diffuse, spec, shade = shading.surface_rendering(
            env, albedo, normal, None, jnp.asarray(dirs)[None], None, sa)
        np.testing.assert_allclose(np.asarray(shade)[0], np.pi, rtol=2e-2)
        np.testing.assert_allclose(np.asarray(diffuse)[0],
                                   np.asarray(albedo)[0], rtol=2e-2)
        np.testing.assert_allclose(np.asarray(spec), 0.0)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(diffuse))

    def test_nol_clamped(self):
        """Light from below the surface contributes nothing."""
        env = jnp.ones((1, 1, 3)) * 5.0
        albedo = jnp.full((1, 3), 0.5)
        normal = jnp.asarray([[0.0, 1.0, 0.0]])
        l = jnp.asarray([[[0.0, -1.0, 0.0]]])
        sa = jnp.ones((1, 1, 1))
        rgb, *_ = shading.surface_rendering(env, albedo, normal, None, l,
                                            None, sa)
        np.testing.assert_allclose(np.asarray(rgb), 0.0, atol=1e-7)


class TestMicrofacet:
    def test_energy_finite_and_nonnegative(self):
        key = jax.random.PRNGKey(0)
        B, D = 4, 16
        n = jax.random.normal(key, (B, 3))
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        l = jax.random.normal(key, (B, D, 3))
        l = l / jnp.linalg.norm(l, axis=-1, keepdims=True)
        v = -n
        alb = jnp.full((B, 3), 0.5)
        rough = jnp.full((B, 1), 0.3)
        d, s, NoL = shading.microfacet_brdf(alb, n, rough, l, v)
        assert np.isfinite(np.asarray(s)).all()
        assert (np.asarray(s) >= 0).all()
        assert (np.asarray(NoL) >= 0).all()

    def test_grazing_zero_denominator_no_nan(self):
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        l = jnp.asarray([[[1.0, 0.0, 0.0]]])  # NoL = 0 exactly
        v = jnp.asarray([[0.0, 1.0, 0.0]])
        d, s, NoL = shading.microfacet_brdf(
            jnp.full((1, 3), 0.5), n, jnp.full((1, 1), 0.5), l, v)
        assert np.isfinite(np.asarray(s)).all()


class TestTonemap:
    def test_aces_formula(self):
        x = np.asarray([0.0, 0.18, 1.0, 5.0, 100.0], np.float32)
        got = shading.hdr_to_ldr(x)
        aces = (x * (2.51 * x + 0.03)) / (x * (2.43 * x + 0.59) + 0.14)
        expect = np.clip(aces, 0, 1) ** (1 / 2.2)
        np.testing.assert_allclose(got, expect, atol=1e-6)

    def test_hdr_compresses_into_unit_range(self):
        x = jnp.asarray([1e3, 1e4])
        y = np.asarray(shading.hdr_to_ldr(x))
        assert (y <= 1.0 + 1e-6).all()

    def test_quantize_255_levels(self):
        x = np.linspace(0, 1.2, 1000).astype(np.float32)
        y = shading.hdr_to_ldr(x, quantize=True)
        levels = np.unique(np.round(y ** 2.2 * 255).astype(int))
        assert levels.max() <= 255
        # Quantized gamma-space values come from the 256-level lattice.
        y_pre_gamma = y ** 2.2
        np.testing.assert_allclose(y_pre_gamma * 255,
                                   np.round(y_pre_gamma * 255), atol=1e-3)

    def test_jnp_and_np_agree(self):
        x = np.asarray([0.1, 0.5, 2.0], np.float32)
        a = np.asarray(shading.hdr_to_ldr(jnp.asarray(x)))
        b = shading.hdr_to_ldr(x)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_gradient_finite_at_zero(self):
        g = jax.grad(lambda x: shading.hdr_to_ldr(x).sum())(jnp.zeros((3,)))
        assert np.isfinite(np.asarray(g)).all()


class TestIllumination:
    def test_rec709_luma(self):
        x = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 0.0, 0.0]])
        y = np.asarray(shading.compute_illumination(x))
        np.testing.assert_allclose(y[0], 1.0, rtol=1e-5)
        np.testing.assert_allclose(y[1], 0.2126, rtol=1e-5)
