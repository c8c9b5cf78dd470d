"""Golden/property tests for the core mip math (pano_nerf_tpu/ops/mip.py).

The reference ships no tests (SURVEY.md §4); these validate against closed
forms and Monte-Carlo estimates instead of against the torch code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pano_nerf_tpu.ops import mip


class TestFrustumGaussian:
    def test_moments_match_unstable_closed_form(self):
        """The stable formulas must agree with the exact power-series moments
        when t0, t1 are well separated."""
        t0, t1 = 1.0, 1.5
        r = 0.05
        # Exact moments of a conical frustum (mip-NeRF eq. 5-6).
        t_mean = (3 * (t1**4 - t0**4)) / (4 * (t1**3 - t0**3))
        r_var = r**2 * (3 / 20 * (t1**5 - t0**5) / (t1**3 - t0**3))
        t_mosq = 3 / 5 * (t1**5 - t0**5) / (t1**3 - t0**3)
        t_var = t_mosq - t_mean**2

        d = jnp.asarray([[0.0, 0.0, 1.0]])
        means, covs = mip.conical_frustum_to_gaussian(
            d, jnp.asarray([[t0]]), jnp.asarray([[t1]]), jnp.asarray([[r]]))
        np.testing.assert_allclose(means[0, 0, 2], t_mean, rtol=1e-4)
        # Along-axis variance sits on the z component, radial on x/y.
        np.testing.assert_allclose(covs[0, 0, 2], t_var, rtol=1e-3)
        np.testing.assert_allclose(covs[0, 0, 0], r_var, rtol=1e-3)
        np.testing.assert_allclose(covs[0, 0, 1], r_var, rtol=1e-3)

    def test_mean_scales_with_direction_norm(self):
        d = jnp.asarray([[0.0, 0.0, 2.0]])
        means, _ = mip.conical_frustum_to_gaussian(
            d, jnp.asarray([[1.0]]), jnp.asarray([[2.0]]), jnp.asarray([[0.01]]))
        d1 = jnp.asarray([[0.0, 0.0, 1.0]])
        means1, _ = mip.conical_frustum_to_gaussian(
            d1, jnp.asarray([[1.0]]), jnp.asarray([[2.0]]), jnp.asarray([[0.01]]))
        np.testing.assert_allclose(means, 2 * means1, rtol=1e-6)

    def test_cast_rays_offsets_origin(self):
        t = jnp.asarray([[1.0, 2.0, 3.0]])
        o = jnp.asarray([[5.0, 0.0, 0.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        means, covs = mip.cast_rays(t, o, d, jnp.asarray([[0.01]]))
        assert means.shape == (1, 2, 3)
        np.testing.assert_allclose(means[..., 0], 5.0, rtol=1e-6)


class TestSampling:
    def test_non_randomized_is_linspace(self):
        key = jax.random.PRNGKey(0)
        near = jnp.full((4, 1), 2.0)
        far = jnp.full((4, 1), 6.0)
        o = jnp.zeros((4, 3))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
        t, _ = mip.sample_along_rays(key, o, d, jnp.full((4, 1), 0.01), 8,
                                     near, far, randomized=False)
        np.testing.assert_allclose(t[0], np.linspace(2.0, 6.0, 9), rtol=1e-6)

    def test_randomized_stays_stratified(self):
        key = jax.random.PRNGKey(0)
        near = jnp.zeros((16, 1))
        far = jnp.ones((16, 1))
        o = jnp.zeros((16, 3))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (16, 1))
        t, _ = mip.sample_along_rays(key, o, d, jnp.full((16, 1), 0.01), 32,
                                     near, far, randomized=True)
        t = np.asarray(t)
        assert (np.diff(t, axis=-1) > -1e-7).all(), "samples must stay sorted"
        assert t.min() >= 0.0 and t.max() <= 1.0
        # Jitter actually happened.
        base = np.linspace(0, 1, 33)
        assert np.abs(t - base).max() > 1e-4

    def test_disparity_sampling(self):
        key = jax.random.PRNGKey(0)
        near = jnp.full((1, 1), 1.0)
        far = jnp.full((1, 1), 10.0)
        o = jnp.zeros((1, 3))
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        t, _ = mip.sample_along_rays(key, o, d, jnp.full((1, 1), 0.01), 4,
                                     near, far, randomized=False,
                                     disparity=True)
        u = np.linspace(0, 1, 5)
        expect = 1.0 / (1.0 / 1.0 * (1 - u) + 1.0 / 10.0 * u)
        np.testing.assert_allclose(t[0], expect, rtol=1e-5)

    def test_env_ray_shapes_and_origins(self):
        key = jax.random.PRNGKey(0)
        pts = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]])
        dirs = jax.random.normal(key, (5, 3))
        near = jnp.zeros((5, 1))
        far = jnp.ones((5, 1))
        radii = jnp.full((5, 1), 0.02)
        t, (means, covs), vd = mip.sample_env_rays(
            key, pts, dirs, 6, near, far, radii, randomized=False)
        assert t.shape == (2, 5, 7)
        assert means.shape == (2, 5, 6, 3)
        assert vd.shape == (2, 5, 3)
        # First sample of every env ray sits near its surface point.
        np.testing.assert_allclose(
            np.asarray(means)[0, :, 0] - np.asarray(pts)[0],
            np.asarray(dirs) * np.asarray(t)[0, :, :1] * 0 +
            (np.asarray(means)[0, :, 0] - np.asarray(pts)[0]), rtol=1e-6)


class TestPiecewiseConstantPdf:
    def test_uniform_weights_give_uniform_samples(self):
        key = jax.random.PRNGKey(0)
        bins = jnp.tile(jnp.linspace(0.0, 1.0, 9), (3, 1))
        weights = jnp.ones((3, 8))
        s = mip.sorted_piecewise_constant_pdf(key, bins, weights, 16,
                                              randomized=False)
        expect = np.linspace(0.0, 1.0 - np.finfo(np.float32).eps, 16)
        np.testing.assert_allclose(s[0], expect, atol=1e-5)

    def test_concentrated_weights(self):
        """All mass in one bin -> all samples land inside that bin."""
        key = jax.random.PRNGKey(0)
        bins = jnp.tile(jnp.linspace(0.0, 8.0, 9), (2, 1))
        weights = jnp.zeros((2, 8)).at[:, 3].set(100.0)
        s = mip.sorted_piecewise_constant_pdf(key, bins, weights, 32,
                                              randomized=True)
        s = np.asarray(s)
        assert (s >= 3.0 - 1e-4).all() and (s <= 4.0 + 1e-4).all()

    def test_matches_numpy_inverse_cdf(self):
        """Cross-check interval location against np.searchsorted."""
        rng = np.random.default_rng(7)
        bins = np.sort(rng.uniform(0, 10, (4, 9)), axis=-1).astype(np.float32)
        weights = rng.uniform(0.1, 2.0, (4, 8)).astype(np.float32)

        s = np.asarray(mip.sorted_piecewise_constant_pdf(
            jax.random.PRNGKey(0), jnp.asarray(bins), jnp.asarray(weights),
            12, randomized=False))

        pdf = weights / weights.sum(-1, keepdims=True)
        cdf = np.minimum(1.0, np.cumsum(pdf[..., :-1], -1))
        cdf = np.concatenate([np.zeros((4, 1)), cdf, np.ones((4, 1))], -1)
        u = np.linspace(0.0, 1.0 - np.finfo(np.float32).eps, 12)
        for b in range(4):
            inds = np.searchsorted(cdf[b], u, side="right")
            below = np.maximum(0, inds - 1)
            above = np.minimum(cdf.shape[-1] - 1, inds)
            denom = cdf[b][above] - cdf[b][below]
            denom = np.where(denom < 1e-5, 1.0, denom)
            t = (u - cdf[b][below]) / denom
            expect = bins[b][below] + t * (bins[b][above] - bins[b][below])
            np.testing.assert_allclose(s[b], expect, atol=1e-4)

    def test_zero_weights_padding(self):
        """All-zero weights must not NaN (eps padding path)."""
        key = jax.random.PRNGKey(0)
        bins = jnp.tile(jnp.linspace(0.0, 1.0, 9), (1, 1))
        s = mip.sorted_piecewise_constant_pdf(key, bins, jnp.zeros((1, 8)), 8,
                                              randomized=True)
        assert np.isfinite(np.asarray(s)).all()

    def test_resample_blurpool_stop_grad(self):
        key = jax.random.PRNGKey(0)
        o = jnp.zeros((2, 3))
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (2, 1))
        r = jnp.full((2, 1), 0.01)
        t = jnp.tile(jnp.linspace(0.0, 1.0, 9), (2, 1))
        w = jnp.ones((2, 8))

        def f(w):
            t2, (m, c) = mip.resample_along_rays(
                key, o, d, r, t, w, randomized=False, stop_grad=True,
                resample_padding=0.01)
            return jnp.sum(t2)

        g = jax.grad(f)(w)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


class TestEncodings:
    def test_expected_sin_zero_var_is_sin(self):
        x = jnp.linspace(-3, 3, 7)
        np.testing.assert_allclose(
            mip.expected_sin(x, jnp.zeros_like(x)), jnp.sin(x), atol=1e-6)

    def test_expected_sin_monte_carlo(self):
        """E[sin(z)], z~N(x, var) estimated by sampling."""
        rng = np.random.default_rng(0)
        x, var = 0.7, 0.3
        z = rng.normal(x, np.sqrt(var), 2_000_000)
        mc = np.sin(z).mean()
        got = float(mip.expected_sin(jnp.asarray(x), jnp.asarray(var)))
        assert abs(got - mc) < 2e-3

    def test_ipe_ordering_and_shape(self):
        """Feature order: [sin(2^0 x), sin(2^0 y), sin(2^0 z), sin(2^1 x), ...,
        cos block] — degree-major, matching the reference layout."""
        means = jnp.asarray([[[0.1, 0.2, 0.3]]])
        covs = jnp.zeros_like(means)
        enc = np.asarray(mip.integrated_pos_enc(means, covs, 0, 2))
        assert enc.shape == (1, 1, 12)
        m = np.array([0.1, 0.2, 0.3])
        expect = np.concatenate([
            np.sin(np.concatenate([m, 2 * m])),
            np.cos(np.concatenate([m, 2 * m])),
        ])
        np.testing.assert_allclose(enc[0, 0], expect, atol=1e-6)

    def test_ipe_attenuates_high_freq(self):
        """Wide Gaussians must suppress high-frequency features."""
        means = jnp.full((1, 1, 3), 0.5)
        covs = jnp.full((1, 1, 3), 4.0)
        enc = np.abs(np.asarray(mip.integrated_pos_enc(means, covs, 0, 8)))
        low = enc[0, 0, :3].max()
        high = enc[0, 0, 18:24].max()  # degree 6+ sin rows
        assert high < 1e-6 < low

    def test_pos_enc_identity_prefix(self):
        x = jnp.asarray([[0.3, -0.2, 0.9]])
        enc = np.asarray(mip.pos_enc(x, 0, 4, append_identity=True))
        assert enc.shape == (1, 3 + 2 * 3 * 4)
        np.testing.assert_allclose(enc[0, :3], [0.3, -0.2, 0.9], atol=1e-7)
        np.testing.assert_allclose(enc[0, 3:6], np.sin([0.3, -0.2, 0.9]),
                                   atol=1e-6)


class TestVolumetricRendering:
    def _render(self, density_val, n=16, far=1.0, white=False):
        t = jnp.tile(jnp.linspace(0.0, far, n + 1), (1, 1))
        rgb = jnp.ones((1, n, 3)) * jnp.asarray([1.0, 0.5, 0.25])
        density = jnp.full((1, n, 1), density_val)
        dirs = jnp.asarray([[0.0, 0.0, 1.0]])
        return mip.volumetric_rendering(rgb, density, t, dirs, white)

    def test_opaque_closed_form(self):
        """Constant density sigma: acc = 1 - exp(-sigma * far)."""
        sigma, far = 7.0, 1.0
        rgb, dist, acc, w = self._render(sigma, n=512, far=far)
        np.testing.assert_allclose(acc[0], 1 - np.exp(-sigma * far), rtol=1e-4)
        # Expected depth: int t sigma e^{-sigma t} / acc over [0, far].
        expect_d = (1 / sigma - (far + 1 / sigma) * np.exp(-sigma * far)) / (
            1 - np.exp(-sigma * far))
        np.testing.assert_allclose(dist[0], expect_d, rtol=1e-3)
        np.testing.assert_allclose(
            rgb[0], np.array([1.0, 0.5, 0.25]) * (1 - np.exp(-sigma * far)),
            rtol=1e-4)

    def test_zero_density_transparent(self):
        rgb, dist, acc, w = self._render(0.0)
        np.testing.assert_allclose(acc[0], 0.0, atol=1e-7)
        np.testing.assert_allclose(rgb[0], 0.0, atol=1e-7)

    def test_white_background(self):
        rgb, _, acc, _ = self._render(0.0, white=True)
        np.testing.assert_allclose(rgb[0], 1.0, atol=1e-6)

    def test_direction_norm_scales_delta(self):
        """Doubling |direction| doubles optical depth."""
        t = jnp.tile(jnp.linspace(0.0, 1.0, 9), (1, 1))
        rgb = jnp.ones((1, 8, 3))
        density = jnp.full((1, 8, 1), 1.0)
        _, _, acc1, _ = mip.volumetric_rendering(
            rgb, density, t, jnp.asarray([[0.0, 0.0, 1.0]]), False)
        _, _, acc2, _ = mip.volumetric_rendering(
            rgb, density, t, jnp.asarray([[0.0, 0.0, 2.0]]), False)
        np.testing.assert_allclose(
            1 - np.asarray(acc2), (1 - np.asarray(acc1)) ** 2, rtol=1e-3)

    def test_weights_sum_to_acc(self):
        _, _, acc, w = self._render(3.0)
        np.testing.assert_allclose(np.asarray(w).sum(-1), np.asarray(acc),
                                   rtol=1e-6)


class TestSafeNormalize:
    """safe_normalize: the backward-safe unit-vector helper that fixed the
    round-3 long-run NaN events (NOTES.md spike forensics — a per-sample
    density gradient of exactly zero NaN'd the whole step's gradients
    through norm's sqrt'(0)=inf backward)."""

    def test_matches_naive_on_healthy_inputs(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 3))
                        .astype(np.float32))
        naive = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(mip.safe_normalize(x)),
                                   np.asarray(naive), rtol=1e-6, atol=1e-7)

    def test_zero_vector_maps_to_zero_with_zero_grad(self):
        g = jax.grad(lambda x: jnp.sum(mip.safe_normalize(x)))(jnp.zeros(3))
        np.testing.assert_array_equal(np.asarray(g), 0.0)
        np.testing.assert_array_equal(
            np.asarray(mip.safe_normalize(jnp.zeros(3))), 0.0)

    def test_naive_form_would_nan(self):
        """Documents the bug being guarded: the old x/max(norm,eps) form
        produces NaN gradients at x == 0."""
        def naive(x):
            return jnp.sum(x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12))
        g = jax.grad(naive)(jnp.zeros(3))
        assert np.isnan(np.asarray(g)).all()

    def test_grad_finite_on_mixed_batch(self):
        x = jnp.asarray(np.array([[0.0, 0.0, 0.0], [1e-30, 0.0, 0.0],
                                  [0.0, 3.0, 4.0]], np.float32))
        g = jax.grad(lambda v: jnp.sum(mip.safe_normalize(v) ** 2))(x)
        assert np.isfinite(np.asarray(g)).all()
