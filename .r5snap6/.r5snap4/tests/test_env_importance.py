"""Importance-sampled env directions: coverage, exact pdf, unbiasedness,
variance reduction, and model wiring.

ops/mip.py::importance_env_directions draws irradiance directions from a
bright-cell-concentrated defensive mixture and returns exact 1/(D*pdf)
Monte-Carlo weights. These tests pin the three properties HDR recovery
depends on: the pdf is a true density (support covers the sphere,
integrates to 1 over the actual process), the weighted estimator is
unbiased for any radiance function, and it has lower variance than the
uniform rotated estimator when the proposal tracks the radiance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pano_nerf_tpu.ops import mip
from pano_nerf_tpu.utils.rotation import random_rotations
from pano_nerf_tpu.utils.spherical import sample_dir_by_uniform

CAP_SCALE = 2.0


def _cells(Dp, B=1, key=None):
    base = jnp.asarray(sample_dir_by_uniform(Dp))
    if key is None:
        return jnp.broadcast_to(base, (B, Dp, 3))
    R = random_rotations(key, (B,))
    return jnp.einsum("bij,dj->bdi", R, base)


class TestSampler:
    @pytest.mark.parametrize("Dp", [8, 16, 32])
    def test_cap_union_covers_sphere(self, Dp):
        """Every direction lies inside >= 1 cap, so pdf > 0 everywhere
        (support gap would bias the estimator)."""
        centers = sample_dir_by_uniform(Dp)
        cos_half = 1.0 - CAP_SCALE * 2.0 / Dp
        rng = np.random.default_rng(0)
        v = rng.standard_normal((100_000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        assert ((v @ centers.T).max(-1) >= cos_half).all()

    def test_pdf_integrates_to_one(self):
        """MC check that the returned density is the true density of the
        process: E_uniform[pdf] * 4pi = 1."""
        Dp, B = 16, 4
        cells = _cells(Dp, B, jax.random.PRNGKey(0))
        w = jax.random.uniform(jax.random.PRNGKey(1), (B, Dp))
        # Recompute pdf at uniform test dirs with the same cap logic.
        cos_half = 1.0 - CAP_SCALE * 2.0 / Dp
        A_cap = 2.0 * np.pi * (1.0 - cos_half)
        p = 0.5 / Dp + 0.5 * w / jnp.sum(w, -1, keepdims=True)
        rng = np.random.default_rng(2)
        v = rng.standard_normal((20_000, 3))
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        inside = jnp.einsum("ni,bci->bnc", jnp.asarray(v, jnp.float32),
                            cells) >= cos_half
        pdf = jnp.sum(p[:, None, :] * inside, -1) / A_cap  # [B, N]
        integral = np.asarray(jnp.mean(pdf, -1)) * 4 * np.pi
        np.testing.assert_allclose(integral, 1.0, atol=0.03)

    def test_estimator_unbiased_and_lower_variance(self):
        """sum L(w_d) / (D * pdf) is unbiased for integral(L) even with a
        proposal aggressively skewed toward the bright cap — and beats the
        uniform rotated estimator's variance when the proposal tracks L."""
        emitter = np.array([1.0, 1.0, 1.0]) / np.sqrt(3.0)
        cap = np.radians(15.0)

        def radiance(d):  # [..., 3] -> [...]
            return 10.0 * (d @ jnp.asarray(emitter) > np.cos(cap)) + 0.2

        truth = (10.0 * 2 * np.pi * (1 - np.cos(cap))
                 + 0.2 * 4 * np.pi)

        D, Dp, B = 10, 16, 4096
        est_is_all, est_rot_all = [], []
        for seed in range(4):
            keys = jax.random.split(jax.random.PRNGKey(seed), 3)
            cells = _cells(Dp, B, keys[0])
            # Proposal from the radiance itself (the probe's job in the
            # model).
            w = radiance(cells) + 1e-3
            dirs, inv_den = mip.importance_env_directions(keys[1], cells,
                                                          w, D)
            est_is_all.append(jnp.sum(radiance(dirs) * inv_den[..., 0], -1))

            # Uniform rotated baseline at the same D.
            base = jnp.asarray(sample_dir_by_uniform(D))
            R = random_rotations(keys[2], (B,))
            rdirs = jnp.einsum("bij,dj->bdi", R, base)
            est_rot_all.append(jnp.sum(radiance(rdirs), -1)
                               * (4 * np.pi / D))
        est_is = jnp.concatenate(est_is_all)
        est_rot = jnp.concatenate(est_rot_all)

        mean_is = float(jnp.mean(est_is))
        mean_rot = float(jnp.mean(est_rot))
        # 16k samples; observed sem ~0.8% of truth -> 3% is ~4 sigma.
        assert abs(mean_is - truth) / truth < 0.03, (mean_is, truth)
        assert abs(mean_rot - truth) / truth < 0.03, (mean_rot, truth)
        # Variance finding (measured, documented in NOTES.md): cell-level
        # importance does NOT beat the rigid rotated lattice for emitters
        # smaller than a proposal cell — the rigid Fibonacci geometry is
        # itself a stratification. Assert the estimator is at least not
        # catastrophically worse; the HDR study picks the mode by outcome.
        v_is = float(jnp.var(est_is))
        v_rot = float(jnp.var(est_rot))
        assert v_is < 2.0 * v_rot, (v_is, v_rot)

    def test_stratified_unbiased(self):
        """stratified_env_directions: jitter-in-cap with overlap-count
        weights has the same mean as the integral for a sharp emitter.
        (Variance is WORSE than rigid rotation — measured and documented in
        NOTES.md — the mode exists as a studied alternative, not the
        default.)"""
        emitter = np.array([0.3, 0.9, 0.3])
        emitter = emitter / np.linalg.norm(emitter)
        cap = np.radians(27.0)

        def radiance(d):
            return 8.0 * (d @ jnp.asarray(emitter, jnp.float32)
                          > np.cos(cap)) + 0.2

        truth = 8.0 * 2 * np.pi * (1 - np.cos(cap)) + 0.2 * 4 * np.pi
        D, B = 40, 8192
        cells = _cells(D, B, jax.random.PRNGKey(5))
        dirs, w = mip.stratified_env_directions(jax.random.PRNGKey(6),
                                                cells)
        est = jnp.sum(radiance(dirs) * w[..., 0], -1)
        mean = float(jnp.mean(est))
        sem = float(jnp.std(est)) / np.sqrt(B)
        assert abs(mean - truth) < 4 * sem + 0.02 * truth, (mean, truth,
                                                            sem)

    def test_zero_weights_fall_back_to_uniform(self):
        cells = _cells(8, 2)
        dirs, inv_den = mip.importance_env_directions(
            jax.random.PRNGKey(0), cells, jnp.zeros((2, 8)), 6)
        assert np.all(np.isfinite(np.asarray(inv_den)))
        norms = np.linalg.norm(np.asarray(dirs), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


class TestModelWiring:
    @pytest.fixture(scope="class")
    def setup(self):
        from tests.conftest import make_rays

        from pano_nerf_tpu.data.pano_dataset import generate_lit_rays
        from pano_nerf_tpu.models.pano_mip_nerf import PanoMipNeRF
        kw = dict(num_samples=8, num_env_samples=4, env_probe_dirs=8,
                  env_probe_samples=2, compute_dtype=jnp.float32)
        on = PanoMipNeRF(env_importance=True, **kw)
        off = PanoMipNeRF(env_importance=False, env_rotation=False, **kw)
        params = on.init(jax.random.PRNGKey(0))
        env = jax.tree.map(jnp.asarray, generate_lit_rays(num=4, far=10.0))
        rays = make_rays(6)
        return on, off, params, env, rays

    def test_eval_path_identical(self, setup):
        on, off, params, env, rays = setup
        o1 = on(params, jax.random.PRNGKey(1), rays, env, randomized=False,
                white_bkgd=False, enable_surf=True, use_ort_loss=True)
        o2 = off(params, jax.random.PRNGKey(1), rays, env, randomized=False,
                 white_bkgd=False, enable_surf=True, use_ort_loss=True)
        for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_path_runs_with_gradients(self, setup):
        on, _, params, env, rays = setup

        def loss(p):
            o = on(p, jax.random.PRNGKey(1), rays, env, randomized=True,
                   white_bkgd=False, enable_surf=True, use_ort_loss=True)
            return jnp.sum(o[-1].surf_rgb) + jnp.sum(o[-1].rgb)

        val, g = jax.value_and_grad(loss)(params)
        gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
        assert np.isfinite(float(val)) and np.isfinite(gn) and gn > 0

    def test_model_irradiance_unbiased_under_keys(self, setup):
        """The shading term averaged over PRNG keys converges to the fixed
        dense-quadrature estimate on the same frozen field."""
        on, _, params, env, rays = setup
        from pano_nerf_tpu.data.pano_dataset import generate_lit_rays

        # Dense fixed reference: D=600 Fibonacci directions.
        dense = jax.tree.map(jnp.asarray,
                             generate_lit_rays(num=600, far=10.0))
        import dataclasses
        off = dataclasses.replace(on, env_importance=False,
                                  env_rotation=False)
        ref = off(params, jax.random.PRNGKey(0), rays, dense,
                  randomized=False, white_bkgd=False, enable_surf=True,
                  use_ort_loss=False)[-1].shading

        fn = jax.jit(lambda k: on(
            params, k, rays, env, randomized=True, white_bkgd=False,
            enable_surf=True, use_ort_loss=False)[-1].shading)
        acc = 0.0
        K = 60
        for i in range(K):
            acc = acc + fn(jax.random.PRNGKey(100 + i))
        mean = np.asarray(acc / K)
        ref = np.asarray(ref)
        # The randomized pass jitters the PRIMARY samples too (stratified
        # vs the reference's deterministic midpoints), so a few percent of
        # systematic offset is expected on top of MC noise; the bound
        # catches gross estimator bias (a support gap or wrong pdf shows
        # up as 20-50%).
        denom = np.abs(ref).mean()
        assert np.abs(mean - ref).mean() / denom < 0.12
