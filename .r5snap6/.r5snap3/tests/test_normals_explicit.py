"""Explicit-normals path (models/normals.py): parity with the autodiff path.

The training fine level builds d(density)/d(means) from forward ReLU masks
instead of jax.vjp (eliminating second-order autodiff). These tests pin:
  * the explicit forward is exactly NerfMLP.apply;
  * g_enc equals jax.grad of the raw density channel;
  * the IPE chain (density_means_grad) equals autodiff through the encoding;
  * full-model outputs AND loss gradients match normals_impl="vjp" in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pano_nerf_tpu.models.mip_nerf import MipNeRF
from pano_nerf_tpu.models.mlp import NerfMLP
from pano_nerf_tpu.models.normals import (density_means_grad,
                                          mlp_with_density_grad,
                                          view_branch_apply)
from pano_nerf_tpu.models.pano_mip_nerf import PanoMipNeRF
from pano_nerf_tpu.ops import mip


@pytest.fixture(scope="module")
def mlp_setup():
    mlp = NerfMLP(num_density_channels=5, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 96))
    v = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 27))
    params = mlp.init(jax.random.PRNGKey(2), x, v)
    return mlp, params, x, v


class TestMLPLevel:
    def test_forward_matches_flax(self, mlp_setup):
        mlp, params, x, v = mlp_setup
        rgb0, den0 = mlp.apply(params, x, v)
        rgb1, den1, _ = mlp_with_density_grad(params, x, v, 4, jnp.float32)
        np.testing.assert_array_equal(np.asarray(rgb0), np.asarray(rgb1))
        np.testing.assert_array_equal(np.asarray(den0), np.asarray(den1))

    def test_g_enc_matches_autodiff(self, mlp_setup):
        mlp, params, x, v = mlp_setup
        g_ref = jax.grad(
            lambda xe: jnp.sum(mlp.apply(params, xe, v)[1][..., 0]))(x)
        _, _, g_enc = mlp_with_density_grad(params, x, v, 4, jnp.float32)
        np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_enc),
                                   rtol=1e-5, atol=1e-6)

    def test_no_viewdirs_variant(self):
        mlp = NerfMLP(num_density_channels=1, dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 96))
        params = mlp.init(jax.random.PRNGKey(2), x, None)
        rgb0, den0 = mlp.apply(params, x)
        rgb1, den1, g_enc = mlp_with_density_grad(params, x, None, 4,
                                                  jnp.float32)
        np.testing.assert_array_equal(np.asarray(rgb0), np.asarray(rgb1))
        g_ref = jax.grad(
            lambda xe: jnp.sum(mlp.apply(params, xe)[1][..., 0]))(x)
        np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_enc),
                                   rtol=1e-5, atol=1e-6)

    def test_deep_skip_topology(self):
        """Non-default depth/skip (incl. trailing concat) stays in sync with
        flax semantics."""
        mlp = NerfMLP(net_depth=5, skip_index=2, num_density_channels=2,
                      dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 24))
        v = jax.random.normal(jax.random.PRNGKey(1), (3, 1, 9))
        params = mlp.init(jax.random.PRNGKey(2), x, v)
        rgb0, den0 = mlp.apply(params, x, v)
        rgb1, den1, g_enc = mlp_with_density_grad(params, x, v, 2,
                                                  jnp.float32)
        np.testing.assert_array_equal(np.asarray(rgb0), np.asarray(rgb1))
        np.testing.assert_array_equal(np.asarray(den0), np.asarray(den1))
        g_ref = jax.grad(
            lambda xe: jnp.sum(mlp.apply(params, xe, v)[1][..., 0]))(x)
        np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_enc),
                                   rtol=1e-5, atol=1e-6)

    def test_view_branch_matches_full_forward(self, mlp_setup):
        """Re-querying the color head on saved bottleneck features under a
        NEW view direction is exactly a full forward with that direction
        (the bottleneck is view-independent)."""
        mlp, params, x, v = mlp_setup
        v2 = jax.random.normal(jax.random.PRNGKey(9), (4, 1, 27))
        rgb_full, _ = mlp.apply(params, x, v2)
        out = mlp_with_density_grad(params, x, v, 4, jnp.float32,
                                    want_bottleneck=True)
        assert len(out) == 4
        rgb_branch = view_branch_apply(params, out[3], v2, jnp.float32)
        np.testing.assert_array_equal(np.asarray(rgb_full),
                                      np.asarray(rgb_branch))

    def test_ipe_chain_matches_autodiff(self, mlp_setup):
        mlp, params, _, v = mlp_setup
        means = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 3))
        covs = jax.random.uniform(jax.random.PRNGKey(4), (4, 8, 3)) * 0.1

        def sigma(m):
            enc = mip.integrated_pos_enc(m, covs, 0, 16)
            return jnp.sum(mlp.apply(params, enc, v)[1][..., 0])

        g_ref = jax.grad(sigma)(means)
        enc = mip.integrated_pos_enc(means, covs, 0, 16)
        _, _, g_enc = mlp_with_density_grad(params, enc, v, 4, jnp.float32)
        got = density_means_grad(g_enc, enc, 0, 16)
        np.testing.assert_allclose(np.asarray(g_ref), np.asarray(got),
                                   rtol=1e-4, atol=1e-5)


def _rays(n, seed=0):
    from pano_nerf_tpu.core.rays import Rays
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    return Rays(
        origins=jnp.zeros((n, 3)), directions=jnp.asarray(d),
        viewdirs=jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True)),
        radii=jnp.full((n, 1), 0.01), lossmult=jnp.ones((n, 1)),
        near=jnp.zeros((n, 1)), far=jnp.full((n, 1), 10.0),
        noise_var=jnp.zeros((n, 1)))


class TestModelLevel:
    @pytest.fixture(scope="class")
    def setup(self):
        kw = dict(num_samples=8, num_env_samples=4,
                  compute_dtype=jnp.float32)
        m_exp = PanoMipNeRF(normals_impl="explicit", **kw)
        m_vjp = PanoMipNeRF(normals_impl="vjp", **kw)
        params = m_exp.init(jax.random.PRNGKey(0))
        rays = _rays(16)
        env = _rays(4, seed=1)
        env = env._replace(lossmult=env.lossmult * np.pi)
        return m_exp, m_vjp, params, rays, env

    def test_outputs_match(self, setup):
        m_exp, m_vjp, params, rays, env = setup
        key = jax.random.PRNGKey(5)
        outs_e = m_exp(params, key, rays, env, randomized=True,
                       white_bkgd=False, enable_surf=True, use_ort_loss=True)
        outs_v = m_vjp(params, key, rays, env, randomized=True,
                       white_bkgd=False, enable_surf=True, use_ort_loss=True)
        for fe, fv in zip(outs_e, outs_v):
            for name, a, b in zip(fe._fields, fe, fv):
                if a is None:
                    assert b is None
                    continue
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5,
                    err_msg=name)

    def test_param_grads_match(self, setup):
        m_exp, m_vjp, params, rays, env = setup
        key = jax.random.PRNGKey(5)

        def loss(p, model):
            outs = model(p, key, rays, env, randomized=True,
                         white_bkgd=False, enable_surf=True,
                         use_ort_loss=True)
            f = outs[-1]
            return (jnp.mean(f.rgb ** 2) + jnp.mean(f.surf_rgb ** 2)
                    + f.ort_loss + jnp.mean(f.normal * f.albedo))

        from jax.flatten_util import ravel_pytree
        g_e = jax.grad(lambda p: loss(p, m_exp))(params)
        g_v = jax.grad(lambda p: loss(p, m_vjp))(params)
        flat_e, _ = ravel_pytree(g_e)
        flat_v, _ = ravel_pytree(g_v)
        np.testing.assert_allclose(np.asarray(flat_e), np.asarray(flat_v),
                                   rtol=1e-3, atol=2e-5)

    def test_vc_bottleneck_reuse_matches_full_reeval(self, setup):
        """The view-consistency alt-view rgb via the bottleneck re-query
        (explicit path) equals the full-trunk re-eval (vjp fallback path) —
        values and parameter gradients (gradient contributions through a
        shared vs duplicated trunk sum identically by linearity)."""
        m_exp, m_vjp, params, rays, env = setup
        key = jax.random.PRNGKey(7)
        kw = dict(randomized=True, white_bkgd=False, enable_surf=True,
                  use_ort_loss=False, use_vc_loss=True)
        f_e = m_exp(params, key, rays, env, **kw)[-1]
        f_v = m_vjp(params, key, rays, env, **kw)[-1]
        assert f_e.rgb_alt is not None and f_v.rgb_alt is not None
        np.testing.assert_allclose(np.asarray(f_e.rgb_alt),
                                   np.asarray(f_v.rgb_alt),
                                   rtol=2e-5, atol=1e-5)

        def vc_loss(p, model):
            f = model(p, key, rays, env, **kw)[-1]
            a = jnp.log1p(jnp.maximum(f.rgb, 0.0))
            b = jnp.log1p(jnp.maximum(f.rgb_alt, 0.0))
            return jnp.mean((a - b) ** 2) + jnp.mean(f.rgb ** 2)

        from jax.flatten_util import ravel_pytree
        g_e, _ = ravel_pytree(jax.grad(lambda p: vc_loss(p, m_exp))(params))
        g_v, _ = ravel_pytree(jax.grad(lambda p: vc_loss(p, m_vjp))(params))
        np.testing.assert_allclose(np.asarray(g_e), np.asarray(g_v),
                                   rtol=1e-3, atol=2e-5)

    def test_mipnerf_model_match(self):
        kw = dict(num_samples=8, compute_dtype=jnp.float32)
        m_exp = MipNeRF(normals_impl="explicit", **kw)
        m_vjp = MipNeRF(normals_impl="vjp", **kw)
        params = m_exp.init(jax.random.PRNGKey(0))
        rays = _rays(16)
        key = jax.random.PRNGKey(5)
        outs_e = m_exp(params, key, rays, randomized=True, white_bkgd=False,
                       use_ort_loss=True)
        outs_v = m_vjp(params, key, rays, randomized=True, white_bkgd=False,
                       use_ort_loss=True)
        for fe, fv in zip(outs_e, outs_v):
            for name, a, b in zip(fe._fields, fe, fv):
                if a is None:
                    assert b is None
                    continue
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-5,
                    err_msg=name)
