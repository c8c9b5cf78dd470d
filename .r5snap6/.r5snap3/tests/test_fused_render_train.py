"""Training render kernel parity (kernels/fused_render_train.py).

Checks the custom_vjp whole-level train render (IPE + MLP + compositing
forward; hand-written compositing-adjoint + MLP backward) against the
standard XLA path: forward outputs AND gradients w.r.t. params and the
Gaussian moments (the env subgraph differentiates through means — the
irradiance coupling's surface-point gradient). Runs in Pallas interpret
mode on the CPU suite; compiles on TPU (PANO_NERF_TEST_TPU=1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from pano_nerf_tpu.kernels.fused_render_train import fused_render_train
from pano_nerf_tpu.models.mlp import NerfMLP
from pano_nerf_tpu.ops import mip

DENSITY_BIAS = -1.0


@pytest.fixture(autouse=True)
def interpret(monkeypatch):
    if jax.default_backend() not in ("tpu", "axon"):
        monkeypatch.setenv("PANO_NERF_PALLAS_INTERPRET", "1")


def _setup(R=12, S=8, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    means = jax.random.normal(ks[0], (R, S, 3)) * 2
    covs = jnp.abs(jax.random.normal(ks[1], (R, S, 3))) * 0.01
    dirs = jax.random.normal(ks[2], (R, 3))
    viewdirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(ks[3], (R, S + 1)) * 8, axis=-1)
    mlp = NerfMLP(num_density_channels=5, dtype=jnp.bfloat16)
    enc = mip.integrated_pos_enc(means, covs, 0, 16)
    venc = mip.pos_enc(viewdirs, 0, 4, True)[..., None, :]
    params = mlp.init(ks[4], enc[:1], venc[:1])
    return mlp, params, means, covs, viewdirs, t, dirs


def _xla_level(mlp, params, means, covs, viewdirs, t, dirs, white_bkgd,
               dtype=jnp.bfloat16):
    enc = mip.integrated_pos_enc(means, covs, 0, 16).astype(dtype)
    venc = mip.pos_enc(viewdirs, 0, 4, True)[..., None, :].astype(dtype)
    raw_rgb, raw_density = mlp.apply(params, enc, venc)
    rgb = jax.nn.softplus(raw_rgb)
    density = jax.nn.softplus(raw_density[..., :1] + DENSITY_BIAS)
    comp, dist, acc, w = mip.volumetric_rendering(rgb, density, t, dirs,
                                                  white_bkgd)
    return dict(rgb=comp, distance=dist, acc=acc, weights=w)


def _kernel_level(params, means, covs, viewdirs, t, dirs, white_bkgd,
                  save_acts=False):
    return fused_render_train(params, means, covs, viewdirs, t, dirs, 5,
                              0, 16, 4, DENSITY_BIAS, 0.0, white_bkgd,
                              save_acts=save_acts)


class TestForwardParity:
    @pytest.mark.parametrize("white_bkgd", [False, True])
    def test_outputs_match(self, white_bkgd):
        mlp, params, means, covs, viewdirs, t, dirs = _setup()
        ref = _xla_level(mlp, params, means, covs, viewdirs, t, dirs,
                         white_bkgd)
        got = jax.jit(lambda p: _kernel_level(
            p, means, covs, viewdirs, t, dirs, white_bkgd))(params)
        np.testing.assert_allclose(np.asarray(got["rgb"]),
                                   np.asarray(ref["rgb"]), atol=2e-2)
        np.testing.assert_allclose(np.asarray(got["acc"]),
                                   np.asarray(ref["acc"]), atol=1e-2)
        np.testing.assert_allclose(np.asarray(got["distance"]),
                                   np.asarray(ref["distance"]), atol=2e-2)
        np.testing.assert_allclose(np.asarray(got["weights"]),
                                   np.asarray(ref["weights"]), atol=1e-2)

    def test_save_acts_identical(self):
        mlp, params, means, covs, viewdirs, t, dirs = _setup()
        a = jax.jit(lambda p: _kernel_level(
            p, means, covs, viewdirs, t, dirs, False, save_acts=False)
        )(params)
        b = jax.jit(lambda p: _kernel_level(
            p, means, covs, viewdirs, t, dirs, False, save_acts=True)
        )(params)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=k)


def _loss_of(out, coef):
    return (jnp.sum(out["rgb"] * coef["rgb"])
            + jnp.sum(out["distance"] * coef["distance"])
            + jnp.sum(out["acc"] * coef["acc"])
            + jnp.sum(out["weights"] * coef["weights"]))


class TestBackwardParity:
    @pytest.mark.parametrize("save_acts", [False, True])
    def test_grads_params_and_means(self, save_acts):
        mlp, params, means, covs, viewdirs, t, dirs = _setup()
        R, S = means.shape[:2]
        kc = jax.random.split(jax.random.PRNGKey(9), 4)
        coef = dict(rgb=jax.random.normal(kc[0], (R, 3)),
                    distance=jax.random.normal(kc[1], (R,)),
                    acc=jax.random.normal(kc[2], (R,)),
                    weights=jax.random.normal(kc[3], (R, S)))

        def loss_ref(p, m):
            return _loss_of(_xla_level(mlp, p, m, covs, viewdirs, t, dirs,
                                       False), coef)

        def loss_ker(p, m):
            return _loss_of(_kernel_level(p, m, covs, viewdirs, t, dirs,
                                          False, save_acts=save_acts), coef)

        g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(params, means)
        g_ker = jax.jit(jax.grad(loss_ker, argnums=(0, 1)))(params, means)

        f_ref, _ = ravel_pytree(g_ref[0])
        f_ker, _ = ravel_pytree(g_ker[0])
        rel_p = float(jnp.linalg.norm(f_ref - f_ker)
                      / (jnp.linalg.norm(f_ref) + 1e-30))
        assert rel_p < 3e-2, rel_p

        rel_m = float(jnp.linalg.norm(g_ref[1] - g_ker[1])
                      / (jnp.linalg.norm(g_ref[1]) + 1e-30))
        assert rel_m < 5e-2, rel_m

    def _model_setup(self):
        from tests.conftest import make_rays

        from pano_nerf_tpu.data.pano_dataset import generate_lit_rays
        from pano_nerf_tpu.engine import losses as losses_lib
        from pano_nerf_tpu.models.pano_mip_nerf import PanoMipNeRF

        model = PanoMipNeRF(num_samples=8, num_env_samples=4,
                            compute_dtype=jnp.bfloat16,
                            use_train_render_kernel=True)
        params = model.init(jax.random.PRNGKey(0))
        env = jax.tree.map(jnp.asarray, generate_lit_rays(num=4, far=10.0))
        rays = make_rays(12, key=5)
        gt = jnp.abs(jax.random.normal(jax.random.PRNGKey(7), (12, 3))) * 2

        def loss_fn(m, p, surf, ort):
            hp = losses_lib.prepare_hparams({
                "loss.coarse_loss_mult": 0.1,
                "loss.surface_loss": 1.0 if surf else 0.0,
                "loss.ort_loss": 0.1 if ort else 0.0,
                "loss.chrom_loss": 0.1})
            outs = m(p, jax.random.PRNGKey(3), rays, env, randomized=True,
                     white_bkgd=False, enable_surf=surf, use_ort_loss=ort)
            return losses_lib.pano_losses(
                outs, gt, jnp.ones((12, 1)), hp, enable_surf=surf)["loss"]

        return model, params, loss_fn

    def test_model_coarse_kernel_grad_parity(self):
        """Kernel-coarse vs XLA full model: with the chaotic terms off
        (surf/ort amplify ~1e-4 bf16 resampling shifts through random-init
        normals), the loss gradients must agree at bf16 level."""
        import dataclasses
        model, params, loss_fn = self._model_setup()
        std = dataclasses.replace(model, use_train_render_kernel=False)
        l_k, g_k = jax.jit(jax.value_and_grad(
            lambda p: loss_fn(model, p, False, False)))(params)
        l_s, g_s = jax.jit(jax.value_and_grad(
            lambda p: loss_fn(std, p, False, False)))(params)
        np.testing.assert_allclose(float(l_k), float(l_s), rtol=1e-2)
        f_k, _ = ravel_pytree(g_k)
        f_s, _ = ravel_pytree(g_s)
        rel = float(jnp.linalg.norm(f_k - f_s)
                    / (jnp.linalg.norm(f_s) + 1e-30))
        assert rel < 3e-2, rel

    def test_model_env_kernel_grad_parity(self):
        """Env-kernel vs XLA env with IDENTICAL fine-level inputs (both
        variants use the kernel coarse level, so the chaotic resampling
        shift cancels): isolates the env backward exactly."""
        import dataclasses
        model, params, loss_fn = self._model_setup()
        coarse_only = dataclasses.replace(model, train_kernel_scope="coarse")
        l_a, g_a = jax.jit(jax.value_and_grad(
            lambda p: loss_fn(model, p, True, False)))(params)
        l_b, g_b = jax.jit(jax.value_and_grad(
            lambda p: loss_fn(coarse_only, p, True, False)))(params)
        np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-3)
        f_a, _ = ravel_pytree(g_a)
        f_b, _ = ravel_pytree(g_b)
        rel = float(jnp.linalg.norm(f_a - f_b)
                    / (jnp.linalg.norm(f_b) + 1e-30))
        assert rel < 2e-2, rel

    def test_model_full_config_loss_sane(self):
        """Full production loss config through the kernels: finite and
        within the chaos-bounded envelope of the std path."""
        import dataclasses
        model, params, loss_fn = self._model_setup()
        std = dataclasses.replace(model, use_train_render_kernel=False)
        l_k = float(jax.jit(lambda p: loss_fn(model, p, True, True))(params))
        l_s = float(jax.jit(lambda p: loss_fn(std, p, True, True))(params))
        assert np.isfinite(l_k) and np.isfinite(l_s)
        np.testing.assert_allclose(l_k, l_s, rtol=0.1)

    def test_grad_through_t_samples(self):
        """delta/t_mid lanes of dmc chain back to t_samples in XLA (the
        wrapper builds them differentiably)."""
        mlp, params, means, covs, viewdirs, t, dirs = _setup()
        R, S = means.shape[:2]
        coef_w = jax.random.normal(jax.random.PRNGKey(11), (R, S))

        def loss_ref(tt):
            out = _xla_level(mlp, params, means, covs, viewdirs, tt, dirs,
                             False)
            return jnp.sum(out["weights"] * coef_w) + jnp.sum(out["rgb"])

        def loss_ker(tt):
            out = _kernel_level(params, means, covs, viewdirs, tt, dirs,
                                False)
            return jnp.sum(out["weights"] * coef_w) + jnp.sum(out["rgb"])

        g_ref = jax.jit(jax.grad(loss_ref))(t)
        g_ker = jax.jit(jax.grad(loss_ker))(t)
        # The XLA path also differentiates the distance CLIP bounds
        # (t[...,0], t[...,-1]) — the kernel treats those as data; the loss
        # above avoids distance so the paths are comparable.
        rel = float(jnp.linalg.norm(g_ref - g_ker)
                    / (jnp.linalg.norm(g_ref) + 1e-30))
        assert rel < 5e-2, rel
