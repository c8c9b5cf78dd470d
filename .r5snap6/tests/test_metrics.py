"""Metric-library tests: PSNR/SSIM, ws_ variants, depth + angular metrics."""

import jax.numpy as jnp
import numpy as np

from pano_nerf_tpu.utils import metrics as M


class TestBasic:
    def test_psnr_known_value(self):
        x = jnp.zeros((8, 8, 3))
        y = jnp.full((8, 8, 3), 0.1)
        np.testing.assert_allclose(float(M.psnr(x, y)), 20.0, rtol=1e-5)

    def test_ssim_identity(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
        assert float(M.ssim(img, img)) > 0.999

    def test_ssim_never_exceeds_one_low_variance(self):
        """Near-identical, low-variance images are the catastrophic-
        cancellation case for the moment estimates: with reduced-precision
        convs SSIM shoots past 1 (regression guard for the TPU bf16-conv
        default)."""
        rng = np.random.default_rng(0)
        base = rng.uniform(0.4, 0.6, (64, 128, 3)).astype(np.float32)
        near = base + rng.normal(0, 1e-4, base.shape).astype(np.float32)
        s = float(M.ssim(jnp.asarray(base), jnp.asarray(near)))
        assert 0.99 < s <= 1.0 + 1e-4, s

    def test_ssim_decreases_with_noise(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
        s1 = float(M.ssim(img, jnp.clip(img + 0.05, 0, 1)))
        s2 = float(M.ssim(img, jnp.clip(
            img + jnp.asarray(rng.normal(0, 0.3, img.shape),
                              jnp.float32), 0, 1)))
        assert s2 < s1 < 1.0

    def test_mean_angular_error(self):
        a = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
        b = jnp.asarray([[0.0, 1.0, 0], [0, 1.0, 0]])
        np.testing.assert_allclose(float(M.mean_angular_error(a, b)), 45.0,
                                   rtol=1e-5)

    def test_scale_invariant_mse(self):
        x = jnp.asarray([1.0, 2.0, 3.0])
        np.testing.assert_allclose(float(M.scale_invariant_mse(x, x + 5.0)),
                                   0.0, atol=1e-7)


class TestWeightedSpherical:
    def test_ws_psnr_channel_sum_semantics(self):
        """Reference semantics (utils/metrics.py:318-326): weights normalize
        over pixels only, so the channel axis is SUMMED — for uniform error
        ws_psnr == psnr - 10*log10(C). Preserved for metric comparability."""
        pred = jnp.zeros((16, 32, 3))
        gt = jnp.full((16, 32, 3), 0.25)
        np.testing.assert_allclose(
            float(M.ws_psnr(pred, gt)),
            float(M.psnr(pred, gt)) - 10 * np.log10(3), rtol=1e-5)

    def test_ws_downweights_poles(self):
        """Error concentrated at the poles scores better than at the
        equator under solid-angle weighting."""
        gt = jnp.zeros((16, 32, 3))
        pole_err = gt.at[0].set(1.0)
        equator_err = gt.at[8].set(1.0)
        assert float(M.ws_psnr(pole_err, gt)) > float(M.ws_psnr(equator_err, gt))

    def test_ws_l1_uniform(self):
        # Channel sum (see ws_psnr test): 3 channels x 0.5 each.
        pred = jnp.zeros((8, 16, 3))
        gt = jnp.full((8, 16, 3), 0.5)
        np.testing.assert_allclose(float(M.ws_l1(pred, gt)), 1.5, rtol=1e-5)

    def test_ws_mae_aligned_zero(self):
        n = jnp.ones((8, 16, 3))
        np.testing.assert_allclose(float(M.ws_mae(n, n)), 0.0, atol=1e-3)

    def test_ws_cos_similarity_aligned(self):
        n = jnp.ones((8, 16, 3))
        np.testing.assert_allclose(float(M.ws_cos_similarity(n, n)), 1.0,
                                   rtol=1e-5)


class TestDepth:
    def test_perfect_depth(self):
        d = jnp.asarray(np.linspace(1, 5, 64, dtype=np.float32))
        m = M.depth_metrics(d, d, jnp.ones_like(d))
        assert float(m["abs_rel"]) < 1e-7
        assert float(m["rms"]) < 1e-7
        np.testing.assert_allclose(float(m["delta1"]), 1.0)

    def test_scaled_depth_delta(self):
        gt = jnp.full((64,), 2.0)
        pred = gt * 1.3
        m = M.depth_metrics(pred, gt, jnp.ones_like(gt))
        np.testing.assert_allclose(float(m["delta1"]), 0.0)  # 1.3 > 1.25
        np.testing.assert_allclose(float(m["delta2"]), 1.0)  # < 1.5625
        np.testing.assert_allclose(float(m["abs_rel"]), 0.3, rtol=1e-5)

    def test_mask_respected(self):
        gt = jnp.asarray([1.0, 1.0])
        pred = jnp.asarray([1.0, 100.0])
        m = M.depth_metrics(pred, gt, jnp.asarray([1.0, 0.0]))
        assert float(m["abs_rel"]) < 1e-7
