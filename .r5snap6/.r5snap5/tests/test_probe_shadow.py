"""Structure tests for the shadow-contrast probe (scripts/probe_shadow.py):
the floor-point classifier must agree with the analytic visibility term,
and the irradiance query must be finite/positive on random-init params so
chip studies measure geometry, not probe bugs.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scripts"))

from probe_shadow import _floor_points, _pred_irradiance  # noqa: E402

from pano_nerf_tpu.core.rays import Rays  # noqa: E402
from pano_nerf_tpu.data import synthetic  # noqa: E402
from pano_nerf_tpu.models.pano_mip_nerf import PanoMipNeRF  # noqa: E402


def _env_rays(d=6, far=8.0):
    k = jax.random.PRNGKey(7)
    dirs = jax.random.normal(k, (d, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return Rays(origins=jnp.zeros((d, 3)), directions=dirs, viewdirs=dirs,
                radii=jnp.full((d, 1), 0.01),
                lossmult=jnp.full((d, 1), 4 * np.pi / d),
                near=jnp.full((d, 1), 0.05), far=jnp.full((d, 1), far),
                noise_var=jnp.zeros((d, 1)))


class TestFloorPoints:
    def test_classes_match_analytic_visibility(self):
        spec = synthetic.SCENE_VARIANTS["shadow"]
        p_sh, p_lit = _floor_points(spec, 32, seed=0)
        assert len(p_sh) == len(p_lit) == 16
        box = np.asarray(spec.box)
        for pts, want_blocked in ((p_sh, True), (p_lit, False)):
            # On the floor, slightly offset upward.
            np.testing.assert_allclose(pts[:, 1], -box[1] + 1e-3,
                                       atol=1e-5)
            c = synthetic._face_point(spec, spec.emitters[0])
            blocked = synthetic._segment_blocked(
                pts.astype(np.float64), c, spec)
            assert (blocked == want_blocked).all()
        # GT irradiance separates the classes (the probe's premise).
        up = np.broadcast_to(np.array([0.0, 1.0, 0.0]), p_sh.shape)
        gt_sh = synthetic._irradiance_at(spec, p_sh.astype(np.float64), up)
        gt_lit = synthetic._irradiance_at(spec, p_lit.astype(np.float64),
                                          up)
        assert gt_lit.mean() > 1.5 * gt_sh.mean()


class TestPredIrradiance:
    def test_finite_positive_on_random_init(self):
        model = PanoMipNeRF(num_samples=8, num_env_samples=4,
                            compute_dtype=jnp.float32)
        env = _env_rays(d=6)
        params = model.init(jax.random.PRNGKey(0))
        pts = np.array([[0.0, -1.4, 0.0], [1.0, -1.4, -1.0]], np.float32)
        irr = _pred_irradiance(model, params, env, pts)
        assert irr.shape == (2, 3)
        assert np.isfinite(irr).all()
        assert (irr >= 0.0).all()

    def test_knob_aware_reads(self):
        """The probe must measure what each knob's training consumes:
        etw at cov x1.0 reproduces the plain read exactly; etw/etr at
        0.01 diverge from it (and run finitely)."""
        import dataclasses
        base = PanoMipNeRF(num_samples=8, num_env_samples=4,
                           compute_dtype=jnp.float32)
        env = _env_rays(d=6)
        params = base.init(jax.random.PRNGKey(0))
        pts = np.array([[0.0, -1.4, 0.0], [1.0, -1.4, -1.0]], np.float32)
        plain = _pred_irradiance(base, params, env, pts)
        etw1 = dataclasses.replace(base, env_tight_rgb=1.0,
                                   env_tight_weights=True)
        np.testing.assert_allclose(
            _pred_irradiance(etw1, params, env, pts), plain,
            rtol=1e-5, atol=1e-6)
        for m in (dataclasses.replace(base, env_tight_rgb=0.01,
                                      env_tight_weights=True),
                  dataclasses.replace(base, env_tight_rgb=0.01),
                  dataclasses.replace(base, env_resample=True,
                                      num_env_fine_samples=3)):
            irr = _pred_irradiance(m, params, env, pts)
            assert np.isfinite(irr).all()
            assert not np.allclose(irr, plain)
