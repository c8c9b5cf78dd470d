"""Structure/invariant tests for the per-source attribution probe.

The probe itself is a measurement tool (scripts/probe_source_attribution.py);
these tests pin its geometry/aggregation logic on random-init params so a
refactor cannot silently change what the chip studies measure.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scripts"))

from probe_source_attribution import _gt_along, _surface_points, attribute  # noqa: E402

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


class TestGeometry:
    def test_gt_along_matches_render_pano_shading(self):
        """Rays from the box center reproduce render_pano's radiance."""
        spec = synthetic.SCENE_VARIANTS["duo"]
        quads = synthetic.render_pano(np.zeros(3), 8, 16, spec)
        from pano_nerf_tpu.data.pano_dataset import equirect_camera_dirs
        dirs, _ = equirect_camera_dirs(8, 16)
        dirs = dirs.reshape(-1, 3)
        rad, sid, t = _gt_along(spec, np.zeros_like(dirs), dirs)
        np.testing.assert_allclose(rad.reshape(8, 16, 3),
                                   quads["image"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(t.reshape(8, 16),
                                   quads["depth"][..., 0], rtol=1e-5)
        # Emitter pixels carry a source id; others -1.
        assert set(np.unique(sid)) <= {-1, 0, 1}
        assert (sid >= 0).any()

    def test_surface_points_on_walls_not_emitters(self):
        spec = synthetic.SCENE_VARIANTS["duo"]
        pts, nrm = _surface_points(spec, 32, seed=0)
        box = np.asarray(spec.box)
        # Each point sits just inside one face along its inward normal.
        face_dist = box - np.abs(pts)
        assert (face_dist.min(-1) < 0.01).all()
        assert np.allclose(np.linalg.norm(nrm, axis=-1), 1.0)
        # Re-intersecting outward lands off every emitter patch.
        rad, sid, _ = _gt_along(spec, pts - 2e-3 * nrm, -nrm)
        assert (sid == -1).all()


class TestAttribute:
    @pytest.fixture(scope="class")
    def report(self):
        model = PanoMipNeRF(num_samples=8, num_env_samples=4,
                            compute_dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0))
        spec = synthetic.SCENE_VARIANTS["duo"]
        return attribute(params, model, _env_rays(), spec,
                         n_points=12, seed=0, fine_samples=16)

    def test_rows_and_shares(self, report):
        tags = [r["class"] for r in report["rows"]]
        assert tags == ["source0", "source1", "nonsource"]
        assert abs(sum(r["evidence_share"] for r in report["rows"]) - 1.0) \
            < 1e-3
        assert abs(sum(r["coverage"] for r in report["rows"]) - 1.0) < 1e-3
        non = report["rows"][-1]
        assert non["pairs"] > 0 and "env_rgb" in non and "fine_rgb" in non

    def test_chroma_normalized(self, report):
        for row in report["rows"]:
            for key in ("env_chroma", "fine_chroma", "gt_seen_chroma"):
                if key in row:
                    assert abs(sum(row[key]) - 1.0) < 2e-3

    def test_tight_read_reported_for_etr_models(self):
        """With env_tight_rgb > 0 the probe reports the tight-scale color
        read training actually composites (tight_rgb[_at_source])."""
        model = PanoMipNeRF(num_samples=8, num_env_samples=4,
                            env_tight_rgb=0.01,
                            compute_dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0))
        spec = synthetic.SCENE_VARIANTS["duo"]
        rep = attribute(params, model, _env_rays(d=24), spec,
                        n_points=48, seed=0, fine_samples=16)
        src = [r for r in rep["rows"] if r["class"].startswith("source")
               and r["pairs"] > 0]
        assert src, "no source rows with pairs"
        for row in src:
            assert "tight_rgb" in row
            assert np.isfinite(np.asarray(row["tight_rgb"])).all()

    def test_illum_chroma_reported_for_ilf_models(self):
        """With illum_field the probe reports the field's per-class mean
        chroma simplex (the quantity whose per-source separation the duo
        gates measure)."""
        model = PanoMipNeRF(num_samples=8, num_env_samples=4,
                            illum_field=True, compute_dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0))
        spec = synthetic.SCENE_VARIANTS["duo"]
        rep = attribute(params, model, _env_rays(d=24), spec,
                        n_points=48, seed=0, fine_samples=16)
        rows = [r for r in rep["rows"] if r["pairs"] > 0]
        assert rows
        for row in rows:
            assert "illum_chroma" in row
            # zero-init field -> uniform chroma
            np.testing.assert_allclose(row["illum_chroma"], 1.0 / 3,
                                       atol=1e-3)
