"""Cross-implementation parity: JAX rebuild vs the torch reference.

These tests import the actual reference code from /root/reference (torch CPU)
and assert numerical agreement with the JAX ops on identical inputs. Every
deliberate deviation is asserted AS a deviation with a comment.

Covered reference anchors:
  * expected_sin / integrated_pos_enc      models/mip.py:355-428
  * pos_enc                                models/mip.py:431-441
  * sorted_piecewise_constant_pdf          models/mip.py:240-301 (non-random)
  * sample_along_rays + cast_rays chain    models/mip.py:8-151
  * resample_along_rays (blurpool)         models/mip.py:304-352
  * volumetric_rendering                   models/mip.py:444-483
  * hdr_to_ldr (ACES + gamma, uint8)       utils/surface_rendering.py:319-344
  * surface_rendering Lambertian + GGX     utils/surface_rendering.py:6-165
  * solid_angle_refinement                 utils/surface_rendering.py:294-316
  * MipLRDecay                             utils/lr_schedule.py:25-60
  * PanoDataset equirect rays / env rays   datasets/pano_datasets.py:133-263
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"

# The reference uses absolute intra-repo imports (`from datasets... import`),
# and utils/io_exr.py imports OpenEXR/Imath which are not installed here.
# Stub the EXR wheel modules (the tests patch read_exr with our codec) and put
# the reference first on sys.path so its top-level packages win.
for _name in ("OpenEXR", "Imath"):
    if _name not in sys.modules:
        stub = types.ModuleType(_name)
        stub.InputFile = stub.OutputFile = stub.Header = object
        stub.PixelType = type("PixelType", (), {"FLOAT": 2, "HALF": 1,
                                                "__init__": lambda s, t: None})
        sys.modules[_name] = stub
sys.path.insert(0, REFERENCE)
try:
    ref_mip = pytest.importorskip("models.mip")
    ref_sr = pytest.importorskip("utils.surface_rendering")
    ref_lr = pytest.importorskip("utils.lr_schedule")
    import datasets.pano_datasets as ref_pd
finally:
    # Imported reference modules stay cached in sys.modules; drop the path so
    # top-level names like `train` keep resolving to this repo.
    sys.path.remove(REFERENCE)

import jax
import jax.numpy as jnp

from pano_nerf_tpu.engine.schedule import mip_lr_decay
from pano_nerf_tpu.ops import mip as jmip
from pano_nerf_tpu.ops import shading as jshading


def t(x):
    return torch.as_tensor(np.asarray(x), dtype=torch.float32)


def allclose(jx, tx, rtol=1e-5, atol=1e-6):
    np.testing.assert_allclose(np.asarray(jx, np.float32),
                               tx.detach().numpy(), rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(20240816)


class TestEncodings:
    def test_expected_sin(self, rng):
        x = rng.normal(size=(4, 7, 12)).astype(np.float32)
        var = rng.uniform(0, 2, size=(4, 7, 12)).astype(np.float32)
        ours = jmip.expected_sin(jnp.asarray(x), jnp.asarray(var))
        theirs, _ = ref_mip.expected_sin(t(x), t(var))
        allclose(ours, theirs)

    def test_integrated_pos_enc(self, rng):
        means = rng.normal(size=(3, 5, 3)).astype(np.float32)
        covs = rng.uniform(0, 0.1, size=(3, 5, 3)).astype(np.float32)
        ours = jmip.integrated_pos_enc(jnp.asarray(means), jnp.asarray(covs),
                                       0, 16)
        theirs = ref_mip.integrated_pos_enc((t(means), t(covs)), 0, 16)
        allclose(ours, theirs, rtol=2e-5, atol=2e-6)

    @pytest.mark.parametrize("append_identity", [True, False])
    def test_pos_enc(self, rng, append_identity):
        x = rng.normal(size=(6, 3)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        ours = jmip.pos_enc(jnp.asarray(x), 0, 4, append_identity)
        theirs = ref_mip.pos_enc(t(x), 0, 4, append_identity)
        allclose(ours, theirs)


class TestSampling:
    def test_inverse_cdf_nonrandom(self, rng):
        bins = np.sort(rng.uniform(0, 10, size=(8, 65)), axis=-1).astype(np.float32)
        weights = rng.uniform(0, 1, size=(8, 64)).astype(np.float32)
        weights[3] *= 1e-7  # exercise the eps-padding branch
        ours = jmip.sorted_piecewise_constant_pdf(
            jax.random.PRNGKey(0), jnp.asarray(bins), jnp.asarray(weights),
            64, randomized=False)
        theirs = ref_mip.sorted_piecewise_constant_pdf(
            t(bins), t(weights).clone(), 64, randomized=False)
        allclose(ours, theirs, rtol=1e-5, atol=1e-5)

    def test_sample_along_rays_nonrandom(self, rng):
        """Covers cast_rays -> conical_frustum_to_gaussian -> lift_gaussian."""
        B = 6
        origins = rng.normal(size=(B, 3)).astype(np.float32)
        dirs = rng.normal(size=(B, 3)).astype(np.float32)
        radii = rng.uniform(1e-3, 1e-2, size=(B, 1)).astype(np.float32)
        near = np.full((B, 1), 0.1, np.float32)
        far = np.full((B, 1), 8.0, np.float32)
        t_j, (m_j, c_j) = jmip.sample_along_rays(
            jax.random.PRNGKey(0), jnp.asarray(origins), jnp.asarray(dirs),
            jnp.asarray(radii), 16, jnp.asarray(near), jnp.asarray(far),
            randomized=False, disparity=False)
        t_t, (m_t, c_t) = ref_mip.sample_along_rays(
            t(origins), t(dirs), t(radii), 16, t(near), t(far),
            randomized=False, disparity=False, ray_shape="cone")
        allclose(t_j, t_t)
        allclose(m_j, m_t, rtol=1e-4, atol=1e-5)
        allclose(c_j, c_t, rtol=1e-4, atol=1e-6)

    def test_resample_along_rays_nonrandom(self, rng):
        B, N = 5, 16
        origins = rng.normal(size=(B, 3)).astype(np.float32)
        dirs = rng.normal(size=(B, 3)).astype(np.float32)
        radii = rng.uniform(1e-3, 1e-2, size=(B, 1)).astype(np.float32)
        t_samples = np.sort(rng.uniform(0.1, 8, size=(B, N + 1)),
                            axis=-1).astype(np.float32)
        weights = rng.uniform(0, 1, size=(B, N)).astype(np.float32)
        t_j, (m_j, c_j) = jmip.resample_along_rays(
            jax.random.PRNGKey(0), jnp.asarray(origins), jnp.asarray(dirs),
            jnp.asarray(radii), jnp.asarray(t_samples), jnp.asarray(weights),
            randomized=False, stop_grad=True, resample_padding=0.01)
        t_t, (m_t, c_t) = ref_mip.resample_along_rays(
            t(origins), t(dirs), t(radii), t(t_samples), t(weights),
            randomized=False, ray_shape="cone", stop_grad=True,
            resample_padding=0.01)
        allclose(t_j, t_t, rtol=1e-5, atol=1e-5)
        allclose(m_j, m_t, rtol=1e-4, atol=1e-4)
        allclose(c_j, c_t, rtol=1e-4, atol=1e-5)


class TestRendering:
    @pytest.mark.parametrize("white_bkgd", [False, True])
    def test_volumetric_rendering(self, rng, white_bkgd):
        B, N = 7, 16
        rgb = rng.uniform(0, 5, size=(B, N, 3)).astype(np.float32)
        density = rng.uniform(0, 2, size=(B, N, 1)).astype(np.float32)
        t_samples = np.sort(rng.uniform(0.1, 8, size=(B, N + 1)),
                            axis=-1).astype(np.float32)
        dirs = rng.normal(size=(B, 3)).astype(np.float32)
        ours = jmip.volumetric_rendering(
            jnp.asarray(rgb), jnp.asarray(density), jnp.asarray(t_samples),
            jnp.asarray(dirs), white_bkgd)
        theirs = ref_mip.volumetric_rendering(
            t(rgb), t(density), t(t_samples), t(dirs), white_bkgd)
        for j, th in zip(ours, theirs):
            allclose(j, th, rtol=1e-4, atol=1e-5)

    def test_aces_tonemap_float(self, rng):
        x = rng.uniform(0.01, 20, size=(5, 3)).astype(np.float32)
        ours = jshading.hdr_to_ldr(jnp.asarray(x))
        theirs = ref_sr.hdr_to_ldr(t(x))
        allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    def test_aces_tonemap_uint8(self, rng):
        x = rng.uniform(0.01, 20, size=(5, 3)).astype(np.float32)
        ours = jshading.hdr_to_ldr(jnp.asarray(x), quantize=True)
        theirs = ref_sr.hdr_to_ldr(t(x), dtype="uint8")
        allclose(ours, theirs, rtol=1e-6, atol=1e-6)

    def test_aces_tonemap_zero_deviation(self):
        """DELIBERATE DEVIATION: at exactly 0 radiance the rebuild clamps to
        1e-10 before the gamma pow so the pow gradient is finite under jit;
        the value difference is ~2.8e-5 (invisible at 8 bits) and the
        reference value is exactly 0."""
        zero = jnp.zeros((1, 3))
        ours = jshading.hdr_to_ldr(zero)
        theirs = ref_sr.hdr_to_ldr(torch.zeros(1, 3))
        assert float(theirs.max()) == 0.0
        assert float(jnp.max(ours)) < 5e-5  # tiny, nonzero by design

    def test_surface_rendering_lambertian(self, rng):
        B, D = 6, 10
        env = rng.uniform(0, 3, size=(B, D, 3)).astype(np.float32)
        albedo = rng.uniform(0, 1, size=(B, 3)).astype(np.float32)
        normal = rng.normal(size=(B, 3)).astype(np.float32)
        normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
        l = rng.normal(size=(B, D, 3)).astype(np.float32)
        l /= np.linalg.norm(l, axis=-1, keepdims=True)
        v = rng.normal(size=(B, 3)).astype(np.float32)
        sa = np.full((1, D, 1), 4 * np.pi / D, np.float32)
        ours = jshading.surface_rendering(
            jnp.asarray(env), jnp.asarray(albedo), jnp.asarray(normal), None,
            jnp.asarray(l), jnp.asarray(v), jnp.asarray(sa))
        rgb_t, dif_t, spec_t, shade_t = ref_sr.surface_rendering(
            t(env), t(albedo), t(normal), None, t(l), t(v), t(sa),
            output_sd=True)
        allclose(ours[0], rgb_t, rtol=1e-4, atol=1e-5)
        allclose(ours[1], dif_t, rtol=1e-4, atol=1e-5)
        allclose(ours[2], spec_t, rtol=1e-4, atol=1e-5)
        allclose(ours[3], shade_t, rtol=1e-4, atol=1e-5)

    def test_surface_rendering_ggx(self, rng):
        B, D = 6, 10
        env = rng.uniform(0, 3, size=(B, D, 3)).astype(np.float32)
        albedo = rng.uniform(0, 1, size=(B, 3)).astype(np.float32)
        normal = rng.normal(size=(B, 3)).astype(np.float32)
        normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
        rough = rng.uniform(0.1, 1, size=(B, 1)).astype(np.float32)
        l = rng.normal(size=(B, D, 3)).astype(np.float32)
        l /= np.linalg.norm(l, axis=-1, keepdims=True)
        v = rng.normal(size=(B, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        sa = np.full((1, D, 1), 4 * np.pi / D, np.float32)
        ours = jshading.surface_rendering(
            jnp.asarray(env), jnp.asarray(albedo), jnp.asarray(normal),
            jnp.asarray(rough), jnp.asarray(l), jnp.asarray(v),
            jnp.asarray(sa))
        rgb_t, dif_t, spec_t = ref_sr.surface_rendering(
            t(env), t(albedo), t(normal), t(rough), t(l), t(v), t(sa))
        allclose(ours[0], rgb_t, rtol=1e-3, atol=1e-4)
        allclose(ours[1], dif_t, rtol=1e-4, atol=1e-5)
        allclose(ours[2], spec_t, rtol=1e-3, atol=1e-4)

    def test_solid_angle_refinement(self):
        ours = jshading.solid_angle_refinement(8, 16)
        theirs = ref_sr.solid_angle_refinement(8, 16, type="torch")
        allclose(ours, theirs, rtol=1e-5, atol=1e-7)
        # Midpoint-rule quadrature of sin(phi) overshoots the 4*pi integral
        # at h=8 by ~0.6%; both implementations agree exactly on it.
        np.testing.assert_allclose(np.asarray(ours).sum(), 4 * np.pi,
                                   rtol=0.01)


class TestSchedule:
    def test_mip_lr_decay(self):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.Adam([p], lr=2e-4)
        sched = ref_lr.MipLRDecay(opt, lr_init=2e-4, lr_final=2e-6,
                                  max_steps=44000, lr_delay_steps=2500,
                                  lr_delay_mult=0.01)
        ours = mip_lr_decay(2e-4, 2e-6, 44000, 2500, 0.01)
        for step in (0, 1, 100, 2500, 10000, 44000, 50000):
            sched.last_epoch = step
            theirs = sched.get_lr()[0]
            np.testing.assert_allclose(float(ours(step)), theirs, rtol=1e-5)


class TestPanoDatasetParity:
    @pytest.fixture(scope="class")
    def scene_dir(self, tmp_path_factory):
        from pano_nerf_tpu.data.synthetic import generate_scene
        d = str(tmp_path_factory.mktemp("refparity_scene"))
        generate_scene(d, n_views=3, height=16, width=32)
        return d

    @pytest.fixture(scope="class")
    def datasets(self, scene_dir):
        from pano_nerf_tpu.data.io_exr import read_exr as our_read_exr
        from pano_nerf_tpu.data.pano_dataset import PanoDataset

        # The reference reads EXRs through the OpenEXR wheel (absent here);
        # route it through our codec, which matches its RGB-planar output.
        orig = ref_pd.read_exr
        ref_pd.read_exr = lambda f: our_read_exr(f)
        try:
            theirs = ref_pd.PanoDataset(
                scene_dir, split="val", batch_type="single_image", factor=1,
                num=[0, 1], range=(0, 10))
        finally:
            ref_pd.read_exr = orig
        ours = PanoDataset(scene_dir, split="val", factor=1, num=[0, 1],
                           range=(0, 10))
        return ours, theirs

    def test_rays_match(self, datasets):
        ours, theirs = datasets
        for field in ("origins", "directions", "viewdirs", "radii",
                      "lossmult", "near", "far", "noise_var"):
            for img_idx in range(len(ours.images)):
                a = np.asarray(getattr(ours.rays, field)[img_idx], np.float32)
                b = np.asarray(getattr(theirs.rays, field)[img_idx],
                               np.float32)
                np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                           err_msg=field)

    def test_images_match(self, datasets):
        ours, theirs = datasets
        for a, b in zip(ours.images, theirs.images):
            np.testing.assert_allclose(a, np.asarray(b, np.float32),
                                       rtol=1e-5, atol=1e-6)
        for a, b in zip(ours.depths, theirs.depths):
            np.testing.assert_allclose(a, np.asarray(b, np.float32),
                                       rtol=1e-5, atol=1e-6)
        for a, b in zip(ours.normals, theirs.normals):
            np.testing.assert_allclose(a, np.asarray(b, np.float32),
                                       rtol=1e-5, atol=1e-5)

    def test_env_rays_match(self, datasets):
        ours, theirs = datasets
        ours_env = ours.generate_lit_rays(num=10, near=0.0, far=10.0)
        # fp16 cast DEVIATION: the reference pre-casts env rays to fp16 for
        # torch AMP (pano_datasets.py:263); ours stays fp32 (the bf16
        # boundary lives inside the model), so compare at fp16 resolution.
        theirs_env = theirs.generate_lit_rays(num=10, near=0, far=10.0)
        for field in ("origins", "directions", "viewdirs", "radii",
                      "lossmult", "near", "far", "noise_var"):
            a = np.asarray(getattr(ours_env, field), np.float32)
            b = getattr(theirs_env, field).float().numpy()
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4,
                                       err_msg=field)
