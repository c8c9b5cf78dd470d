"""Tests for spherical helpers, rotations, vis paths, metric aggregates."""

import numpy as np

from pano_nerf_tpu.utils import rotation, spherical, vis
from pano_nerf_tpu.utils.metrics import summarize_metrics


class TestSpherical:
    def test_pano_dirs_unit_norm(self):
        dirs, theta, phi = spherical.sample_dir_by_pano((16, 32))
        np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0,
                                   rtol=1e-5)

    def test_roundtrip_pos_spherical(self):
        dirs, _, _ = spherical.sample_dir_by_pano((8, 16))
        t, p, d = spherical.pos_to_spherical(dirs.reshape(-1, 3))
        rec = spherical.spherical_to_pos(t, p, d[..., 0])
        np.testing.assert_allclose(rec, dirs.reshape(-1, 3), atol=1e-4)

    def test_spherical_to_pixel_range(self):
        dirs, t, p = spherical.sample_dir_by_pano((8, 16))
        t2, p2, _ = spherical.pos_to_spherical(dirs.reshape(-1, 3))
        px = spherical.spherical_to_pixel(t2, p2, (8, 16))
        assert px[:, 0].min() >= 0 and px[:, 0].max() <= 16 + 1e-3
        assert px[:, 1].min() >= 0 and px[:, 1].max() <= 8 + 1e-3

    def test_fibonacci_uniformity(self):
        dirs = spherical.sample_dir_by_uniform(500)
        np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0,
                                   rtol=1e-5)
        # Mean direction of a uniform sphere sample is ~0.
        assert np.abs(dirs.mean(0)).max() < 0.05

    def test_sh_basis_orthonormal(self):
        """Real-SH basis (illuminant field): Monte-Carlo Gram matrix over
        the sphere ~ identity, i.e. 4*pi*E[Y_i Y_j] = delta_ij, for the
        full supported range deg 0..3 (16 bases)."""
        import pytest
        dirs = spherical.sample_dir_by_uniform(20000)
        Y = np.asarray(spherical.sh_basis(dirs, 3))
        assert Y.shape == (20000, 16)
        gram = 4.0 * np.pi * (Y.T @ Y) / Y.shape[0]
        np.testing.assert_allclose(gram, np.eye(16), atol=0.06)
        # degree prefixes agree with the full table
        for deg in range(3):
            np.testing.assert_array_equal(
                np.asarray(spherical.sh_basis(dirs[:64], deg)),
                Y[:64, :(deg + 1) ** 2])
        with pytest.raises(ValueError):
            spherical.sh_basis(dirs[:4], 4)


class TestRotation:
    def test_rotates_origin_to_target(self):
        rng = np.random.default_rng(0)
        targets = rng.standard_normal((64, 3))
        targets /= np.linalg.norm(targets, axis=-1, keepdims=True)
        R = rotation.batched_rot_to_target(targets)
        o = np.array([0.0, 1.0, 0.0])
        got = R @ o
        np.testing.assert_allclose(got, targets, atol=1e-6)

    def test_orthonormal(self):
        rng = np.random.default_rng(1)
        targets = rng.standard_normal((16, 3))
        targets /= np.linalg.norm(targets, axis=-1, keepdims=True)
        R = rotation.batched_rot_to_target(targets)
        eye = R @ np.swapaxes(R, -1, -2)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                                   atol=1e-6)

    def test_antipodal_fallback(self):
        R = rotation.batched_rot_to_target(np.array([[0.0, -1.0, 0.0]]))
        np.testing.assert_allclose(
            R[0], np.array([[1, 0, 0], [0, -1, 0], [0, 0, 1]]), atol=1e-9)

    def test_single_matches_batched(self):
        t = np.array([0.6, 0.0, 0.8])
        np.testing.assert_allclose(
            rotation.rot_to_target(t),
            rotation.batched_rot_to_target(t[None])[0], atol=1e-9)


class TestVisPaths:
    def test_spiral_poses_orthonormal(self):
        poses = vis.create_spiral_poses(np.array([1.0, 1.0, 0.5]), 4.0,
                                        n_poses=24)
        assert poses.shape == (24, 3, 4)
        rot = poses[:, :3, :3]
        eye = rot @ np.swapaxes(rot, -1, -2)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                                   atol=1e-6)

    def test_spheric_poses(self):
        poses = vis.create_spheric_poses(3.0, n_poses=12)
        assert poses.shape == (12, 3, 4)
        # Cameras all sit at the same distance from origin.
        d = np.linalg.norm(poses[:, :3, 3], axis=-1)
        np.testing.assert_allclose(d, d[0], rtol=1e-6)

    def test_gen_render_path_closed(self):
        c2ws = np.stack([np.eye(4)] * 3)
        c2ws[1, :3, 3] = [1, 0, 0]
        c2ws[2, :3, 3] = [0, 1, 0]
        path = vis.gen_render_path(c2ws, n_views=30)
        assert path.shape[0] == 30
        rot = path[:, :3, :3]
        eye = rot @ np.swapaxes(rot, -1, -2)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                                   atol=1e-5)

    def test_stackers(self):
        a = np.ones((4, 6, 3))
        b = np.zeros((4, 6, 1))
        v = vis.vstack_img([a, b])
        assert v.shape == (8, 6, 3)
        h = vis.hstack_img([a, a])
        assert h.shape == (4, 17, 3)  # 6 + 5 separator + 6
        g = vis.stack_frame([a, a, a], hw=(2, 2))
        assert g.shape == (8, 12, 3)

    def test_visualize_depth_range(self):
        d = np.linspace(0, 5, 64).reshape(8, 8)
        img = vis.visualize_depth(d)
        assert img.shape == (8, 8, 3)
        assert img.min() >= 0 and img.max() <= 1


class TestAggregates:
    def test_summarize(self):
        recs = [{"psnr": 20.0, "ssim": 0.5}, {"psnr": 30.0, "ssim": 0.7}]
        out = summarize_metrics(recs)
        assert out == {"psnr": 25.0, "ssim": 0.6}
