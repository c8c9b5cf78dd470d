"""Dataset-layer tests: EXR codec, pano loader on a synthetic scene, the
perspective loaders (Blender / Multicam / RealData360 with COLMAP binary),
and env-ray generation."""

import json
import os
import struct

import numpy as np
import pytest

from pano_nerf_tpu.data import io_exr
from pano_nerf_tpu.data.pano_dataset import (PanoDataset, equirect_camera_dirs,
                                             generate_lit_rays)
from pano_nerf_tpu.data.perspective_datasets import (Blender, Multicam,
                                                     RealData360,
                                                     read_colmap_intrinsics,
                                                     recenter_poses,
                                                     spherify_poses)
from pano_nerf_tpu.data.synthetic import BOX, generate_scene


class TestExrCodec:
    @pytest.mark.parametrize("pixel_type", ["float", "half"])
    @pytest.mark.parametrize("compression", ["zip", "none"])
    def test_roundtrip(self, tmp_path, pixel_type, compression):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 30, (21, 33, 3)).astype(np.float32)
        f = str(tmp_path / "x.exr")
        io_exr.write_exr(f, img, pixel_type=pixel_type,
                         compression=compression)
        back = io_exr.read_exr(f)
        expect = (img if pixel_type == "float"
                  else img.astype(np.float16).astype(np.float32))
        np.testing.assert_allclose(back, expect, atol=1e-6)

    def test_file_object_read(self, tmp_path):
        img = np.ones((4, 8, 3), np.float32)
        f = str(tmp_path / "x.exr")
        io_exr.write_exr(f, img)
        with open(f, "rb") as fp:
            back = io_exr.read_exr(fp)
        np.testing.assert_allclose(back, 1.0)

    def test_single_channel_replicates(self, tmp_path):
        img = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
        f = str(tmp_path / "d.exr")
        io_exr.write_exr(f, img, pixel_type="float")
        back = io_exr.read_exr(f)
        np.testing.assert_allclose(back[..., 0], img[..., 0], atol=1e-6)
        np.testing.assert_allclose(back[..., 1], back[..., 0])


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scene"))
    generate_scene(d, n_views=4, height=16, width=32)
    return d


class TestPanoDataset:
    def test_train_split_flattens(self, scene_dir):
        ds = PanoDataset(scene_dir, split="train", factor=1, num=[0, 1, 2],
                         range=(0, 10))
        assert ds.num_rays == 3 * 16 * 32
        assert ds.rays.origins.shape == (ds.num_rays, 3)

    def test_val_split_holds_out(self, scene_dir):
        ds = PanoDataset(scene_dir, split="val", factor=1, num=[0, 1, 2],
                         range=(0, 10))
        assert len(ds) == 1  # 4 views minus 3 train
        rays, img, dep, nor, alb = ds[0]
        assert img.shape == (16, 32, 3)
        assert rays.origins.shape == (16, 32, 3)

    def test_depth_consistency(self, scene_dir):
        """Marching each ray to its GT depth must land on a box wall."""
        ds = PanoDataset(scene_dir, split="train", factor=1, num=[0, 1],
                         range=(0, 10))
        it = ds.iter_batches(256, seed=0)
        rays, img, dep, nor, alb = next(it)
        pts = rays.origins + rays.viewdirs * dep
        ratio = np.max(np.abs(pts) / BOX[None], axis=-1)
        np.testing.assert_allclose(ratio, 1.0, atol=1e-3)

    def test_iter_batches_covers_epoch(self, scene_dir):
        ds = PanoDataset(scene_dir, split="train", factor=1, num=[0],
                         range=(0, 10))
        it = ds.iter_batches(128, seed=0)
        seen = 0
        for _ in range(ds.num_rays // 128):
            batch = next(it)
            seen += batch[1].shape[0]
        assert seen == (ds.num_rays // 128) * 128

    def test_equirect_directions(self):
        dirs, noise = equirect_camera_dirs(8, 16)
        np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0,
                                   rtol=1e-5)
        # Top row looks up (+y), bottom row looks down.
        assert dirs[0, :, 1].mean() > 0.9
        assert dirs[-1, :, 1].mean() < -0.9

    def test_white_bkgd_composites_onto_white(self, scene_dir):
        """white_bkgd composites every material as rgb*last + (1-last),
        where `last` is the blue channel (the reference reader never loads
        alpha — /root/reference/datasets/pano_datasets.py:82-83 with
        utils/io_exr.py:20-23)."""
        plain = PanoDataset(scene_dir, split="val", factor=1, num=[0, 1, 2],
                            range=(0, 10), white_bkgd=False)
        comp = PanoDataset(scene_dir, split="val", factor=1, num=[0, 1, 2],
                           range=(0, 10), white_bkgd=True)
        raw = plain.images[0]
        # Invert the image branch's clip to recover the loaded pixels; the
        # scene generator emits values well inside [0, 1000] so clip is a
        # no-op here.
        alpha = raw[..., -1:]
        expect = raw[..., :3] * alpha + (1.0 - alpha)
        np.testing.assert_allclose(comp.images[0], expect, rtol=1e-5,
                                   atol=1e-6)
        # Albedo material gets the same treatment.
        a_raw = plain.albedos[0]
        a_alpha = a_raw[..., -1:]
        np.testing.assert_allclose(
            comp.albedos[0], a_raw[..., :3] * a_alpha + (1.0 - a_alpha),
            rtol=1e-5, atol=1e-6)

    def test_env_rays_solid_angle(self):
        env = generate_lit_rays(num=10, far=10.0)
        np.testing.assert_allclose(env.lossmult.sum(), 4 * np.pi, rtol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(env.directions, axis=-1),
                                   1.0, rtol=1e-4)


def _write_blender_scene(root, n=3, h=8, w=8):
    from PIL import Image
    os.makedirs(os.path.join(root, "r"), exist_ok=True)
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        frames = []
        for i in range(n):
            img = (rng.uniform(0, 255, (h, w, 4))).astype(np.uint8)
            fname = f"r/{split}_{i}"
            Image.fromarray(img, "RGBA").save(os.path.join(root, fname + ".png"))
            c2w = np.eye(4)
            c2w[:3, 3] = rng.uniform(-1, 1, 3)
            frames.append({"file_path": fname,
                           "transform_matrix": c2w.tolist()})
        meta = {"camera_angle_x": 0.8, "frames": frames}
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as fp:
            json.dump(meta, fp)


class TestBlender:
    def test_loads_and_flattens(self, tmp_path):
        root = str(tmp_path)
        _write_blender_scene(root)
        ds = Blender(root, split="train", white_bkgd=True)
        assert ds.num_rays == 3 * 8 * 8
        rays, img = ds[0]
        assert rays.origins.shape == (3,)
        vd = np.linalg.norm(np.asarray(ds.rays.viewdirs), axis=-1)
        np.testing.assert_allclose(vd, 1.0, rtol=1e-5)


def _write_multicam_scene(root, n=2, h=8, w=8):
    from PIL import Image
    os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
    rng = np.random.default_rng(0)
    meta = {"file_path": [], "pix2cam": [], "cam2world": [], "width": [],
            "height": [], "lossmult": [], "near": [], "far": []}
    for i in range(n):
        img = (rng.uniform(0, 255, (h, w, 4))).astype(np.uint8)
        rel = f"imgs/{i}.png"
        Image.fromarray(img, "RGBA").save(os.path.join(root, rel))
        meta["file_path"].append(rel)
        pix2cam = np.array([[1 / 10, 0, -w / 20], [0, -1 / 10, h / 20],
                            [0, 0, -1]])
        c2w = np.eye(4)
        c2w[:3, 3] = [i, 0, 0]
        meta["pix2cam"].append(pix2cam.tolist())
        meta["cam2world"].append(c2w.tolist())
        meta["width"].append(w)
        meta["height"].append(h)
        meta["lossmult"].append(1.0)
        meta["near"].append(2.0)
        meta["far"].append(6.0)
    with open(os.path.join(root, "metadata.json"), "w") as fp:
        json.dump({"train": meta, "test": meta}, fp)


class TestMulticam:
    def test_loads(self, tmp_path):
        root = str(tmp_path)
        _write_multicam_scene(root)
        ds = Multicam(root, split="train")
        assert ds.num_rays == 2 * 8 * 8
        np.testing.assert_allclose(np.asarray(ds.rays.near), 2.0)


def _write_colmap_cameras(path_bin, fx=100.0, fy=100.0, cx=4.0, cy=4.0):
    os.makedirs(os.path.dirname(path_bin), exist_ok=True)
    with open(path_bin, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 8, 8))
        f.write(struct.pack("<dddd", fx, fy, cx, cy))


class TestRealData360:
    def test_colmap_reader(self, tmp_path):
        p = str(tmp_path / "sparse" / "0" / "cameras.bin")
        _write_colmap_cameras(p, 123.0, 124.0, 32.0, 16.0)
        K = read_colmap_intrinsics(os.path.dirname(p))
        np.testing.assert_allclose(
            K, [[123.0, 0, 32.0], [0, 124.0, 16.0], [0, 0, 1]])

    def test_pose_utils(self):
        rng = np.random.default_rng(0)
        # Inward-facing ring of cameras (jittered: a perfectly symmetric ring
        # makes the average up-vector vanish and NaNs the look-at construction
        # in this implementation and the reference alike).
        poses = []
        for th in np.linspace(0, 2 * np.pi, 8, endpoint=False):
            pos = np.array([3 * np.cos(th), 3 * np.sin(th),
                            0.5 + 0.2 * rng.uniform()])
            pos[:2] += rng.uniform(-0.2, 0.2, 2)
            z = pos / np.linalg.norm(pos)
            x = np.cross([0, 0, 1.0], z)
            x /= np.linalg.norm(x)
            y = np.cross(z, x)
            hwf = np.array([[8.0], [8.0], [100.0]])
            poses.append(np.concatenate(
                [np.stack([x, y, z, pos], 1), hwf], 1))
        poses = np.stack(poses).astype(np.float32)
        rec = recenter_poses(poses)
        assert np.abs(rec[:, :3, 3].mean(0)).max() < 1.0
        sph = spherify_poses(rec)
        assert sph.shape == poses.shape
        assert np.isfinite(sph).all()

    def test_full_loader(self, tmp_path):
        from PIL import Image
        root = str(tmp_path)
        n, h, w = 9, 8, 8
        os.makedirs(os.path.join(root, "images_2"), exist_ok=True)
        rng = np.random.default_rng(0)
        for i in range(n):
            img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, "images_2", f"{i:03d}.png"))
        poses = np.zeros((n, 3, 5))
        for i, th in enumerate(np.linspace(0, 2 * np.pi, n, endpoint=False)):
            pos = np.array([3 * np.cos(th), 3 * np.sin(th), 0.5])
            z = pos / np.linalg.norm(pos)
            x = np.cross([0, 0, 1.0], z); x /= np.linalg.norm(x)
            y = np.cross(z, x)
            # LLFF convention stores [down right back] basis; invert the
            # loader's [r u b] -> concat([p1, -p0, p2]) mapping: store
            # rows as [-up, right, back].
            poses[i, :, 0] = -y
            poses[i, :, 1] = x
            poses[i, :, 2] = z
            poses[i, :, 3] = pos
            poses[i, :, 4] = [h * 2, w * 2, 100.0]
        bounds = np.tile([[1.0, 8.0]], (n, 1))
        arr = np.concatenate([poses.reshape(n, -1), bounds], axis=1)
        np.save(os.path.join(root, "poses_bounds.npy"), arr)
        _write_colmap_cameras(
            os.path.join(root, "sparse", "0", "cameras.bin"))

        ds = RealData360(root, split="train", factor=2)
        assert ds.n_examples == n - (n + 7) // 8  # every 8th held out
        assert ds.num_rays == ds.n_examples * h * w
        vd = np.linalg.norm(np.asarray(ds.rays.viewdirs), axis=-1)
        np.testing.assert_allclose(vd, 1.0, rtol=1e-4)


class TestSceneVariants:
    """SceneSpec parameterization of the synthetic generator: the default
    spec must reproduce the original box room BITWISE (benchmarks and the
    quality anchors in NOTES.md are measured on it), and alternate variants
    must place their emitters where the spec says."""

    def test_default_spec_is_canonical_scene(self):
        from pano_nerf_tpu.data.synthetic import (SceneSpec, SCENE_VARIANTS,
                                                  render_pano)
        q = render_pano(np.array([0.1, -0.05, 0.2]), 32, 64)
        # Golden invariants of the original generator: single ceiling
        # emitter at radiance (9.0, 8.4, 7.2), albedo in [0.05, 0.8].
        img = q["image"]
        lit = img.max(-1) > 4.0
        assert lit.any()
        np.testing.assert_array_equal(img[lit],
                                      np.tile([9.0, 8.4, 7.2],
                                              (lit.sum(), 1)).astype(
                                                  np.float32))
        assert (q["albedo"] >= 0.05 - 1e-6).all()
        assert (q["albedo"] <= 0.8 + 1e-6).all()
        assert SCENE_VARIANTS["default"] == SceneSpec()

    def test_wall_variant_two_emitters(self):
        from pano_nerf_tpu.data.synthetic import SCENE_VARIANTS, render_pano
        spec = SCENE_VARIANTS["wall"]
        q = render_pano(np.array([0.0, 0.0, 0.0]), 64, 128, spec)
        img = q["image"].reshape(-1, 3)
        for e in spec.emitters:
            rad = np.asarray(e.radiance, np.float32)
            hit = np.all(img == rad, axis=-1)
            assert hit.any(), f"emitter {e} not visible"
        # partial saturation: R above the ACES knee, B below
        assert img.max(0)[0] > 7.25 and spec.emitters[0].radiance[2] < 7.24

    def test_checker_variant_spatial_chroma(self):
        """The checker variant must vary albedo CHROMA within a face
        (the property that stresses the albedo-chroma priors); the wave
        default must have exactly constant within-face chroma. Checker
        albedo stays a deterministic function of the world point
        (multi-view-consistent)."""
        from pano_nerf_tpu.data.synthetic import (SCENE_VARIANTS, SceneSpec,
                                                  _albedo_at, render_pano)
        assert SCENE_VARIANTS["checker"] == SceneSpec(albedo_mode="checker")
        rng = np.random.default_rng(0)
        pts = np.column_stack([np.full(300, 2.0),
                               rng.uniform(-1.5, 1.5, 300),
                               rng.uniform(-2.5, 2.5, 300)])
        face = np.ones(300, dtype=np.int64)
        for mode, want_var in (("wave", False), ("checker", True)):
            a = _albedo_at(pts, face, mode)
            c = a / a.sum(-1, keepdims=True)
            assert (c.std(0).max() > 0.05) == want_var, mode
            assert (a >= 0.05 - 1e-6).all() and (a <= 0.8 + 1e-6).all()
        np.testing.assert_array_equal(_albedo_at(pts, face, "checker"),
                                      _albedo_at(pts, face, "checker"))
        with pytest.raises(ValueError, match="albedo_mode"):
            _albedo_at(pts, face, "nope")
        # emitter pixels still carry exact radiance over the checker
        q = render_pano(np.zeros(3), 32, 64, SCENE_VARIANTS["checker"])
        img = q["image"].reshape(-1, 3)
        assert np.all(img == np.float32([9.0, 8.4, 7.2]), axis=-1).any()

    def test_generate_scene_variant_roundtrip(self, tmp_path):
        from pano_nerf_tpu.data.synthetic import generate_scene
        d = str(tmp_path / "wall")
        generate_scene(d, n_views=2, height=16, width=32, variant="wall")
        ds = PanoDataset(d, split="train", factor=1, num=[0],
                         range=(0, 10))
        assert ds.num_rays == 16 * 32

    def test_shadow_variant_occlusion(self):
        """The shadow variant: the occluder column is visible geometry
        (closer-than-wall depth, exact surface hits, camera-facing
        normals) AND gates the direct irradiance term (the floor point
        on the emitter-column line is darker than its unshadowed mirror
        image). Zero occluders must leave every scene bitwise unchanged
        (the default spec comparison below plus the canonical-scene
        golden test above cover that)."""
        from pano_nerf_tpu.data.synthetic import (SCENE_VARIANTS, Occluder,
                                                  SceneSpec, _irradiance_at,
                                                  _trace, render_pano)
        spec = SCENE_VARIANTS["shadow"]
        assert spec == SceneSpec(occluders=(Occluder(),))
        occ = spec.occluders[0]
        c = np.asarray(occ.center)
        h = np.asarray(occ.half)

        from pano_nerf_tpu.data.pano_dataset import equirect_camera_dirs
        dirs, _ = equirect_camera_dirs(64, 128)
        dirs = dirs.reshape(-1, 3).astype(np.float64)
        origins = np.broadcast_to(np.zeros(3), dirs.shape)
        t, pts, face, normals, occ_id = _trace(origins, dirs, spec)
        m = occ_id == 0
        assert m.sum() > 100, "column not visible from the origin"
        resid = np.abs(np.abs(pts[m] - c) - h).min(-1)
        assert resid.max() < 1e-9, "occluder hits off its surface"
        assert (np.sum(dirs[m] * normals[m], -1) < 1e-9).all()

        # Hard shadow: floor point behind the column (on the emitter ->
        # column-center line) vs its mirror image (unshadowed by symmetry
        # of the ambient + cosine terms).
        e_c = np.array([0.0, 1.5, 0.0])
        tdir = np.array([c[0], 0.0, c[2]]) - e_c
        p_sh = e_c + ((-1.5 - e_c[1]) / tdir[1]) * tdir
        p_lit = np.array([-p_sh[0], -1.5, -p_sh[2]])
        up = np.array([[0.0, 1.0, 0.0]] * 2)
        irr = _irradiance_at(spec, np.stack([p_sh, p_lit]), up)
        assert irr[0].sum() < 0.5 * irr[1].sum(), "no shadow cast"

        # Emitter pixels still carry exact radiance; occluder hits never do.
        q = render_pano(np.zeros(3), 64, 128, spec)
        img = q["image"].reshape(-1, 3)
        is_emit = np.all(img == np.float32([9.0, 8.4, 7.2]), axis=-1)
        assert is_emit.any()
        assert not (is_emit & m).any()
