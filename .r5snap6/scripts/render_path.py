"""Render a novel-view panorama sequence from a trained checkpoint.

Generates camera poses along an interpolated/spheric/spiral path (the pose
machinery the reference ships in utils/vis.py but never wires up), renders
full panoramas with the trained model, and writes HDR EXRs + tonemapped PNG
frames.

Usage:
  python scripts/render_path.py --data_path /tmp/scene --ckpt_dir EXP_DIR \
      --config configs/panonerf.yaml --out frames/ --n_views 30 --path interp
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pano_nerf_tpu.core.config import parse_args  # noqa: E402
from pano_nerf_tpu.core.rays import Rays  # noqa: E402
from train import prepare_hparams  # noqa: E402


def pano_rays_for_pose(origin: np.ndarray, h: int, w: int, near: float,
                       far: float) -> Rays:
    """Equirect ray bundle for a novel camera position (world axes)."""
    from pano_nerf_tpu.data.pano_dataset import (equirect_camera_dirs,
                                                 equirect_radii)

    dirs, noise = equirect_camera_dirs(h, w)
    origins = np.broadcast_to(origin.astype(np.float32), dirs.shape).copy()
    ones = np.ones_like(dirs[..., :1])
    return Rays(
        origins=origins,
        directions=dirs.astype(np.float32),
        viewdirs=dirs.astype(np.float32),
        radii=equirect_radii(dirs),
        lossmult=ones,
        near=ones * near,
        far=ones * far,
        noise_var=noise.astype(np.float32),
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", required=True)
    parser.add_argument("--ckpt_dir", required=True,
                        help="experiment dir containing checkpoints/")
    parser.add_argument("--out", default="./frames")
    parser.add_argument("--out_dir", default="./exps/")
    parser.add_argument("--n_views", type=int, default=30)
    parser.add_argument("--path", choices=["interp", "spheric"],
                        default="interp")
    parser.add_argument("--video", default=None,
                        help="also stitch the LDR frames into this file "
                             "(.gif works everywhere; .mp4 needs an "
                             "imageio ffmpeg backend — skipped with a "
                             "notice if unavailable)")
    parser.add_argument("--fps", type=int, default=15)
    parser.add_argument("--range", nargs="+", type=float, default=[0, 10])
    parser.add_argument("--config", default="./configs/panonerf.yaml")
    parser.add_argument("--meta_file", default="transforms_all")
    parser.add_argument("--reform_cam", type=int, default=0)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    hparams = prepare_hparams(parse_args(parser))

    import jax

    from pano_nerf_tpu.data.pano_dataset import PanoDataset
    from pano_nerf_tpu.engine.checkpoint import Checkpointer
    from pano_nerf_tpu.engine.system import PanoNeRFSystem, build_system
    from pano_nerf_tpu.engine.validation import render_full_pano
    from pano_nerf_tpu.ops.shading import hdr_to_ldr
    from pano_nerf_tpu.utils.vis import create_spheric_poses, gen_render_path, save_results

    ds = PanoDataset(hparams["data_path"], split="train",
                     factor=hparams["train.factor"],
                     num=hparams["train.sample_num"], range=hparams["range"],
                     meta_file=hparams["meta_file"])
    system = build_system(hparams)
    if isinstance(system, PanoNeRFSystem):
        system.set_env_rays(ds.generate_lit_rays(
            num=hparams["nerf.num_ray_samples"], far=float(hparams["range"][1])))

    state = system.create_state(jax.random.PRNGKey(0))
    state = Checkpointer(
        os.path.join(hparams["ckpt_dir"], "checkpoints")).restore(state)
    print(f"[render_path] restored step {int(jax.device_get(state.step))}")

    c2ws = np.stack([np.asarray(m) for m in ds.camtoworlds])  # [N, 4, 4]
    if hparams["path"] == "interp":
        path_poses = gen_render_path(c2ws, n_views=hparams["n_views"])
        origins = path_poses[:, :3, 3]
    else:
        radius = float(np.linalg.norm(c2ws[:, :3, 3], axis=-1).mean() + 0.3)
        origins = create_spheric_poses(
            max(radius, 0.3), n_poses=hparams["n_views"])[:, :3, 3]

    render_fn = system.make_render_image(
        enable_surf=isinstance(system, PanoNeRFSystem))
    near, far = hparams["range"]
    os.makedirs(hparams["out"], exist_ok=True)
    ldr_frames = []
    for i, origin in enumerate(origins):
        rays = pano_rays_for_pose(np.asarray(origin), ds.h, ds.w, near, far)
        products = render_full_pano(render_fn, state.params, rays, ds.h, ds.w)
        ldr = np.asarray(hdr_to_ldr(products["rgb_fine"]))
        save_results(products["rgb_fine"],
                     os.path.join(hparams["out"], f"{i:04d}.exr"))
        save_results(ldr, os.path.join(hparams["out"], f"{i:04d}.png"))
        if hparams.get("video"):
            ldr_frames.append(
                (np.clip(ldr, 0, 1) * 255).astype(np.uint8))
        print(f"[render_path] frame {i + 1}/{len(origins)}")
    print(f"[render_path] wrote {len(origins)} frames to {hparams['out']}")
    if hparams.get("video"):
        try:
            import imageio
            if hparams["video"].lower().endswith(".gif"):
                # GIF writers take per-frame duration (ms), not fps.
                imageio.mimsave(hparams["video"], ldr_frames,
                                duration=1000.0 / int(hparams["fps"]))
            else:
                imageio.mimsave(hparams["video"], ldr_frames,
                                fps=int(hparams["fps"]))
            print(f"[render_path] wrote video {hparams['video']}")
        except Exception as e:  # missing wheel/codec: frames still on disk
            print(f"[render_path] video export skipped "
                  f"({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
