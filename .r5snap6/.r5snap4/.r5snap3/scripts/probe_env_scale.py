"""Probe: is the blurred (env-scale) radiance field decoupled from the
fine-scale field the primary views supervise?

Evaluates the SAME secondary rays from a chosen surface point at two IPE
scales — (a) the training irradiance scale (num_env_samples uniform
Gaussians over a long span, ~2-unit-wide per-sample Gaussians) and
(b) the fine scale (dense march) — and prints where the composited mass
sits. On trained checkpoints the env-scale march composites bright
phantom mass at depths where the fine-scale field is empty, and misses
the true emitter (NOTES.md "env-scale probe"): the blurred scale is
supervised only by the irradiance loss, so the optimizer paints radiance
there freely. Reference context: the reference's secondary march
(/root/reference/models/mip.py:154-194) reads the same blurred scale.

Usage:
  python scripts/probe_env_scale.py --data_path <scene> \
      --ckpt_dir <exp>/panonerf_0_1_2 [--point X Y Z] [--dirs 0 3]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # eager probes stay off the tunnel

import jax.numpy as jnp
import numpy as np

from pano_nerf_tpu.core.config import parse_args
from pano_nerf_tpu.engine.trainer import Trainer
from pano_nerf_tpu.ops import mip
from train import prepare_hparams


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--config", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "panonerf.yaml"))
    p.add_argument("--meta_file", default="transforms_all")
    p.add_argument("--reform_cam", type=int, default=0)
    p.add_argument("--range", nargs="+", type=float, default=[0, 10])
    p.add_argument("--point", nargs=3, type=float,
                   default=[1.0, -1.5, 1.25],
                   help="surface point the secondary rays originate from")
    p.add_argument("--dirs", default="0,3",
                   help="comma-separated env-direction indices to detail")
    p.add_argument("--env_far", type=float, default=10.0)
    p.add_argument("--fine_far", type=float, default=4.0)
    p.add_argument("--fine_samples", type=int, default=64)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    h = parse_args(p)

    ckpt_dir = os.path.abspath(h["ckpt_dir"])
    h["out_dir"] = os.path.dirname(ckpt_dir) or "."
    h = prepare_hparams(h)
    h["save_dir"] = ckpt_dir

    tr = Trainer(h)
    state = tr.ckpt.restore(tr.system.create_state(jax.random.PRNGKey(0)))
    params, model, env = state.params, tr.system.model, tr.system.env_rays
    dirs = np.asarray(env.directions)
    print("env dirs:")
    for j, d in enumerate(dirs):
        print(f"  d{j}: {d[0]:+.3f} {d[1]:+.3f} {d[2]:+.3f}")

    pt = np.asarray(h["point"], np.float32)

    def eval_ray(direction, num_samples, far):
        k = jax.random.PRNGKey(0)
        t_s, (m, c), _ = mip.sample_env_rays(
            k, jnp.asarray(pt[None]), jnp.asarray(direction[None]),
            num_samples, jnp.zeros((1, 1)), jnp.full((1, 1), far),
            env.radii[:1], False)
        m = m.reshape(num_samples, 3)[None]
        c = c.reshape(num_samples, 3)[None]
        vb = jnp.asarray(direction[None])
        raw_rgb, raw_den = model._raw_outputs(params, m, c, vb)[:2]
        rgb, den = model._activate_rgb_density(
            raw_rgb, raw_den, jax.random.PRNGKey(1), False)
        vr = mip.volumetric_rendering(
            rgb, den, t_s.reshape(1, num_samples + 1), vb, False)
        return (np.asarray(vr[0])[0], float(vr[1][0]), float(vr[2][0]),
                np.asarray(vr[3])[0], np.asarray(rgb)[0],
                np.asarray(t_s).reshape(-1))

    env_s = model.num_env_samples
    for j in [int(x) for x in str(h["dirs"]).split(",")]:
        d = dirs[j]
        print(f"--- d{j} {d}")
        for num_s, far, tag in (
                (env_s, h["env_far"], f"env-scale S={env_s}"),
                (h["fine_samples"], h["fine_far"],
                 f"fine-scale S={h['fine_samples']}")):
            comp, distance, acc, w, rgb, t_s = eval_ray(d, num_s, far)
            print(f"  [{tag} far={far}] comp "
                  f"{comp[0]:.2f}/{comp[1]:.2f}/{comp[2]:.2f} "
                  f"dist {distance:.2f} acc {acc:.3f}")
            idx = np.argsort(w)[::-1][:4]
            for i in sorted(idx):
                tm = 0.5 * (t_s[i] + t_s[i + 1])
                print(f"    t~{tm:5.2f} w={w[i]:.3f} rgb "
                      f"{rgb[i, 0]:.2f}/{rgb[i, 1]:.2f}/{rgb[i, 2]:.2f}")


if __name__ == "__main__":
    main()
