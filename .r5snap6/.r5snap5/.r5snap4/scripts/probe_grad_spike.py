"""Replay a training window from a checkpoint, recording per-step global
gradient norms — sizes optimizer.grad_clip against a real divergence.

Motivation: the view-consistency HDR recipe (vc 0.1, sat 0) hit NaN at
step ~54k of an 88k run while at its best quality (HDR ws-PSNR +2.5 at
the 52k checkpoint). The RNG stream is keyed by state.step, so resuming
the saved checkpoint replays the exact steps that blew up.

Usage:
  python scripts/probe_grad_spike.py \
      --ckpt_dir /tmp/hdr_study88/vc01s0/panonerf_0_1_2 \
      --data_path /tmp/hdr_study88/scene --steps 2500 [--clip 0]
"""

import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", default=None,
                    help="experiment dir with checkpoints/ to resume; "
                         "omit to probe fresh-init (early-training) norms")
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--clip", type=float, default=0.0)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--opts", nargs="*", default=[
        "nerf.env_sampling", "fixed", "loss.view_consistency", "0.1",
        "loss.saturation_loss", "0.0"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from pano_nerf_tpu.core import config as config_lib
    from pano_nerf_tpu.data.pano_dataset import PanoDataset
    from pano_nerf_tpu.engine import losses as losses_lib
    from pano_nerf_tpu.engine.checkpoint import Checkpointer
    from pano_nerf_tpu.engine.system import PanoNeRFSystem, TrainState
    from pano_nerf_tpu.parallel import mesh as mesh_lib

    hp = config_lib.load_config(
        os.path.join(ROOT, "configs", "panonerf.yaml"))
    hp.update({"data_path": args.data_path, "range": (0, 10),
               "train.factor": 1, "val.factor": 1, "seed": args.seed,
               "optimizer.max_steps": 88000,
               # The opt_state template must match the checkpoint: --clip
               # builds the clip into the system's tx (a checkpoint saved
               # with optimizer.grad_clip has the chained 2-tuple state);
               # --clip 0 probes a plain-Adam checkpoint.
               "optimizer.grad_clip": args.clip,
               "parallel.num_devices": 1})
    config_lib.merge_from_list(hp, args.opts)

    system = PanoNeRFSystem(hp, mesh_lib.get_mesh(1))
    ds = PanoDataset(args.data_path, split="train", factor=1,
                     num=[0, 1, 2], range=(0, 10))
    system.set_env_rays(ds.generate_lit_rays(
        num=int(hp["nerf.num_ray_samples"]), near=0.0, far=10.0))
    state = system.create_state(jax.random.PRNGKey(args.seed))
    if args.ckpt_dir:
        state = Checkpointer(
            os.path.join(args.ckpt_dir, "checkpoints")).restore(state)
    start = int(jax.device_get(state.step))
    print(f"# start step {start}", file=sys.stderr)

    dataset = system.put_dataset_on_device(ds.rays, ds.images)
    rays_all, rgbs_all = dataset
    n = rgbs_all.shape[0]
    use_vc = float(hp.get("loss.view_consistency", 0.0)) > 0

    def step_with_norm(state, key):
        step_key = jax.random.fold_in(key, state.step)
        k_idx, k_model = jax.random.split(step_key)
        idx = jax.random.randint(k_idx, (args.batch,), 0, n)
        rays = jax.tree.map(lambda x: x[idx], rays_all)
        rgbs = rgbs_all[idx]

        def loss_fn(params):
            outs = system.model(
                params, k_model, rays, system.env_rays,
                randomized=True, white_bkgd=False, enable_surf=True,
                use_ort_loss=hp["loss.ort_loss"] > 0, use_vc_loss=use_vc)
            parts = losses_lib.pano_losses(outs, rgbs[..., :3],
                                           rays.lossmult, hp, True)
            return parts["loss"], parts

        (loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        gnorm = optax.global_norm(grads)
        return system._apply_updates(state, grads), loss, gnorm

    step_fn = jax.jit(step_with_norm, donate_argnums=(0,))
    key = jax.random.PRNGKey(args.seed + 1)

    CHUNK = 100
    norms = []
    for base in range(0, args.steps, CHUNK):
        chunk_norms, chunk_losses = [], []
        for _ in range(CHUNK):
            state, loss, gnorm = step_fn(state, key)
            chunk_norms.append(gnorm)
            chunk_losses.append(loss)
        gn = np.asarray(jax.device_get(chunk_norms))
        ls = np.asarray(jax.device_get(chunk_losses))
        norms.append(gn)
        print(f"[{start + base + CHUNK}] gnorm med={np.median(gn):.4f} "
              f"p99={np.percentile(gn, 99):.4f} max={gn.max():.4f} "
              f"loss_max={ls.max():.5f} nan={int(np.isnan(ls).sum())}",
              flush=True)
        if np.isnan(ls).any() or np.isnan(gn).any():
            print("# NaN reached", file=sys.stderr)
            break
    gn = np.concatenate(norms)
    finite = gn[np.isfinite(gn)]
    print(json.dumps({
        "start_step": start, "steps_run": int(gn.size),
        "clip": args.clip,
        "gnorm_median": float(np.median(finite)),
        "gnorm_p99": float(np.percentile(finite, 99)),
        "gnorm_max": float(finite.max()),
        "hit_nan": bool(np.isnan(gn).any()),
    }))


if __name__ == "__main__":
    main()
