"""Eval FLOP-cut study: image quality + throughput at reduced eval sample
counts (VERDICT r2 #4).

The eval render kernel runs at its own MLP roofline (NOTES.md), so further
eval throughput must come from cutting model FLOPs. The two knobs
(BaseNeRF.eval_coarse_samples / eval_fine_samples, first-order calls only)
exploit the resampler: the coarse CDF concentrates fine samples where
density lives (/root/reference/models/mip.py:304-352), so eval can march
fewer samples at near-identical image quality. This script measures BOTH
sides of the tradeoff against a real trained checkpoint:

  * validation metrics (LDR/HDR ws-PSNR, SSIM) on the val panorama, and
  * sustained render throughput (evolving params each rep — the axon
    tunnel caches identical executions, CLAUDE.md gotcha),

for a list of (coarse, fine) eval-count variants. One JSON line per
variant + a summary line.

Usage:
  python scripts/eval_flop_cut.py \
      --ckpt_dir /tmp/hdr_study/refx2/panonerf_0_1_2 \
      --data_path /tmp/hdr_study/scene --variants 0,0 48,48 32,32
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", required=True,
                    help="experiment dir containing checkpoints/")
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--config",
                    default=os.path.join(ROOT, "configs", "panonerf.yaml"))
    ap.add_argument("--variants", nargs="+", default=["0,0", "48,48", "32,32"],
                    help="each 'coarse,fine[,env]' eval sample counts "
                         "(0 = train-time count)")
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--env_dirs", type=int, default=10)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax

    from pano_nerf_tpu.core.config import load_config
    from pano_nerf_tpu.data.pano_dataset import PanoDataset
    from pano_nerf_tpu.engine import validation as val_lib
    from pano_nerf_tpu.engine.checkpoint import Checkpointer
    from pano_nerf_tpu.engine.system import PanoNeRFSystem
    from pano_nerf_tpu.parallel import mesh as mesh_lib
    import jax.numpy as jnp

    hp = load_config(args.config)
    hp.update({
        "data_path": args.data_path,
        "train.factor": 1, "val.factor": 1,
        "val.chunk_size": args.chunk,
        "nerf.num_ray_samples": args.env_dirs,
        "parallel.num_devices": 1,
    })

    train_ds = PanoDataset(args.data_path, split="train", factor=1,
                           num=[0, 1, 2], range=(0, 10))
    val_ds = PanoDataset(args.data_path, split="val", factor=1,
                         num=[0, 1, 2], range=(0, 10))
    near, far = 0.0, 10.0

    system = PanoNeRFSystem(hp, mesh_lib.get_mesh(1))
    system.set_env_rays(train_ds.generate_lit_rays(
        num=args.env_dirs, near=near, far=far))
    state = system.create_state(jax.random.PRNGKey(0))
    state = Checkpointer(
        os.path.join(args.ckpt_dir, "checkpoints")).restore(state)
    step = int(jax.device_get(state.step))
    print(f"# restored step {step} from {args.ckpt_dir}", file=sys.stderr)

    base_model = system.model
    rays, gt_rgb, gt_depth, gt_normal, gt_albedo = val_ds[0]
    n_rays = val_ds.h * val_ds.w

    results = []
    for spec in args.variants:
        parts = [int(x) for x in spec.split(",")]
        ec, ef = parts[0], parts[1]
        ee = parts[2] if len(parts) > 2 else 0
        system.model = dataclasses.replace(
            base_model, eval_coarse_samples=ec, eval_fine_samples=ef,
            eval_env_samples=ee)
        render_fn = system.make_render_image(enable_surf=True)

        products = val_lib.render_full_pano(
            render_fn, state.params, rays, val_ds.h, val_ds.w)
        m = val_lib.validation_metrics(
            products, gt_rgb, gt_depth, gt_normal, gt_albedo, near, far)

        # Throughput: evolve params every rep so no cache can serve it.
        params = state.params
        for _ in range(2):
            params = jax.tree.map(
                lambda a: a + jnp.float32(1e-12)
                if a.dtype == jnp.float32 else a, params)
            out = render_fn(params, jax.tree.map(
                lambda x: jnp.asarray(x.reshape(-1, x.shape[-1])), rays))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            params = jax.tree.map(
                lambda a: a + jnp.float32(1e-12)
                if a.dtype == jnp.float32 else a, params)
            out = render_fn(params, jax.tree.map(
                lambda x: jnp.asarray(x.reshape(-1, x.shape[-1])), rays))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps
        row = {
            "variant": spec, "eval_coarse": ec, "eval_fine": ef,
            "eval_env": ee,
            "rays_per_sec": round(n_rays / dt, 1),
            "ms_per_pano": round(dt * 1e3, 1),
            "psnr_ldr_vol": round(float(m["psnr_ldr_vol"]), 3),
            "psnr_hdr_vol": round(float(m["psnr_hdr_vol"]), 3),
            "ssim_ldr_vol": round(float(m["ssim_ldr_vol"]), 4),
        }
        if "psnr_hdr_surf" in m:
            # The env-cut knob touches ONLY the surface products; this is
            # the metric that moves (volumetric ones are bitwise-pinned).
            row["psnr_hdr_surf"] = round(float(m["psnr_hdr_surf"]), 3)
        results.append(row)
        print(json.dumps(row), flush=True)

    base = results[0]
    print(json.dumps({"summary": {
        r["variant"]: {
            "speedup": round(r["rays_per_sec"] / base["rays_per_sec"], 3),
            "d_psnr_ldr": round(r["psnr_ldr_vol"] - base["psnr_ldr_vol"], 3),
            "d_ssim": round(r["ssim_ldr_vol"] - base["ssim_ldr_vol"], 4),
        } for r in results}}))


if __name__ == "__main__":
    main()
