"""Measure the torch reference implementation on THIS host's CPU.

Grounds bench.py's baseline (VERDICT round-1, Missing #2): the reference repo
publishes no numbers and no GPU exists here, so we anchor the comparison with
two like-for-like CPU measurements on identical hardware and an identical
training step:

  * reference torch panonerf training step (models/pano_mip_nerf.py forward +
    systems/panonerf_system.py:15-75 loss math + Adam), fp32 CPU;
  * this repo's jitted panonerf training step, fp32 CPU (single device).

Both use batch `--batch`, 64 samples x 2 levels, 10 env dirs x 10 samples,
surface path + ort + chrom losses enabled. Prints one JSON line with both
rays/s numbers and their ratio.

`--quality-steps N` instead trains the torch reference on a real scene dir
(`--data_path`) for N steps and reports val ws-PSNR (LDR + HDR) and emitter
statistics — the reference-side half of the same-scene quality comparison.

Usage:
  python scripts/bench_reference_torch.py [--batch 512] [--steps 4]
  python scripts/bench_reference_torch.py --data_path /tmp/scene64 \
      --quality-steps 2000 --env-dirs 10
"""

import argparse
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)

# The reference's EXR wheel (OpenEXR/Imath) is absent; stub it and patch
# read_exr with this repo's codec (parity-tested in test_reference_parity.py).
for _name in ("OpenEXR", "Imath"):
    if _name not in sys.modules:
        stub = types.ModuleType(_name)
        stub.InputFile = stub.OutputFile = stub.Header = object
        stub.PixelType = type("PixelType", (), {"FLOAT": 2, "HALF": 1,
                                                "__init__": lambda s, t: None})
        sys.modules[_name] = stub

sys.path.insert(0, REFERENCE)
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from models.pano_mip_nerf import PanoMipNeRF as RefPanoMipNeRF  # noqa: E402
from utils.lr_schedule import MipLRDecay  # noqa: E402
from utils.surface_rendering import hdr_to_ldr as ref_hdr_to_ldr  # noqa: E402
from datasets.base_datasets import Rays as RefRays  # noqa: E402
sys.path.remove(REFERENCE)

import numpy as np  # noqa: E402


def build_ref_model(hp):
    return RefPanoMipNeRF(
        num_samples=hp["nerf.num_samples"],
        num_levels=hp["nerf.num_levels"],
        resample_padding=hp["nerf.resample_padding"],
        stop_resample_grad=hp["nerf.stop_resample_grad"],
        use_viewdirs=hp["nerf.use_viewdirs"],
        disparity=hp["nerf.disparity"],
        ray_shape=hp["nerf.ray_shape"],
        min_deg_point=hp["nerf.min_deg_point"],
        max_deg_point=hp["nerf.max_deg_point"],
        deg_view=hp["nerf.deg_view"],
        density_activation=hp["nerf.density_activation"],
        density_noise=hp["nerf.density_noise"],
        density_bias=hp["nerf.density_bias"],
        rgb_activation=hp["nerf.rgb_activation"],
        alb_activation=hp["nerf.alb_activation"],
        rgb_padding=hp["nerf.rgb_padding"],
        disable_integration=hp["nerf.disable_integration"],
        append_identity=bool(hp["nerf.append_identity"]),
        mlp_net_depth=hp["nerf.mlp.net_depth"],
        mlp_net_width=hp["nerf.mlp.net_width"],
        mlp_net_depth_condition=hp["nerf.mlp.net_depth_condition"],
        mlp_net_width_condition=hp["nerf.mlp.net_width_condition"],
        mlp_skip_index=hp["nerf.mlp.skip_index"],
        mlp_num_rgb_channels=hp["nerf.mlp.num_rgb_channels"],
        mlp_num_density_channels=5,
        mlp_net_activation=hp["nerf.mlp.net_activation"],
        mlp_name="panonerf",
        num_env_samples=hp["nerf.num_env_samples"],
    )


def np_rays_to_torch(rays):
    return RefRays(*(torch.as_tensor(np.asarray(f), dtype=torch.float32)
                     for f in rays))


def ref_training_step(model, rays, env_rays, rgbs, hp, enable_surf=True):
    """Loss math of /root/reference/systems/panonerf_system.py:15-75."""
    ldr_gt = ref_hdr_to_ldr(rgbs[..., :3], dtype="uint8")
    outputs = model(rays=rays, env_rays=env_rays, randomized=True,
                    white_bkgd=False, enable_surf=enable_surf,
                    use_ort_loss=hp["loss.ort_loss"] > 0)
    mask = rays.lossmult
    (rgb_c, *_), (rgb_f, _, ort_loss, _, alb, _, sf_rgb, _, _) = outputs
    rgb_c, rgb_f = ref_hdr_to_ldr(rgb_c), ref_hdr_to_ldr(rgb_f)
    vol_coarse = (mask * (rgb_c - ldr_gt) ** 2).sum() / mask.sum()
    vol_fine = (mask * (rgb_f - ldr_gt) ** 2).sum() / mask.sum()
    loss = hp["loss.coarse_loss_mult"] * vol_coarse + vol_fine
    if enable_surf:
        sf_ldr = ref_hdr_to_ldr(sf_rgb)
        loss = loss + hp["loss.surface_loss"] * (
            (mask * (sf_ldr - ldr_gt) ** 2).sum() / mask.sum())
        if hp["loss.chrom_loss"] > 0:
            chrom = F.normalize(ldr_gt, dim=-1)
            chrom_alb = F.normalize(alb, dim=-1)
            loss = loss + hp["loss.chrom_loss"] * ((chrom - chrom_alb) ** 2).mean()
    if ort_loss is not None:
        loss = loss + hp["loss.ort_loss"] * ort_loss
    return loss


def make_synthetic_batch(batch, seed=0):
    from pano_nerf_tpu.core.rays import Rays
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((batch, 3)).astype(np.float32)
    rays = Rays(
        origins=np.zeros((batch, 3), np.float32),
        directions=d,
        viewdirs=d / np.linalg.norm(d, axis=-1, keepdims=True),
        radii=np.full((batch, 1), 0.01, np.float32),
        lossmult=np.ones((batch, 1), np.float32),
        near=np.zeros((batch, 1), np.float32),
        far=np.full((batch, 1), 10.0, np.float32),
        noise_var=np.zeros((batch, 1), np.float32),
    )
    rgbs = np.abs(rng.standard_normal((batch, 3))).astype(np.float32) * 2.0
    return rays, rgbs


def bench_reference(hp, batch, steps):
    from pano_nerf_tpu.data.pano_dataset import generate_lit_rays
    torch.manual_seed(0)
    model = build_ref_model(hp)
    opt = torch.optim.Adam(model.parameters(), lr=hp["optimizer.lr_init"])
    sched = MipLRDecay(opt, hp["optimizer.lr_init"], 2e-6,
                       hp["optimizer.max_steps"], 2500, 0.01)
    rays_np, rgbs_np = make_synthetic_batch(batch)
    rays = np_rays_to_torch(rays_np)
    # fp32 env rays: the reference pre-casts to fp16 for GPU AMP
    # (pano_datasets.py:263) but fp16 compute is unavailable on CPU.
    env = np_rays_to_torch(generate_lit_rays(
        num=hp["nerf.num_ray_samples"], far=10.0))
    rgbs = torch.as_tensor(rgbs_np)

    # warmup
    loss = ref_training_step(model, rays, env, rgbs, hp)
    opt.zero_grad(); loss.backward(); opt.step(); sched.step()

    t0 = time.perf_counter()
    for _ in range(steps):
        loss = ref_training_step(model, rays, env, rgbs, hp)
        opt.zero_grad(); loss.backward(); opt.step(); sched.step()
    dt = time.perf_counter() - t0
    return batch * steps / dt, float(loss)


def bench_ours_cpu(hp, batch, steps):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pano_nerf_tpu.data.pano_dataset import generate_lit_rays
    from pano_nerf_tpu.engine.system import PanoNeRFSystem
    from pano_nerf_tpu.parallel import mesh as mesh_lib

    hp = dict(hp)
    hp["train.precision"] = "f32"  # bf16 is emulated (slower) on CPU
    system = PanoNeRFSystem(hp, mesh_lib.get_mesh(1))
    system.set_env_rays(generate_lit_rays(
        num=hp["nerf.num_ray_samples"], far=10.0))
    state = system.create_state(jax.random.PRNGKey(0))
    rays_np, rgbs_np = make_synthetic_batch(batch)
    step_fn = system.make_train_step(enable_surf=True)
    import jax.numpy as jnp
    batch_dev = (jax.tree.map(jnp.asarray, rays_np), jnp.asarray(rgbs_np))
    key = jax.random.PRNGKey(1)

    state, _ = step_fn(state, batch_dev, key)  # compile
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, parts = step_fn(state, batch_dev, key)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    return batch * steps / dt, float(jax.device_get(parts["loss"]))


def load_hparams():
    from pano_nerf_tpu.core.config import load_config
    hp = load_config(os.path.join(REPO, "configs", "panonerf.yaml"))
    hp["nerf.num_samples"] = 64
    return hp


def run_steps_to_target(args):
    """Train the torch reference on a scene dir until val LDR ws-PSNR
    crosses --target; report the step count (VERDICT r2 #3: the
    reference-side anchor for the time-to-quality metric).

    Steps-to-quality is hardware-independent, so the 1-core CPU is a valid
    place to measure it; a REDUCED config (scene res / samples / env dirs)
    keeps the wall time feasible — run OUR side at the same reduced config
    (scripts/bench_quality.py with matching overrides) and use the STEP
    RATIO to scale our measured full-config time-to-25dB into a
    reference-side anchor (derivation in BASELINE.md).
    """
    import jax
    jax.config.update("jax_platforms", "cpu")
    import datasets.pano_datasets  # noqa: F401
    import jax.numpy as jnp

    from pano_nerf_tpu.data.io_exr import read_exr as our_read_exr
    from pano_nerf_tpu.data.pano_dataset import PanoDataset
    from pano_nerf_tpu.ops.shading import hdr_to_ldr as our_hdr_to_ldr
    from pano_nerf_tpu.utils import metrics as jmetrics

    sys.modules["utils.io_exr"].read_exr = our_read_exr
    sys.modules["datasets.pano_datasets"].read_exr = our_read_exr

    hp = load_hparams()
    hp["nerf.num_ray_samples"] = args.env_dirs
    hp["nerf.num_samples"] = args.num_samples
    hp["nerf.num_env_samples"] = args.env_samples
    torch.manual_seed(0)

    train_ds = PanoDataset(args.data_path, split="train", factor=1,
                           num=args.views, range=(0, 10))
    val_ds = PanoDataset(args.data_path, split="val", factor=1,
                         num=args.views, range=(0, 10))
    env = np_rays_to_torch(train_ds.generate_lit_rays(
        num=args.env_dirs, far=10.0))
    rays_v, img_gt, *_ = val_ds[0]
    h, w = img_gt.shape[:2]
    flat = [np.asarray(getattr(rays_v, k)).reshape(
        -1, getattr(rays_v, k).shape[-1]) for k in rays_v._fields]
    gt_ldr = our_hdr_to_ldr(jnp.asarray(img_gt))

    def val_psnr(model):
        preds = []
        with torch.no_grad():
            for s in range(0, h * w, args.chunk):
                chunk = RefRays(*(torch.as_tensor(f[s:s + args.chunk])
                                  for f in flat))
                outs = model(rays=chunk, env_rays=env, randomized=False,
                             white_bkgd=False, enable_surf=False,
                             use_ort_loss=False)
                preds.append(outs[-1][0].numpy())
        pred = np.concatenate(preds, 0).reshape(h, w, 3)
        return float(jmetrics.ws_psnr(
            our_hdr_to_ldr(jnp.asarray(pred)), gt_ldr))

    model = build_ref_model(hp)
    opt = torch.optim.Adam(model.parameters(), lr=hp["optimizer.lr_init"])
    sched = MipLRDecay(opt, hp["optimizer.lr_init"], 2e-6, args.max_steps,
                       120, 0.01)
    it = train_ds.iter_batches(args.batch, seed=0)
    t0 = time.time()
    curve, hit = [], None
    for step in range(1, args.max_steps + 1):
        rays_np, rgbs_np, *_ = next(it)
        loss = ref_training_step(model, np_rays_to_torch(rays_np), env,
                                 torch.as_tensor(rgbs_np), hp,
                                 enable_surf=True)
        opt.zero_grad(); loss.backward(); opt.step(); sched.step()
        if step % args.val_every == 0:
            p = val_psnr(model)
            curve.append((step, round(p, 3)))
            print(f"[ref {step}] ldr_ws_psnr={p:.3f} loss={float(loss):.5f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            if hit is None and p >= args.target:
                hit = step
                break
    result = {
        "mode": "reference_steps_to_target_cpu",
        "target_ldr_ws_psnr": args.target,
        "steps_to_target": hit,
        "batch": args.batch,
        "config": {"num_samples": args.num_samples,
                   "env_dirs": args.env_dirs,
                   "env_samples": args.env_samples,
                   "scene": args.data_path},
        "psnr_curve": curve,
        "wall_seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "REF_STEPS_TO_TARGET.json"), "w") as fp:
        json.dump(result, fp, indent=1)


def run_quality(args):
    """Train the torch reference on a scene dir; report val ws-PSNR."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import datasets.pano_datasets  # noqa: F401  (imported for read_exr patch)
    import jax.numpy as jnp

    from pano_nerf_tpu.data.io_exr import read_exr as our_read_exr
    from pano_nerf_tpu.data.pano_dataset import PanoDataset, generate_lit_rays
    from pano_nerf_tpu.ops.shading import hdr_to_ldr as our_hdr_to_ldr
    from pano_nerf_tpu.utils import metrics as jmetrics

    sys.modules["utils.io_exr"].read_exr = our_read_exr
    sys.modules["datasets.pano_datasets"].read_exr = our_read_exr

    hp = load_hparams()
    hp["nerf.num_ray_samples"] = args.env_dirs
    hp["nerf.num_samples"] = args.num_samples
    torch.manual_seed(0)

    train_ds = PanoDataset(args.data_path, split="train", factor=1,
                           num=args.views, range=(0, 10))
    val_ds = PanoDataset(args.data_path, split="val", factor=1,
                         num=args.views, range=(0, 10))
    env = np_rays_to_torch(train_ds.generate_lit_rays(
        num=args.env_dirs, far=10.0))

    model = build_ref_model(hp)
    opt = torch.optim.Adam(model.parameters(), lr=hp["optimizer.lr_init"])
    sched = MipLRDecay(opt, hp["optimizer.lr_init"], 2e-6, args.quality_steps,
                       2500, 0.01)
    surface_start = int(0.4 * args.quality_steps)

    it = train_ds.iter_batches(args.batch, seed=0)
    t_start = time.time()
    for step in range(args.quality_steps):
        rays_np, rgbs_np, *_ = next(it)
        rays = np_rays_to_torch(rays_np)
        rgbs = torch.as_tensor(rgbs_np)
        loss = ref_training_step(model, rays, env, rgbs, hp,
                                 enable_surf=step >= surface_start)
        opt.zero_grad(); loss.backward(); opt.step(); sched.step()
        if step % max(1, args.quality_steps // 40) == 0:
            print(f"[ref-train {step}/{args.quality_steps}] "
                  f"loss={float(loss):.5f} "
                  f"({(time.time() - t_start):.0f}s)", flush=True)

    # Chunked val render (reference render_image semantics, fine level).
    rays_v, img_gt, *_ = val_ds[0]
    h, w = img_gt.shape[:2]
    flat = [np.asarray(getattr(rays_v, k)).reshape(-1, getattr(rays_v, k).shape[-1])
            for k in rays_v._fields]
    preds = []
    with torch.no_grad():
        for s in range(0, h * w, args.chunk):
            chunk = RefRays(*(torch.as_tensor(f[s:s + args.chunk])
                              for f in flat))
            outs = model(rays=chunk, env_rays=env, randomized=False,
                         white_bkgd=False, enable_surf=True,
                         use_ort_loss=False)
            preds.append(outs[-1][0].numpy())
    pred_hdr = np.concatenate(preds, 0).reshape(h, w, 3)

    pred_hdr_j = jnp.asarray(pred_hdr)
    gt_j = jnp.asarray(img_gt)
    result = {
        "mode": "reference_quality_cpu",
        "steps": args.quality_steps,
        "env_dirs": args.env_dirs,
        "ws_psnr_hdr": float(jmetrics.ws_psnr(pred_hdr_j, gt_j)),
        "ws_psnr_ldr": float(jmetrics.ws_psnr(
            our_hdr_to_ldr(pred_hdr_j), our_hdr_to_ldr(gt_j))),
        "pred_max_radiance": float(pred_hdr.max()),
        "gt_max_radiance": float(np.asarray(img_gt).max()),
        "wall_seconds": round(time.time() - t_start, 1),
    }
    print(json.dumps(result))
    out = os.path.join(REPO, f"REF_QUALITY_d{args.env_dirs}.json")
    with open(out, "w") as fp:
        json.dump(result, fp, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--ours-steps", type=int, default=20)
    ap.add_argument("--quality-steps", type=int, default=0)
    ap.add_argument("--data_path", type=str, default=None)
    ap.add_argument("--env-dirs", type=int, default=10)
    ap.add_argument("--views", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--num-samples", type=int, default=64)
    ap.add_argument("--steps-to-target", action="store_true",
                    help="measure reference steps to --target LDR ws-PSNR")
    ap.add_argument("--target", type=float, default=25.0)
    ap.add_argument("--max_steps", type=int, default=20000)
    ap.add_argument("--val_every", type=int, default=250)
    ap.add_argument("--env-samples", type=int, default=10)
    args = ap.parse_args()

    if args.steps_to_target:
        return run_steps_to_target(args)
    if args.quality_steps:
        return run_quality(args)

    hp = load_hparams()
    ref_rps, ref_loss = bench_reference(hp, args.batch, args.steps)
    ours_rps, our_loss = bench_ours_cpu(hp, args.batch, args.ours_steps)
    print(json.dumps({
        "host": "cpu_1core",
        "batch": args.batch,
        "reference_torch_rays_per_sec": round(ref_rps, 2),
        "ours_jax_rays_per_sec": round(ours_rps, 2),
        "ratio_ours_over_reference_same_cpu": round(ours_rps / ref_rps, 3),
        "reference_loss": ref_loss,
        "ours_loss": our_loss,
    }))


if __name__ == "__main__":
    main()
