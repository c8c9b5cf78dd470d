"""Capture an xprof trace of the panonerf train step for a model variant.

  python scripts/profile_step.py "use_fused_kernel=True,fused_scope='fine'" \
      --out /tmp/prof_fine --batch 512 --steps 30

Then parse with scripts/parse_xprof.py (op-level time table).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_ab import parse_overrides  # noqa: E402  (same directory)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--scan", type=int, default=1,
                    help="steps_per_call (lax.scan multi-step)")
    args = ap.parse_args()

    import dataclasses
    import time

    import jax
    import numpy as np

    from __graft_entry__ import _make_rays, _tiny_hparams
    from pano_nerf_tpu.data.pano_dataset import generate_lit_rays
    from pano_nerf_tpu.engine.system import PanoNeRFSystem
    from pano_nerf_tpu.parallel import mesh as mesh_lib

    hp = _tiny_hparams(args.batch)
    hp.update({"nerf.num_samples": 64, "nerf.num_env_samples": 10,
               "nerf.num_ray_samples": 10})
    ov = parse_overrides(args.variant)
    # Dot-keys are hparam overrides (same convention as bench_ab.py).
    hp.update({k: v for k, v in ov.items() if "." in k})
    ov = {k: v for k, v in ov.items() if "." not in k}
    system = PanoNeRFSystem(hp, mesh_lib.get_mesh(1))
    if ov:
        system.model = dataclasses.replace(system.model, **ov)
    system.set_env_rays(generate_lit_rays(num=10, far=10.0))
    state = system.create_state(jax.random.PRNGKey(0))
    n_rays = 98_304
    rays = _make_rays(n_rays)
    rng = np.random.default_rng(0)
    rgbs = np.abs(rng.standard_normal((n_rays, 3))).astype(np.float32) * 2.0
    dataset = system.put_dataset_on_device(rays, rgbs)
    step_fn = system.make_train_step_device_data(dataset, enable_surf=True,
                                                 batch_size=args.batch,
                                                 steps_per_call=args.scan)
    key = jax.random.PRNGKey(1)
    for _ in range(5):
        state, parts = step_fn(state, key)
    jax.block_until_ready(state.params)

    jax.profiler.start_trace(args.out)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, parts = step_fn(state, key)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"captured {args.steps} calls x {args.scan} steps in {dt:.3f}s "
          f"({args.batch * args.steps * args.scan / dt:,.0f} rays/s) "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
