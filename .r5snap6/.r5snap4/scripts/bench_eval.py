"""Eval-path benchmark: full-panorama HDR novel-view rendering throughput.

Measures sustained rays/sec of the chunked eval renderer (coarse+fine
render + normals + full surface/irradiance path per ray — the
`render_image` configuration the validation loop uses) across chunk sizes.
Prints one JSON line with the best configuration.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--chunks", type=int, nargs="+",
                    default=[1024, 4096, 8192])
    ap.add_argument("--variant", default="",
                    help="model overrides 'field=value,...' (see bench_ab)")
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _tiny_hparams
    from pano_nerf_tpu.core.rays import rays_map
    from pano_nerf_tpu.data.pano_dataset import generate_lit_rays
    from pano_nerf_tpu.engine.system import PanoNeRFSystem
    from pano_nerf_tpu.parallel import mesh as mesh_lib
    from scripts.render_path import pano_rays_for_pose
    import jax.numpy as jnp

    # Production model semantics come from the shipped config, exactly as
    # bench.py does for training — sample counts / estimator mode / eval
    # FLOP-cut knobs track what `train.py` validation actually renders.
    from pano_nerf_tpu.core.config import load_config

    hp = _tiny_hparams(512)
    prod = load_config(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "panonerf.yaml"))
    hp.update({k: v for k, v in prod.items()
               if k.startswith(("nerf.", "val."))})

    n_rays = args.height * args.width
    results = {}
    for chunk in args.chunks:
        hp["val.chunk_size"] = chunk
        system = PanoNeRFSystem(hp, mesh_lib.get_mesh(1))
        if args.variant:
            import dataclasses

            from scripts.bench_ab import parse_overrides
            system.model = dataclasses.replace(
                system.model, **parse_overrides(args.variant))
        system.set_env_rays(generate_lit_rays(
            num=int(hp["nerf.num_ray_samples"]), far=10.0))
        state = system.create_state(jax.random.PRNGKey(0))
        render = system.make_render_image(enable_surf=True)

        origin = np.zeros(3)
        rays = pano_rays_for_pose(origin, args.height, args.width, 0.0, 10.0)
        flat = rays_map(lambda x: jnp.asarray(x.reshape(-1, x.shape[-1])),
                        rays)

        params = state.params
        # Warmup must include one EVOLVED-params render: the first call with
        # a freshly-computed param tree triggers a second compile (different
        # buffer donation/layout than the initial device_put tree), which
        # otherwise lands inside the timed loop and understates throughput
        # ~5x (measured: 35k vs 186k rays/s at chunk 4096).
        for _ in range(2):
            params = jax.tree.map(
                lambda a: a + jnp.float32(1e-12) if a.dtype == jnp.float32
                else a, params)
            out = render(params, flat)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 5
        for i in range(reps):
            # evolve params slightly so the run cannot be served from any
            # execution cache
            params = jax.tree.map(
                lambda a: a + jnp.float32(1e-12) if a.dtype == jnp.float32
                else a, params)
            out = render(params, flat)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        results[chunk] = n_rays / dt
        print(f"# chunk {chunk:6d}: {dt * 1e3:8.1f} ms/pano  "
              f"{n_rays / dt:10,.0f} rays/s", file=sys.stderr)

    best_chunk = max(results, key=results.get)
    print(json.dumps({
        "metric": "panonerf_eval_rays_per_sec_per_chip",
        "value": round(results[best_chunk], 1),
        "unit": "rays/s",
        "best_chunk_size": best_chunk,
        "per_chunk": {str(k): round(v, 1) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
