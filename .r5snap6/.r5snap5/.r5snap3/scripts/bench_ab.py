"""A/B microbenchmark of the panonerf train step on the real chip.

Compares model-config variants inside ONE process so tunnel variance is
shared. Each variant is a comma-separated list of BaseNeRF field overrides,
e.g.:

  python scripts/bench_ab.py \
      "use_fused_kernel=False" "use_fused_kernel=True" --batch 512

Inputs evolve every step (param updates feed back), so the axon tunnel's
identical-execution cache cannot fake the numbers (CLAUDE.md gotcha).
"""

import argparse
import ast
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(overrides: dict, batch: int, steps: int, warmup: int = 5,
                compiler_options: dict | None = None, scan: int = 1,
                hparams: dict | None = None):
    import jax

    from __graft_entry__ import _make_rays, _tiny_hparams
    from pano_nerf_tpu.data.pano_dataset import generate_lit_rays
    from pano_nerf_tpu.engine.system import PanoNeRFSystem
    from pano_nerf_tpu.parallel import mesh as mesh_lib

    hp = _tiny_hparams(batch)
    hp.update({"nerf.num_samples": 64, "nerf.num_env_samples": 10,
               "nerf.num_ray_samples": 10})
    if hparams:
        hp.update(hparams)
    # Dot-keys in the variant spec are hparam overrides (loss.*, nerf.*);
    # bare names are BaseNeRF dataclass fields.
    hp.update({k: v for k, v in overrides.items() if "." in k})
    overrides = {k: v for k, v in overrides.items() if "." not in k}
    system = PanoNeRFSystem(hp, mesh_lib.get_mesh(1))
    if overrides:
        system.model = dataclasses.replace(system.model, **overrides)
    system.set_env_rays(generate_lit_rays(num=10, far=10.0))
    state = system.create_state(jax.random.PRNGKey(0))

    n_rays = 98_304
    rays = _make_rays(n_rays)
    rng = np.random.default_rng(0)
    rgbs = np.abs(rng.standard_normal((n_rays, 3))).astype(np.float32) * 2.0
    dataset = system.put_dataset_on_device(rays, rgbs)
    step_fn = system.make_train_step_device_data(dataset, enable_surf=True,
                                                 batch_size=batch,
                                                 steps_per_call=scan)
    key = jax.random.PRNGKey(1)
    if compiler_options:
        # Per-executable XLA overrides (e.g. xla_tpu_scoped_vmem_limit_kib
        # controls the fusion-window budget the round-2 batch-scaling cliff
        # traced to) — forwarded to the backend through AOT lower/compile.
        # Incompatible with train.scoped_vmem_kib>0 in the hparams: that
        # knob already AOT-compiles inside _jit_train and returns a plain
        # wrapper without .lower — pass the limit here instead.
        if not hasattr(step_fn, "lower"):
            raise SystemExit(
                "--compiler_opt cannot combine with train.scoped_vmem_kib>0"
                " (the step is already AOT-compiled); express the VMEM"
                " limit as --compiler_opt xla_tpu_scoped_vmem_limit_kib=N")
        step_fn = step_fn.lower(state, key).compile(
            compiler_options=compiler_options)
    for _ in range(warmup):
        state, parts = step_fn(state, key)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, parts = step_fn(state, key)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    return batch * steps * scan / dt, float(jax.device_get(parts["loss"]))


def parse_overrides(spec: str) -> dict:
    out = {}
    if spec.strip():
        for kv in spec.split(","):
            k, v = kv.split("=")
            out[k.strip()] = ast.literal_eval(v.strip())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="+",
                    help="each: 'field=value,field=value' or '' for default")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--scan", type=int, default=1,
                    help="steps_per_call (lax.scan multi-step)")
    ap.add_argument("--compiler_opt", action="append", default=[],
                    help="XLA option KEY=VALUE, repeatable; applied to "
                         "EVERY variant in this invocation")
    ap.add_argument("--hparam", action="append", default=[],
                    help="dot-key hparam override KEY=VALUE (literal_eval'd), "
                         "repeatable; applied to EVERY variant")
    args = ap.parse_args()

    hps = {}
    for kv in args.hparam:
        k, v = kv.split("=", 1)
        try:
            hps[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            hps[k] = v

    copts = {}
    for kv in args.compiler_opt:
        k, v = kv.split("=", 1)
        copts[k] = v

    for r in range(args.repeat):
        for spec in args.variants:
            rps, loss = run_variant(parse_overrides(spec), args.batch,
                                    args.steps, compiler_options=copts,
                                    scan=args.scan, hparams=hps)
            tag = ((spec or "default")
                   + (f" copts={copts}" if copts else "")
                   + (f" hps={hps}" if hps else "")
                   + (f" scan={args.scan}" if args.scan > 1 else ""))
            print(f"[{tag}] batch={args.batch} "
                  f"rays/s={rps:,.0f} loss={loss:.5f}", flush=True)


if __name__ == "__main__":
    main()
