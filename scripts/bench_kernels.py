"""Standalone Pallas kernel microbenchmarks on the real chip.

Isolates per-kernel throughput outside the training step so kernel-level
regressions/overheads are attributable: the v2 forward (pure IPE+MLP) is
the no-compositing baseline; the train fwd/bwd pairs add in-kernel
compositing and its adjoint; the v3 backward is the known-89%-roofline
reference point (NOTES.md). Inputs evolve every iteration (the axon tunnel
caches identical executions — CLAUDE.md gotcha).

  python scripts/bench_kernels.py [--iters 50] [--which all]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, mc0, iters):
    import jax
    mc = mc0
    out = fn(mc)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        mc = mc + 1e-6
        out = fn(mc)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--R", type=int, default=512)
    ap.add_argument("--S", type=int, default=64)
    ap.add_argument("--rows", type=int, nargs="+", default=[512, 1024])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pano_nerf_tpu.kernels import fused_mlp_ipe as v2
    from pano_nerf_tpu.kernels import fused_mlp_normals as v3
    from pano_nerf_tpu.kernels import fused_render_train as trt
    from pano_nerf_tpu.kernels.fused_mlp import pack_params
    from pano_nerf_tpu.models.mlp import NerfMLP
    from pano_nerf_tpu.ops import mip

    R, S = args.R, args.S
    M = R * S
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    means = jax.random.normal(ks[0], (R, S, 3)) * 2
    covs = jnp.abs(jax.random.normal(ks[1], (R, S, 3))) * 0.01
    dirs = jax.random.normal(ks[2], (R, 3))
    viewdirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    t = jnp.sort(jax.random.uniform(ks[3], (R, S + 1)) * 8, axis=-1)
    mlp = NerfMLP(num_density_channels=5, dtype=jnp.bfloat16)
    enc = mip.integrated_pos_enc(means, covs, 0, 16)
    venc27 = mip.pos_enc(viewdirs, 0, 4, True)
    params = mlp.init(ks[4], enc[:1], venc27[:1, None])
    packed = pack_params(params, 5)

    t_mids = 0.5 * (t[..., :-1] + t[..., 1:])
    delta = ((t[..., 1:] - t[..., :-1])
             * jnp.linalg.norm(dirs, axis=-1, keepdims=True))
    mc = jnp.concatenate([means.reshape(-1, 3), covs.reshape(-1, 3),
                          delta.reshape(-1, 1), t_mids.reshape(-1, 1)],
                         axis=1).astype(jnp.float32)
    rayinfo = jnp.concatenate([viewdirs, t[:, :1], t[:, -1:], dirs],
                              axis=1).astype(jnp.float32)
    v = jnp.broadcast_to(venc27[:, None], (R, S, venc27.shape[-1])
                         ).reshape(M, -1).astype(jnp.bfloat16)
    g8 = jax.random.normal(ks[5], (R, trt.OUT8))
    gw = jax.random.normal(ks[6], (R, S))
    gout = jax.random.normal(ks[7], (M, 16))

    flops_fwd = M * 2 * (96 * 256 + 7 * 256 * 256 + 256 * 16 + 256 * 256
                         + (256 + 27) * 128 + 128 * 16)

    def report(name, dt, mult):
        print(f"{name:42s} {dt * 1e6:9.1f} us  "
              f"{flops_fwd * mult / dt / 1e12:6.1f} TF/s-equiv", flush=True)

    # v2 fwd: pure IPE+MLP
    dt = timed(jax.jit(lambda m: v2._call_forward(
        m, v, packed, 16, 0)), mc, args.iters)
    report("v2 fwd (no compositing)", dt, 1)

    # v2 bwd (recompute + MLP backward, no compositing)
    dt = timed(jax.jit(lambda m: v2._call_backward(
        m, v, packed, gout, 16, 0)), mc, args.iters)
    report("v2 bwd (recompute, no compositing)", dt, 3)

    # v3 bwd (acts-spill + normals adjoint) reference point
    out, dsig, acts = jax.jit(lambda m: v3._call_forward(
        m, v, packed, 16, 0, save_residuals=True))(mc)
    dt = timed(jax.jit(lambda m: v3._call_backward(
        m, v, packed, gout, jax.random.normal(key, (M, 8)), acts, 16, 0)),
        mc, args.iters)
    report("v3 bwd (spill, +normals adjoint)", dt, 5)

    for rows in args.rows:
        dt = timed(jax.jit(lambda m: trt._call_fwd(
            m, rayinfo, packed, 16, 0, S, 4, -1.0, 0.0, False, False,
            rows)), mc, args.iters)
        report(f"train fwd rows={rows}", dt, 1)
        dt = timed(jax.jit(lambda m: trt._call_bwd(
            m, rayinfo, packed, g8, gw, None, 16, 0, S, 4, -1.0, 0.0,
            False, rows)), mc, args.iters)
        report(f"train bwd rows={rows} (recompute)", dt, 3)


if __name__ == "__main__":
    main()
