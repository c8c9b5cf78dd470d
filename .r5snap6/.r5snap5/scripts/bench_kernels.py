"""Standalone Pallas kernel microbenchmarks on the real chip.

Isolates per-kernel throughput outside the training step so kernel-level
overheads are attributable. Methodology: each measurement is ONE jitted
`lax.fori_loop` that re-invokes the kernel `iters` times with an
input perturbation coupled to the previous output — a single device
dispatch, so neither the axon tunnel's identical-execution cache nor its
per-dispatch latency can distort the numbers (CLAUDE.md gotcha; the
round-3 first cut of this script measured dispatch floor, not kernels).

  python scripts/bench_kernels.py [--iters 100]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_loop(fn, mc0, iters):
    """One-dispatch timing: fori_loop couples output back into the input."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(mc):
        def body(i, mc):
            out = fn(mc)
            leaf = jax.tree.leaves(out)[0]
            return mc + leaf.astype(jnp.float32).ravel()[0] * 1e-12
        return jax.lax.fori_loop(0, iters, body, mc)

    r = many(mc0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = many(mc0 + 1e-6)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def setup(R, S, seed=0):
    import jax
    import jax.numpy as jnp

    from pano_nerf_tpu.kernels.fused_mlp import pack_params
    from pano_nerf_tpu.models.mlp import NerfMLP
    from pano_nerf_tpu.ops import mip

    key = jax.random.PRNGKey(seed)
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
    M = R * S
    t_mids = 0.5 * (t[..., :-1] + t[..., 1:])
    delta = ((t[..., 1:] - t[..., :-1])
             * jnp.linalg.norm(dirs, axis=-1, keepdims=True))
    mc = jnp.concatenate([means.reshape(-1, 3), covs.reshape(-1, 3),
                          delta.reshape(-1, 1), t_mids.reshape(-1, 1)],
                         axis=1).astype(jnp.float32)
    rayinfo = jnp.concatenate([viewdirs, t[:, :1], t[:, -1:], dirs],
                              axis=1).astype(jnp.float32)
    venc = jnp.broadcast_to(venc27[:, None], (R, S, venc27.shape[-1])
                            ).reshape(M, -1).astype(jnp.bfloat16)
    g8 = jax.random.normal(ks[5], (R, 8))
    gw = jax.random.normal(ks[6], (R, S))
    gout = jax.random.normal(ks[7], (M, 16))
    return dict(mc=mc, rayinfo=rayinfo, venc=venc, packed=packed, g8=g8,
                gw=gw, gout=gout, M=M, R=R, S=S)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--rows", type=int, nargs="+", default=[512, 1024, 2048])
    args = ap.parse_args()

    import jax

    from pano_nerf_tpu.kernels import fused_mlp_ipe as v2
    from pano_nerf_tpu.kernels import fused_mlp_normals as v3
    from pano_nerf_tpu.kernels import fused_render_train as trt

    def mlp_fwd_flops(M):
        return M * 2 * (96 * 256 + 7 * 256 * 256 + 256 * 16 + 256 * 256
                        + (256 + 27) * 128 + 128 * 16)

    for R, S, tag in [(512, 64, "coarse-shape"), (5120, 10, "env-shape")]:
        d = setup(R, S)
        M = d["M"]
        base = mlp_fwd_flops(M)
        print(f"== {tag}: R={R} S={S} M={M}", flush=True)

        def report(name, dt, mult):
            print(f"  {name:40s} {dt * 1e6:9.1f} us  "
                  f"{base * mult / dt / 1e12:6.1f} TF/s-equiv", flush=True)

        dt = timed_loop(lambda m: v2._call_forward(
            m, d["venc"], d["packed"], 16, 0), d["mc"], args.iters)
        report("v2 fwd (no compositing)", dt, 1)
        dt = timed_loop(lambda m: v2._call_backward(
            m, d["venc"], d["packed"], d["gout"], 16, 0), d["mc"],
            args.iters)
        report("v2 bwd (recompute, no compositing)", dt, 3)
        if S == 64:
            out, dsig, acts = jax.jit(lambda m: v3._call_forward(
                m, d["venc"], d["packed"], 16, 0, save_residuals=True)
            )(d["mc"])
            q = jax.random.normal(jax.random.PRNGKey(9), (M, 8))
            dt = timed_loop(lambda m: v3._call_backward(
                m, d["venc"], d["packed"], d["gout"], q, acts, 16, 0),
                d["mc"], args.iters)
            report("v3 bwd (spill, +normals adjoint)", dt, 5)
            # Round-4: merged weight-grad dots (primary + walk
            # contributions in ONE doubled-K contraction per weight).
            try:
                dt = timed_loop(lambda m: v3._call_backward(
                    m, d["venc"], d["packed"], d["gout"], q, acts, 16, 0,
                    fuse_wgrad=True), d["mc"], args.iters)
                report("v3 bwd (spill, FUSED wgrad)", dt, 5)
            except Exception as e:
                print(f"  v3 bwd fused wgrad FAILED {str(e)[:90]}")

        for rows in args.rows:
            try:
                dt = timed_loop(lambda m: trt._call_fwd(
                    m, d["rayinfo"], d["venc"], d["packed"], 16, 0, S,
                    -1.0, 0.0, False, False, rows), d["mc"], args.iters)
                report(f"train fwd rows={rows}", dt, 1)
            except Exception as e:
                print(f"  train fwd rows={rows} FAILED {str(e)[:90]}")
            try:
                dt = timed_loop(lambda m: trt._call_bwd(
                    m, d["rayinfo"], d["venc"], d["packed"], d["g8"],
                    d["gw"], None, 16, 0, S, -1.0, 0.0, False, rows),
                    d["mc"], args.iters)
                report(f"train bwd rows={rows} (recompute)", dt, 3)
            except Exception as e:
                print(f"  train bwd rows={rows} FAILED {str(e)[:90]}")


if __name__ == "__main__":
    main()
