"""Fused render kernel: IPE + MLP + alpha compositing per ray block (eval).

The fused eval profile (NOTES.md) shows the v2/v3 kernels beat XLA on the
MLP math, but ~40% of eval wall-clock is boundary materialization: padded
per-SAMPLE tensors ([rows, 16] f32 tiles physically pad to 128 lanes)
crossing HBM between the kernel and XLA's compositing. This kernel
composites IN VMEM and emits per-RAY outputs only — a 64x smaller
boundary — covering the whole per-level render of the eval path
(reference semantics: models/mip.py:444-483 volumetric rendering +
pano_mip_nerf.py:263-313 activations/normals/expectations).

Design notes (TPU):
* Rows are ray-major: row = ray * S + sample; one block = RPB rays x S
  samples. Per-row scalars (density*delta, weights) live as [rows, 1]
  columns — no transposes.
* The exclusive per-ray cumsum and every per-ray reduction are matmuls
  against iota-synthesized 0/1 matrices (block-triangular segment matrix,
  ray-selection matrix, sample-position matrix) executed as TWO-pass
  hi/lo-split bf16 dots (`_sdot`): ~1.6e-5 rel error at 2 MXU passes.
  (History: one default pass truncates to bf16 at ~3e-3 rel; round 2 used
  Precision.HIGHEST for ~2e-7, but its 6-pass Mosaic lowering measured
  ~an order of magnitude slower than default on these shapes — the
  round-3 kernel study replaced it with the split form.)
* Forward-only (eval): no custom_vjp needed; the training step keeps the
  XLA path, which is at its roofline there (NOTES.md fused-kernel
  decision).

Per-sample normal detail: expected normals normalize each sample's
-d(raw_sigma)/d(means) BEFORE weight-averaging, so the softplus chain
factor cancels and the raw gradient direction suffices
(models/pano_mip_nerf.py `_expected_normals`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pano_nerf_tpu.kernels.fused_mlp import (BF16, F32, OUT_PAD,
                                             PACKED_FIELDS, _dot_nt,
                                             _f32dot, _interpret,
                                             _trunk_forward, pack_params)
from pano_nerf_tpu.kernels.fused_mlp_ipe import (MC_WIDTH, _att_cos,
                                                 _ipe96x, _sel_matrices)
from pano_nerf_tpu.kernels.fused_mlp_normals import _sigma_grad_chain

_N_W, _N_B = 14, 12


def _bdot(a, b):
    return jax.lax.dot_general(a.astype(BF16), b.astype(BF16),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=F32)


def _sdot(a, b, split: str):
    """Near-exact f32 matmul via TWO default bf16 MXU passes.

    `split` names the operand ('a' or 'b') whose values are general f32;
    it is decomposed hi+lo in bf16 (lossless hi, residual lo ~4e-3 rel)
    and contracted in two passes with f32 accumulation — max rel error
    ~1.6e-5, vs ~3e-3 for one pass. The OTHER operand must be exactly
    bf16-representable: here always one of the iota-synthesized 0/1
    selection / triangular matrices or a ones-vector. Round-3 replacement
    for Precision.HIGHEST, whose 6-pass Mosaic lowering measured ~an
    order of magnitude slower than default on these small compositing
    shapes (NOTES.md round-3 kernel study).
    """
    if split == "a":
        hi = a.astype(BF16)
        lo = a - hi.astype(F32)
        return _bdot(hi, b) + _bdot(lo, b)
    hi = b.astype(BF16)
    lo = b - hi.astype(F32)
    return _bdot(a, hi) + _bdot(a, lo)




import os

ROWS_TARGET = int(os.environ.get("PANO_NERF_EVAL_ROWS", "512"))


def rays_per_block(S: int) -> int:
    """Rays per kernel block: ~ROWS_TARGET rows, row count a multiple of 8.

    512 rows measured fastest end-to-end (193-205k rays/s at chunk 4096
    with the round-2 HIGHEST compositing dots; re-check after kernel math
    changes via the PANO_NERF_EVAL_ROWS env hook): larger blocks lose to
    the grid pipeline's double-buffering.
    """
    # Both block shapes must have their second-to-last dim divisible by 8:
    # the row blocks (RPB * S) and the per-ray blocks (RPB).
    rpb = max(8, (ROWS_TARGET // S) // 8 * 8)
    return rpb


def _pe27(d, deg_view: int):
    """Classic NeRF positional encoding with identity, in-kernel.

    d: [rows, >=3] with the (unit) view direction in lanes 0:3. Output
    [rows, 3 + 6*deg_view] matches ops/mip.py::pos_enc's layout
    ([x | sin(xb) | cos(xb)], degree-major) bit-for-bit: phases are exact
    elementwise products against powers of two.
    """
    P = 3 * deg_view
    W = 3 + 2 * P
    col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    j = col - 3
    deg = ((j % P) // 3).astype(F32)
    dim = j % 3
    arg = jnp.where(j >= P, 0.5 * jnp.pi, 0.0)
    ident = jnp.zeros((d.shape[0], W), F32)
    for k in range(3):
        pick = (dim == k) & (col >= 3)
        arg = arg + d[:, k:k + 1] * jnp.where(pick, jnp.exp2(deg), 0.0)
        ident = ident + d[:, k:k + 1] * (col == k)
    return jnp.where(col < 3, ident, jnp.sin(arg))


def _render_kernel(mc_ref, ray_ref, *refs, L: int, min_deg: int,
                   F: int, S: int, RPB: int, C: int, deg_view: int,
                   density_bias: float,
                   rgb_padding: float, white_bkgd: bool, need_normals: bool,
                   need_extras: bool, num_rows: int):
    out_ref = refs[-1]
    ws = {k: r[:] for k, r in zip(PACKED_FIELDS[:_N_W], refs[:_N_W])}
    bs = {k: r[:] for k, r in
          zip(PACKED_FIELDS[_N_W:_N_W + _N_B], refs[_N_W:_N_W + _N_B])}
    rows = RPB * S

    # Ragged final block: out-of-range rows hold undefined bits; zero them
    # at the source or 0 * NaN poisons every matmul reduction downstream.
    row_ids = (pl.program_id(0) * rows
               + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0))
    valid = row_ids < num_rows

    # Per-ray info -> per-row, near-exactly (split dot on [rows, RPB]).
    rsel = (jax.lax.broadcasted_iota(jnp.int32, (rows, RPB), 0) // S
            == jax.lax.broadcasted_iota(jnp.int32, (rows, RPB), 1)
            ).astype(F32)
    ray_ids = (pl.program_id(0) * RPB
               + jax.lax.broadcasted_iota(jnp.int32, (RPB, 1), 0))
    ray = jnp.where(ray_ids * S < num_rows, ray_ref[:], 0.0)  # [RPB, 8]
    vrow = _sdot(rsel, ray, "b")                          # [rows, 8]

    # ---- MLP forward (shared with v2/v3 kernels) ----
    mc = jnp.where(valid, mc_ref[:], 0.0)
    x, x32, att, y = _ipe96x(mc, L, min_deg, F)
    h7, acts = _trunk_forward(x, ws, bs)
    density = _f32dot(h7, ws["wd"]) + bs["bd"]
    btl = (_f32dot(h7, ws["wb"]) + bs["bb"]).astype(BF16)
    v = jnp.where(valid, _pe27(vrow, deg_view), 0.0).astype(BF16)
    zv = _f32dot(btl, ws["wva"]) + _f32dot(v, ws["wvb"]) + bs["bv"]
    hv = jnp.maximum(zv, 0.0).astype(BF16)
    head = (_f32dot(hv, ws["wc"]) + bs["bc"]) + density  # [rows, 16]

    # ---- per-sample activations ----
    delta_col = mc[:, 6:7]
    tmid_col = mc[:, 7:8]
    dd = jax.nn.softplus(head[:, 3:4] + density_bias) * delta_col

    # ---- exclusive per-ray cumsum in [RPB, S] matrix form ----
    # qsel[q, r] = 1 iff row r belongs to ray q; psel[r, s] = 1 iff row r
    # is sample s. All O(rows^2)-free: the largest constant is [rows, S].
    qsel = (jax.lax.broadcasted_iota(jnp.int32, (RPB, rows), 1) // S
            == jax.lax.broadcasted_iota(jnp.int32, (RPB, rows), 0)
            ).astype(F32)
    psel = (jax.lax.broadcasted_iota(jnp.int32, (rows, S), 0) % S
            == jax.lax.broadcasted_iota(jnp.int32, (rows, S), 1)
            ).astype(F32)
    dd_ray = _sdot(qsel, psel * dd, "b")                 # [RPB, S]
    tri = (jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
           < jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)).astype(F32)
    tau_ray = _sdot(dd_ray, tri, "a")                    # exclusive cumsum
    w_ray = (1.0 - jnp.exp(-dd_ray)) * jnp.exp(-tau_ray)  # [RPB, S]
    # Per-row weight column for the product contraction below:
    # w[r] = w_ray[r // S, r % S].
    w = _sdot(_sdot(rsel, w_ray, "b") * psel,
              jnp.ones((S, 1), F32), "a")                 # [rows, 1]

    # ---- per-sample stacked products, weighted ----
    col16 = jax.lax.broadcasted_iota(jnp.int32, (rows, OUT_PAD), 1)
    rgb_act = (jax.nn.softplus(head) * (1.0 + 2.0 * rgb_padding)
               - rgb_padding)
    A = jnp.where(col16 < 3, rgb_act, 0.0)
    A = jnp.where(col16 == 3, 1.0, A)                     # acc lane
    A = jnp.where(col16 == 8, tmid_col, A)                # distance lane
    if need_extras:
        alb = jax.nn.sigmoid(head) * 0.77 + 0.03
        A = jnp.where((col16 >= 4) & (col16 < 7), alb, A)
        A = jnp.where(col16 == 7, jax.nn.softplus(head - 1.0), A)

    comp16 = _sdot(qsel, A * w, "b")                     # [RPB, 16]

    acc = comp16[:, 3:4]
    comp_rgb = comp16[:, 0:3]
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc)
    distance = jnp.clip(comp16[:, 8:9] / jnp.maximum(acc, 1e-10),
                        ray[:, 3:4], ray[:, 4:5])

    pieces = [comp_rgb, acc, distance]
    if need_extras:
        # Expectations divide by acc (w_norm = w / sum w).
        pieces.append(comp16[:, 4:8] / jnp.maximum(acc, 1e-12))
    else:
        pieces.append(jnp.zeros((RPB, 4), F32))
    if need_normals:
        g_x, _, _ = _sigma_grad_chain(x, acts, ws)
        sel_y, _ = _sel_matrices(L, min_deg, F)
        dsig = _dot_nt(g_x.astype(F32) * _att_cos(x32, L),
                       sel_y)                             # [rows, 8]
        colN = jax.lax.broadcasted_iota(jnp.int32, (rows, MC_WIDTH), 1)
        d3 = jnp.where(colN < 3, dsig, 0.0)
        norm = jnp.sqrt(jnp.sum(d3 * d3, axis=-1, keepdims=True))
        n_s = -d3 / jnp.maximum(norm, 1e-12)
        # Orientation term per sample (reference models/pano_mip_nerf.py:
        # 308-313): relu(n_s . d)^2 against the UN-normalized ray direction
        # (rayinfo lanes 5:8); rides lane 3 of the normal block through the
        # same weighted reduction, divided by acc = sum(w) downstream.
        ndot = (n_s[:, 0:1] * vrow[:, 5:6] + n_s[:, 1:2] * vrow[:, 6:7]
                + n_s[:, 2:3] * vrow[:, 7:8])
        ortw = jnp.maximum(ndot, 0.0) ** 2
        n_s = jnp.where(colN == 3, ortw, n_s)
        compN = _sdot(qsel, n_s * w, "b") / jnp.maximum(acc, 1e-12)
        colR = jax.lax.broadcasted_iota(jnp.int32, (RPB, MC_WIDTH), 1)
        nvec = jnp.where(colR < 3, compN, 0.0)
        nnorm = jnp.sqrt(jnp.sum(nvec * nvec, axis=-1, keepdims=True))
        pieces.append(jnp.where(
            colR < 3, nvec / jnp.maximum(nnorm, 1e-12),
            jnp.where(colR == 3, compN, 0.0)))            # [RPB, 8]
    else:
        pieces.append(jnp.zeros((RPB, MC_WIDTH), F32))
    out_ref[:] = jnp.concatenate(pieces + [w_ray], axis=-1)


OUT_FIXED = 3 + 1 + 1 + 4 + MC_WIDTH  # rgb, acc, distance, extras4, normal8


def fused_render_level(params, means: jax.Array, covs: jax.Array,
                       viewdirs: jax.Array, t_samples: jax.Array,
                       dirs: jax.Array, num_density_channels: int,
                       min_deg: int, max_deg: int, deg_view: int,
                       density_bias: float,
                       rgb_padding: float, white_bkgd: bool,
                       need_normals: bool, need_extras: bool):
    """Render one level fully in-kernel; returns per-ray products.

    Args:
      means/covs: [R, S, 3]; viewdirs: [R, 3] unit view directions (the
      positional encoding happens in-kernel); t_samples: [R, S+1];
      dirs: [R, 3] un-normalized ray dirs (their norm scales deltas).
    Returns dict(rgb [R,3], distance [R], acc [R], weights [R,S],
      normal [R,3] | None, albedo [R,3] | None, roughness [R] | None),
      all f32.
    """
    R, S = means.shape[0], means.shape[1]
    L = max_deg - min_deg
    F = 2 * 3 * L
    RPB = rays_per_block(S)

    t_mids = 0.5 * (t_samples[..., :-1] + t_samples[..., 1:])
    delta = ((t_samples[..., 1:] - t_samples[..., :-1])
             * jnp.linalg.norm(dirs, axis=-1, keepdims=True))
    mc = jnp.concatenate([
        means.reshape(-1, 3), covs.reshape(-1, 3),
        delta.reshape(-1, 1), t_mids.reshape(-1, 1)], axis=1).astype(F32)
    rayinfo = jnp.concatenate([
        viewdirs, t_samples[:, :1], t_samples[:, -1:],
        dirs], axis=1).astype(F32)
    packed = pack_params(params, num_density_channels)

    rows_blk = RPB * S
    const = lambda *_: (0, 0)
    row = lambda wdt: pl.BlockSpec((rows_blk, wdt), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    ray = lambda wdt: pl.BlockSpec((RPB, wdt), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    in_specs = [row(MC_WIDTH), ray(8)]
    in_specs += [pl.BlockSpec(p.shape, const, memory_space=pltpu.VMEM)
                 for p in packed]
    out_w = OUT_FIXED + S
    out = pl.pallas_call(
        functools.partial(
            _render_kernel, L=L, min_deg=min_deg, F=F, S=S, RPB=RPB,
            C=num_density_channels, deg_view=deg_view,
            density_bias=float(density_bias),
            rgb_padding=float(rgb_padding), white_bkgd=bool(white_bkgd),
            need_normals=bool(need_normals),
            need_extras=bool(need_extras), num_rows=R * S),
        grid=(pl.cdiv(R, RPB),),
        in_specs=in_specs,
        out_specs=ray(out_w),
        out_shape=jax.ShapeDtypeStruct((pl.cdiv(R, RPB) * RPB, out_w), F32),
        interpret=_interpret(),
    )(mc, rayinfo, *packed)
    out = out[:R]
    res = dict(rgb=out[:, 0:3], acc=out[:, 3], distance=out[:, 4],
               weights=out[:, OUT_FIXED:OUT_FIXED + S],
               normal=None, albedo=None, roughness=None, ort=None)
    if need_extras:
        res["albedo"] = out[:, 5:8]
        res["roughness"] = out[:, 8]
    if need_normals:
        res["normal"] = out[:, 9:12]
        res["ort"] = out[:, 12]  # per-ray sum_s w_norm * relu(n.d)^2
    return res
