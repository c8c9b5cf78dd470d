"""Training render kernels: whole-level fwd + hand-written bwd in Pallas.

Round-2 closed the training-kernel question with trace evidence (NOTES.md
"Fused-kernel decision"): at batch 512 the XLA step is HBM-bound — XLA
saves f32 activations of every MLP layer of every subgraph for its
backward (~GB/step of spill traffic) and the per-sample boundary tensors
of the partially-fused paths made kernels a net loss. The identified route
past ~100k rays/s is the megakernel family: move each subgraph's ENTIRE
per-level render (IPE + MLP + alpha compositing) behind a custom_vjp whose
forward and backward are each ONE pallas call with a per-RAY boundary —
inter-layer activations never reach HBM in either pass (the backward
recomputes them in VMEM, or reloads a bf16-only spill), and the loss stays
in XLA where it is per-ray and fuses into nothing-much.

This module implements the NO-normals variant used by the coarse level and
the secondary (env/irradiance) radiance queries in TRAINING
(reference semantics: /root/reference/models/mip.py:444-483 volumetric
rendering over models/pano_mip_nerf.py:263-278 activations). The fine
level's variant (normals + expectations + ort) is NOT built: the round-3
A/B measured this pair at 67k rays/s vs XLA's ~98-131k at batch 512 (the
Mosaic backward runs at ~50% of the v3 kernel's roofline — NOTES.md
"Round-3 kernel study"), so the fine level keeps the XLA path and these
kernels ship as the measured building blocks for a future megakernel
with a structurally better backward.

Backward derivation (per ray q, samples s; dd = softplus(raw_sigma +
bias) * delta, tau_s = sum_{j<s} dd_j, w_s = (1-e^{-dd_s}) e^{-tau_s}):

  d w_s / d dd_i = e^{-dd_i - tau_i}      (i = s)
                 = -w_s                    (i < s)
  => cot_dd_i = cot_w_i e^{-dd_i - tau_i} - sum_{s>i} cot_w_s w_s
     (a reverse-exclusive cumsum: one matmul against the strict lower
     triangle, same iota-synthesized-matrix machinery as the forward).

  distance = clip(N / D, t_0, t_last), N = sum w t_mid, D = max(acc, eps):
  cot flows through the unclipped branch only (a.e. exact vs jnp.clip).

Gradients w.r.t. the Gaussian moments (dmc) are emitted for all 8 mc lanes
(means via the IPE adjoint, covs likewise, delta via dd, t_mid via the
distance numerator): the env subgraph needs d(means) — the irradiance
coupling keeps gradient through the surface point (detach_dist=False,
reference models/pano_mip_nerf.py:321-324). rayinfo (viewdirs/near/far) is
treated as non-differentiable (ray data everywhere in this model).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pano_nerf_tpu.kernels.fused_mlp import (BF16, F32, OUT_PAD,
                                             PACKED_FIELDS, _dot_nt,
                                             _dot_t_accum, _f32dot,
                                             _interpret, _trunk_forward,
                                             pack_params)
from pano_nerf_tpu.kernels.fused_mlp_ipe import (MC_WIDTH, _att_cos,
                                                 _ipe96x, _sel_matrices)
from pano_nerf_tpu.kernels.fused_render import _sdot


def _rpb(S: int, rows_target: int) -> int:
    """Rays per block for the train kernels: ~rows_target rows, multiple
    of 8 in both the row-block (RPB*S) and per-ray (RPB) dims. Larger
    blocks amortize the per-grid-step constants of the ~55-dot backward;
    measured on hardware (NOTES.md round-3)."""
    return max(8, (rows_target // S) // 8 * 8)

_N_W, _N_B = 14, 12
OUT8 = 8  # rgb(3) | acc | distance | pad(3)
# Scoped-VMEM ceiling for the backward kernel (it holds the weight-grad
# accumulators + recomputed activations for a 512-row block; same headroom
# reasoning as fused_mlp_normals._BWD_VMEM_LIMIT).
_BWD_VMEM_LIMIT = 64 * 1024 * 1024


def _comp_matrices(RPB: int, S: int):
    """Iota-synthesized selection/triangular matrices for one ray block."""
    rows = RPB * S
    rsel = (jax.lax.broadcasted_iota(jnp.int32, (rows, RPB), 0) // S
            == jax.lax.broadcasted_iota(jnp.int32, (rows, RPB), 1)
            ).astype(F32)
    qsel = (jax.lax.broadcasted_iota(jnp.int32, (RPB, rows), 1) // S
            == jax.lax.broadcasted_iota(jnp.int32, (RPB, rows), 0)
            ).astype(F32)
    psel = (jax.lax.broadcasted_iota(jnp.int32, (rows, S), 0) % S
            == jax.lax.broadcasted_iota(jnp.int32, (rows, S), 1)
            ).astype(F32)
    tri = (jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
           < jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)).astype(F32)
    tri_after = (jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
                 > jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
                 ).astype(F32)
    return rsel, qsel, psel, tri, tri_after


def _ray_to_row(rsel, psel, x_ray, S):
    """[RPB, S] per-ray-sample values -> [rows, 1] row column."""
    return _sdot(_sdot(rsel, x_ray, "b") * psel,
                 jnp.ones((S, 1), F32), "a")


def _forward_core(mc, vrow, ws, bs, L, min_deg, F, density_bias,
                  rgb_padding, rsel, qsel, psel, tri, valid, acts=None):
    """Shared fwd math: returns everything the bwd adjoints reuse.

    `acts`: pre-loaded trunk activations (the save_acts spill) — skips the
    8-dot trunk recompute entirely."""
    x, x32, att, y = _ipe96x(mc, L, min_deg, F)
    if acts is None:
        h7, acts = _trunk_forward(x, ws, bs)
    else:
        h7 = acts[-1]
    density = _f32dot(h7, ws["wd"]) + bs["bd"]
    btl = (_f32dot(h7, ws["wb"]) + bs["bb"]).astype(BF16)
    zv = _f32dot(btl, ws["wva"]) + _f32dot(vrow, ws["wvb"]) + bs["bv"]
    hv = jnp.maximum(zv, 0.0).astype(BF16)
    head = (_f32dot(hv, ws["wc"]) + bs["bc"]) + density  # [rows, 16]

    delta_col = mc[:, 6:7]
    tmid_col = mc[:, 7:8]
    sig_col = head[:, 3:4] + density_bias
    dd = jax.nn.softplus(sig_col) * delta_col
    S = psel.shape[1]
    dd_ray = _sdot(qsel, psel * dd, "b")
    tau_ray = _sdot(dd_ray, tri, "a")
    w_ray = (1.0 - jnp.exp(-dd_ray)) * jnp.exp(-tau_ray)
    w_row = _ray_to_row(rsel, psel, w_ray, S)

    col16 = jax.lax.broadcasted_iota(jnp.int32, head.shape, 1)
    rgb_act = (jax.nn.softplus(head) * (1.0 + 2.0 * rgb_padding)
               - rgb_padding)
    A = jnp.where(col16 < 3, rgb_act, 0.0)
    A = jnp.where(col16 == 3, 1.0, A)
    A = jnp.where(col16 == 8, tmid_col, A)
    comp16 = _sdot(qsel, A * w_row, "b")  # [RPB, 16]
    return dict(x=x, x32=x32, att=att, y=y, h7=h7, acts=acts, btl=btl,
                hv=hv,
                head=head, dd=dd, dd_ray=dd_ray, tau_ray=tau_ray,
                w_ray=w_ray, w_row=w_row, rgb_act=rgb_act, comp16=comp16,
                sig_col=sig_col, delta_col=delta_col, tmid_col=tmid_col)


def _train_fwd_kernel(mc_ref, ray_ref, venc_ref, *refs, L: int,
                      min_deg: int, F: int, S: int, RPB: int,
                      density_bias: float, rgb_padding: float,
                      white_bkgd: bool, num_rows: int, save_acts: bool):
    if save_acts:
        out_ref, w_ref, acts_ref = refs[-3:]
    else:
        out_ref, w_ref = refs[-2:]
    ws = {k: r[:] for k, r in zip(PACKED_FIELDS[:_N_W], refs[:_N_W])}
    bs = {k: r[:] for k, r in
          zip(PACKED_FIELDS[_N_W:_N_W + _N_B], refs[_N_W:_N_W + _N_B])}
    rows = RPB * S
    rsel, qsel, psel, tri, _ = _comp_matrices(RPB, S)

    row_ids = (pl.program_id(0) * rows
               + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0))
    valid = row_ids < num_rows
    ray_ids = (pl.program_id(0) * RPB
               + jax.lax.broadcasted_iota(jnp.int32, (RPB, 1), 0))
    ray = jnp.where(ray_ids * S < num_rows, ray_ref[:], 0.0)
    mc = jnp.where(valid, mc_ref[:], 0.0)
    v = jnp.where(valid, venc_ref[:], 0).astype(BF16)

    f = _forward_core(mc, v, ws, bs, L, min_deg, F, density_bias,
                      rgb_padding, rsel, qsel, psel, tri, valid)
    comp16 = f["comp16"]
    acc = comp16[:, 3:4]
    comp_rgb = comp16[:, 0:3]
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc)
    distance = jnp.clip(comp16[:, 8:9] / jnp.maximum(acc, 1e-10),
                        ray[:, 3:4], ray[:, 4:5])
    out_ref[:] = jnp.concatenate(
        [comp_rgb, acc, distance, jnp.zeros((RPB, OUT8 - 5), F32)], axis=-1)
    w_ref[:] = f["w_ray"]
    if save_acts:
        W = f["acts"][0].shape[-1]
        for i in range(8):
            acts_ref[:, i * W:(i + 1) * W] = f["acts"][i]


def _train_bwd_kernel(mc_ref, ray_ref, venc_ref, *refs, L: int,
                      min_deg: int, F: int, S: int, RPB: int,
                      density_bias: float, rgb_padding: float,
                      white_bkgd: bool, num_rows: int, save_acts: bool):
    n_in = _N_W + _N_B
    g8_ref = refs[n_in]
    gw_ref = refs[n_in + 1]
    acts_ref = refs[n_in + 2] if save_acts else None
    dmc_ref = refs[n_in + 2 + int(save_acts)]
    grad_refs = refs[n_in + 3 + int(save_acts):]
    ws = {k: r[:] for k, r in zip(PACKED_FIELDS[:_N_W], refs[:_N_W])}
    bs = {k: r[:] for k, r in
          zip(PACKED_FIELDS[_N_W:_N_W + _N_B], refs[_N_W:_N_W + _N_B])}
    gw = dict(zip(PACKED_FIELDS, grad_refs))

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in grad_refs:
            r[:] = jnp.zeros_like(r)

    rows = RPB * S
    rsel, qsel, psel, tri, tri_after = _comp_matrices(RPB, S)
    row_ids = (pl.program_id(0) * rows
               + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0))
    valid = row_ids < num_rows
    ray_ids = (pl.program_id(0) * RPB
               + jax.lax.broadcasted_iota(jnp.int32, (RPB, 1), 0))
    rvalid = ray_ids * S < num_rows
    ray = jnp.where(rvalid, ray_ref[:], 0.0)
    g8 = jnp.where(rvalid, g8_ref[:], 0.0)    # [RPB, 8] per-ray cotangents
    gwin = jnp.where(rvalid, gw_ref[:], 0.0)  # [RPB, S] weights cotangent
    mc = jnp.where(valid, mc_ref[:], 0.0)
    v = jnp.where(valid, venc_ref[:], 0).astype(BF16)

    # ---- recompute forward (activations live only in VMEM), or rebuild
    # it from the spilled bf16 acts (skips the trunk dots) ----
    spilled = None
    if save_acts:
        W = ws["w1"].shape[0]
        spilled = [jnp.where(valid, acts_ref[:, i * W:(i + 1) * W], 0)
                   for i in range(8)]
    f = _forward_core(mc, v, ws, bs, L, min_deg, F, density_bias,
                      rgb_padding, rsel, qsel, psel, tri, valid,
                      acts=spilled)
    acts, x, head = f["acts"], f["x"], f["head"]
    w_ray, dd_ray, tau_ray = f["w_ray"], f["dd_ray"], f["tau_ray"]
    comp16, w_row = f["comp16"], f["w_row"]

    # ---- per-ray output adjoints ----
    acc = comp16[:, 3:4]
    N = comp16[:, 8:9]
    Dacc = jnp.maximum(acc, 1e-10)
    dist_pre = N / Dacc
    cot_rgbq = g8[:, 0:3]
    cot_acc = g8[:, 3:4]
    cot_dist = g8[:, 4:5]
    in_range = ((dist_pre > ray[:, 3:4]) & (dist_pre < ray[:, 4:5])
                ).astype(F32)
    cd = cot_dist * in_range
    cot_N = cd / Dacc
    cot_acc = cot_acc - cd * N / (Dacc * Dacc) * (acc > 1e-10)
    if white_bkgd:
        cot_acc = cot_acc - jnp.sum(cot_rgbq, axis=-1, keepdims=True)

    # ---- weights cotangent, assembled in row space ----
    # cot_w_row = sum_c cot_rgb_c rgb_c + cot_acc + cot_N t_mid + gwin.
    cot8p = jnp.concatenate(
        [cot_rgbq, cot_acc, cot_N, jnp.zeros((RPB, 3), F32)], axis=-1)
    cotrow = _sdot(rsel, cot8p, "b")
    cot_w_row = (jnp.sum(cotrow[:, 0:3] * f["rgb_act"][:, 0:3], axis=-1,
                         keepdims=True)
                 + cotrow[:, 3:4] + cotrow[:, 4:5] * f["tmid_col"]
                 + _ray_to_row(rsel, psel, gwin, S))
    cw_ray = _sdot(qsel, psel * cot_w_row, "b")        # [RPB, S]

    # ---- compositing adjoint: weights -> dd -> (sigma, delta) ----
    E = jnp.exp(-dd_ray - tau_ray)
    cot_dd_ray = cw_ray * E - _sdot(cw_ray * w_ray, tri_after, "a")
    cot_dd_row = _ray_to_row(rsel, psel, cot_dd_ray, S)
    sig_sigmoid = jax.nn.sigmoid(f["sig_col"])
    cot_sig = cot_dd_row * sig_sigmoid * f["delta_col"]
    cot_delta = cot_dd_row * jax.nn.softplus(f["sig_col"])
    cot_tmid = cotrow[:, 4:5] * w_row

    # ---- head cotangent [rows, 16]: lanes 0:3 rgb (through the padded
    # softplus activation), lane 3 raw sigma (through dd) ----
    col16 = jax.lax.broadcasted_iota(jnp.int32, head.shape, 1)
    sp_head = jax.nn.sigmoid(head)  # softplus'
    rgb_cot_rows = cotrow[:, 0:3] * w_row  # [rows, 3]
    g_head = jnp.concatenate(
        [rgb_cot_rows * sp_head[:, 0:3] * (1.0 + 2.0 * rgb_padding),
         cot_sig, jnp.zeros((rows, OUT_PAD - 4), F32)], axis=-1)

    # ---- MLP backward (v1 math: heads, trunk, IPE adjoint) ----
    h7, btl, hv = f["h7"], f["btl"], f["hv"]
    g_rgb = (g_head * (col16 < 3)).astype(BF16)
    mask_d = col16 >= 3
    g_density = (g_head * mask_d).astype(BF16)

    gw["wc"][:] += _dot_t_accum(hv, g_rgb)
    gw["bc"][:] += jnp.sum(g_head, axis=0, keepdims=True) * (
        jax.lax.broadcasted_iota(jnp.int32, (1, OUT_PAD), 1) < 3)
    dhv = _dot_nt(g_rgb, ws["wc"])
    dzv = (dhv * (hv.astype(F32) > 0)).astype(BF16)
    gw["wva"][:] += _dot_t_accum(btl, dzv)
    gw["wvb"][:] += _dot_t_accum(v, dzv)
    gw["bv"][:] += jnp.sum(dzv.astype(F32), axis=0, keepdims=True)
    dbtl = _dot_nt(dzv, ws["wva"]).astype(BF16)

    gw["wb"][:] += _dot_t_accum(h7, dbtl)
    gw["bb"][:] += jnp.sum(dbtl.astype(F32), axis=0, keepdims=True)
    gw["wd"][:] += _dot_t_accum(h7, g_density)
    gw["bd"][:] += jnp.sum(g_head, axis=0, keepdims=True) * mask_d[:1]
    dh = _dot_nt(dbtl, ws["wb"]) + _dot_nt(g_density, ws["wd"])

    dx = jnp.zeros((rows, F), F32)
    masks = [a.astype(F32) > 0 for a in acts]
    for i in range(7, -1, -1):
        h_prev = acts[i - 1] if i > 0 else x
        dz = (dh * masks[i]).astype(BF16)
        if i == 5:
            gw["w5a"][:] += _dot_t_accum(h_prev, dz)
            gw["w5b"][:] += _dot_t_accum(x, dz)
            gw["b5"][:] += jnp.sum(dz.astype(F32), axis=0, keepdims=True)
            dh = _dot_nt(dz, ws["w5a"])
            dx = dx + _dot_nt(dz, ws["w5b"])
        else:
            gw[f"w{i}"][:] += _dot_t_accum(h_prev, dz)
            gw[f"b{i}"][:] += jnp.sum(dz.astype(F32), axis=0, keepdims=True)
            dh = _dot_nt(dz, ws[f"w{i}"])
    dx = dx + dh

    # ---- IPE adjoint -> moments, plus the delta/t_mid lanes ----
    sel_y, sel_v = _sel_matrices(L, min_deg, F)
    dy = dx * _att_cos(f["x32"], L)
    dvar = -0.5 * dx * f["x32"]
    dmc = _dot_nt(dy, sel_y) + _dot_nt(dvar, sel_v)
    col8 = jax.lax.broadcasted_iota(jnp.int32, (rows, MC_WIDTH), 1)
    dmc = jnp.where(col8 == 6, cot_delta, dmc)
    dmc = jnp.where(col8 == 7, cot_tmid, dmc)
    dmc_ref[:] = jnp.where(valid, dmc, 0.0)


def _specs(RPB, S):
    const = lambda *_: (0, 0)
    row = lambda w: pl.BlockSpec((RPB * S, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    per_ray = lambda w: pl.BlockSpec((RPB, w), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    return const, row, per_ray


def _call_fwd(mc, rayinfo, venc, packed, L, min_deg, S, density_bias,
              rgb_padding, white_bkgd, save_acts, rows_target):
    R = rayinfo.shape[0]
    F = 2 * 3 * L
    RPB = _rpb(S, rows_target)
    Rpad = pl.cdiv(R, RPB) * RPB
    const, row, per_ray = _specs(RPB, S)
    in_specs = [row(MC_WIDTH), per_ray(MC_WIDTH), row(venc.shape[1])]
    in_specs += [pl.BlockSpec(p.shape, const, memory_space=pltpu.VMEM)
                 for p in packed]
    out_specs = [per_ray(OUT8), per_ray(S)]
    out_shape = [jax.ShapeDtypeStruct((Rpad, OUT8), F32),
                 jax.ShapeDtypeStruct((Rpad, S), F32)]
    if save_acts:
        width = packed[1].shape[0]
        out_specs.append(row(8 * width))
        out_shape.append(
            jax.ShapeDtypeStruct((Rpad * S, 8 * width), BF16))
    return pl.pallas_call(
        functools.partial(
            _train_fwd_kernel, L=L, min_deg=min_deg, F=F, S=S, RPB=RPB,
            density_bias=float(density_bias),
            rgb_padding=float(rgb_padding), white_bkgd=bool(white_bkgd),
            num_rows=R * S, save_acts=save_acts),
        grid=(pl.cdiv(R, RPB),),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        # The forward needs headroom past the default 16 MB scoped-VMEM
        # budget at rows_target >= 2048 (measured: 16.25 MB request fails
        # remote compile without this).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT),
        interpret=_interpret(),
    )(mc, rayinfo, venc, *packed)


def _call_bwd(mc, rayinfo, venc, packed, g8, gw, acts, L, min_deg, S,
              density_bias, rgb_padding, white_bkgd, rows_target):
    R = rayinfo.shape[0]
    F = 2 * 3 * L
    RPB = _rpb(S, rows_target)
    const, row, per_ray = _specs(RPB, S)
    save_acts = acts is not None
    in_specs = [row(MC_WIDTH), per_ray(MC_WIDTH), row(venc.shape[1])]
    in_specs += [pl.BlockSpec(p.shape, const, memory_space=pltpu.VMEM)
                 for p in packed]
    in_specs += [per_ray(OUT8), per_ray(S)]
    operands = [mc, rayinfo, venc, *packed, g8, gw]
    if save_acts:
        width = packed[1].shape[0]
        in_specs.append(row(8 * width))
        operands.append(acts)
    out_shapes = [jax.ShapeDtypeStruct((mc.shape[0], MC_WIDTH), F32)]
    out_specs = [row(MC_WIDTH)]
    for p in packed:
        out_shapes.append(jax.ShapeDtypeStruct(p.shape, F32))
        out_specs.append(pl.BlockSpec(p.shape, const,
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        functools.partial(
            _train_bwd_kernel, L=L, min_deg=min_deg, F=F, S=S, RPB=RPB,
            density_bias=float(density_bias),
            rgb_padding=float(rgb_padding), white_bkgd=bool(white_bkgd),
            num_rows=R * S, save_acts=save_acts),
        grid=(pl.cdiv(R, RPB),),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT),
        interpret=_interpret(),
    )(*operands)
    return outs[0], tuple(outs[1:])


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def _render_train_core(mc, rayinfo, venc, packed, L, min_deg, S,
                       density_bias, rgb_padding, white_bkgd, save_acts,
                       rows_target):
    out = _call_fwd(mc, rayinfo, venc, packed, L, min_deg, S,
                    density_bias, rgb_padding, white_bkgd, False,
                    rows_target)
    return out[0], out[1]


def _render_train_fwd(mc, rayinfo, venc, packed, L, min_deg, S,
                      density_bias, rgb_padding, white_bkgd, save_acts,
                      rows_target):
    outs = _call_fwd(mc, rayinfo, venc, packed, L, min_deg, S,
                     density_bias, rgb_padding, white_bkgd, save_acts,
                     rows_target)
    acts = outs[2] if save_acts else None
    return (outs[0], outs[1]), (mc, rayinfo, venc, packed, acts)


def _render_train_bwd(L, min_deg, S, density_bias, rgb_padding,
                      white_bkgd, save_acts, rows_target, res, cts):
    mc, rayinfo, venc, packed, acts = res
    g8, gw = cts
    dmc, dpacked = _call_bwd(mc, rayinfo, venc, packed, g8, gw, acts, L,
                             min_deg, S, density_bias, rgb_padding,
                             white_bkgd, rows_target)
    dpacked = tuple(dw.astype(p.dtype) for dw, p in zip(dpacked, packed))
    return dmc, jnp.zeros_like(rayinfo), jnp.zeros_like(venc), dpacked


_render_train_core.defvjp(_render_train_fwd, _render_train_bwd)


def fused_render_train(params, means: jax.Array, covs: jax.Array,
                       viewdirs: jax.Array, t_samples: jax.Array,
                       dirs: jax.Array, num_density_channels: int,
                       min_deg: int, max_deg: int, deg_view: int,
                       density_bias: float, rgb_padding: float,
                       white_bkgd: bool, save_acts: bool = False,
                       rows_target: int = 512):
    """Train-time whole-level render (no normals/extras): one pallas call
    forward, one backward. First-order differentiable w.r.t. params and
    means/covs/t_samples (custom_vjp — do not differentiate twice).

    Args match fused_render_level. `save_acts` spills the bf16 trunk
    activations for the backward instead of recomputing them (bytes vs
    FLOPs; measure per subgraph).
    Returns dict(rgb [R,3], distance [R], acc [R], weights [R,S]).
    """
    from pano_nerf_tpu.ops import mip
    R, S = means.shape[0], means.shape[1]
    L = max_deg - min_deg
    t_mids = 0.5 * (t_samples[..., :-1] + t_samples[..., 1:])
    delta = ((t_samples[..., 1:] - t_samples[..., :-1])
             * jnp.linalg.norm(dirs, axis=-1, keepdims=True))
    mc = jnp.concatenate([
        means.reshape(-1, 3), covs.reshape(-1, 3),
        delta.reshape(-1, 1), t_mids.reshape(-1, 1)], axis=1).astype(F32)
    rayinfo = jnp.concatenate([
        viewdirs, t_samples[:, :1], t_samples[:, -1:],
        dirs], axis=1).astype(F32)
    rayinfo = jax.lax.stop_gradient(rayinfo)
    # Viewdir PE in XLA (per ray, broadcast to rows): the train kernels
    # have no boundary-size reason to encode in-kernel, and dropping the
    # per-block _pe27 + ray->row expansion measurably helps (round-3).
    venc = mip.pos_enc(viewdirs, 0, deg_view, True)
    venc = jax.lax.stop_gradient(jnp.broadcast_to(
        venc[:, None, :], (R, S, venc.shape[-1])).reshape(R * S, -1)
    ).astype(BF16)
    packed = pack_params(params, num_density_channels)
    out8, w = _render_train_core(mc, rayinfo, venc, packed, L, min_deg, S,
                                 density_bias, rgb_padding,
                                 bool(white_bkgd), bool(save_acts),
                                 int(rows_target))
    out8, w = out8[:R], w[:R]
    return dict(rgb=out8[:, 0:3], acc=out8[:, 3], distance=out8[:, 4],
                weights=w)
