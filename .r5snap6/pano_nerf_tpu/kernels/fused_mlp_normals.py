"""Fused IPE + MLP + density-gradient Pallas kernel (v3 of the fused path).

The training fine level needs, per sample: the MLP outputs AND
d(raw_density[0])/d(means) — the surface-normal direction (reference
/root/reference/models/pano_mip_nerf.py:298-306). v1/v2 kernels cannot serve
it: their custom_vjp is once-differentiable, and normals-by-autodiff would
differentiate it twice.

v3 computes the gradient IN the forward kernel as an explicit chain of
mask-gated matmuls (the ReLU trunk is piecewise linear — same derivation as
models/normals.py), and its hand-written backward kernel implements the
adjoint of that chain: the "second-order" rule expressed as first-order
code, derived below. Training the fine level through this kernel keeps every
inter-layer activation in VMEM and leaves NO second-order autodiff anywhere
in the step.

Gradient chain (forward kernel), depth-8 / skip-4 topology:
    x = att * sin(y),  y = mc @ sel_y (+pi/2 cos half),  att = exp(-.5 var)
    a_i = relu(z_i) trunk activations, m_i = [a_i > 0]
    s_7 = Wd[:, sigma]                                  (row-constant)
    sz_i = s_i * m_i ; s_{i-1} = sz_i @ W_i^T           (skip splits W5)
    g_x = sz_0 @ W0^T + sz_5 @ W5b^T
    dsig/d mc = (g_x * att * cos(y)) @ sel_y^T          (means rows only)

Backward kernel: given cotangents (g_out, q = cot(dsig/dmc)):
  * standard MLP backward for g_out (identical math to v2);
  * normals adjoint:
      cot_dy  = q @ sel_y ;  cot_gx = cot_dy * c1 ;  cot_c1 = cot_dy * g_x
      cot_y  += -cot_c1 * x_f32 ;  cot_var += -0.5 * cot_c1 * c1
      then walk the sz-chain FORWARD: cot(sz_i) = cot(s_{i-1}) @ W_i
      (+ c_enc @ W5b at the skip), dW_i += cot(s_{i-1})^T sz_i,
      cot(s_i) = cot(sz_i) * m_i, and finally dWd[:, sigma] += sum cot(s_7).
  * ReLU masks carry zero derivative (a.e.), matching JAX's rule.

Parity is pinned against models/normals.py + jax.grad by
tests/test_fused_normals.py (TPU) and the interpret-mode CPU tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pano_nerf_tpu.kernels.fused_mlp import (BF16, BLOCK_M, F32, OUT_PAD,
                                             PACKED_FIELDS, _dot_nt,
                                             _dot_t_accum, _f32dot,
                                             _interpret, _trunk_forward,
                                             pack_params)
from pano_nerf_tpu.kernels.fused_mlp_ipe import (MC_WIDTH, _att_cos,
                                                 _ipe96x, _sel_matrices)

_N_W, _N_B = 14, 12
SIGMA_COL = 3  # packed head column of raw density channel 0
# Backward block size. Larger blocks amortize per-dot MXU overhead (the
# backward chains ~42 dependent [M,256]-shaped dots; at 256 rows the xprof
# trace showed ~66% MXU util vs XLA's ~88%). 512 rows needs ~20.5 MB of
# scoped VMEM — above the compiler's default 16 MB but far below the
# physical 128 MB, so the kernel raises its own limit via CompilerParams.
BLOCK_M_BWD = 512
# Scoped-VMEM ceiling for the backward kernel (bytes): measured 20.52 MB at
# 512 rows; leave headroom for scheduling variance.
_BWD_VMEM_LIMIT = 28 * 1024 * 1024


def _sigma_grad_chain(x, acts, ws):
    """Explicit d(raw_sigma)/d(x) through the trunk.

    Returns (g_x bf16 [M, F], sz list of 8 bf16 [M, W] cot-of-z tensors,
    kept for the backward kernel's adjoint walk).
    """
    masks = [a.astype(F32) > 0 for a in acts]
    s = jnp.broadcast_to(ws["wd"][:, SIGMA_COL].astype(F32), acts[-1].shape)
    sz = [None] * 8
    g_skip = None
    for i in range(7, -1, -1):
        sz_i = jnp.where(masks[i], s, 0.0).astype(BF16)
        sz[i] = sz_i
        if i == 5:
            s = _dot_nt(sz_i, ws["w5a"])
            g_skip = _dot_nt(sz_i, ws["w5b"])
        elif i == 0:
            g_x = _dot_nt(sz_i, ws["w0"]) + g_skip
        else:
            s = _dot_nt(sz_i, ws[f"w{i}"])
    return g_x, sz, masks


def _fwd_kernel(mc_ref, v_ref, *refs, L: int, min_deg: int, F: int,
                save_residuals: bool):
    if save_residuals:
        out_ref, dsig_ref, acts_ref = refs[-3:]
    else:
        out_ref, dsig_ref = refs[-2:]
    ws = {k: r[:] for k, r in zip(PACKED_FIELDS[:_N_W], refs[:_N_W])}
    bs = {k: r[:] for k, r in
          zip(PACKED_FIELDS[_N_W:_N_W + _N_B], refs[_N_W:_N_W + _N_B])}

    mc = mc_ref[:]
    x, x32, att, y = _ipe96x(mc, L, min_deg, F)
    h7, acts = _trunk_forward(x, ws, bs)
    density = _f32dot(h7, ws["wd"]) + bs["bd"]
    btl = (_f32dot(h7, ws["wb"]) + bs["bb"]).astype(BF16)
    zv = _f32dot(btl, ws["wva"]) + _f32dot(v_ref[:], ws["wvb"]) + bs["bv"]
    hv = jnp.maximum(zv, 0.0).astype(BF16)
    rgb = _f32dot(hv, ws["wc"]) + bs["bc"]
    out_ref[:] = rgb + density

    g_x, sz, _ = _sigma_grad_chain(x, acts, ws)
    sel_y, _ = _sel_matrices(L, min_deg, F)
    dy = g_x.astype(F32) * _att_cos(x32, L)
    dsig_ref[:] = _dot_nt(dy, sel_y)  # cols 0:3 = d raw_sigma / d means
    if save_residuals:
        # Spill ONLY the trunk activations to HBM for the backward kernel.
        # The step is HBM-bandwidth-bound (NOTES.md profile), so the
        # residual set is chosen by bytes, not FLOPs: acts are [M, 8*256]
        # bf16 (~134 MB/step at the production batch) and save the 8-dot
        # trunk recompute; the sz chain (same size) is instead recomputed
        # from acts + wd in the backward for 7 extra [M,256]x[256,256] dots
        # — trading spare MXU time for the scarce resource. Saving both
        # (the earlier variant) measured slower end-to-end.
        W = acts[0].shape[-1]
        for i in range(8):
            acts_ref[:, i * W:(i + 1) * W] = acts[i]


def _bwd_kernel(mc_ref, v_ref, *refs, L: int, min_deg: int, F: int,
                num_rows: int, block_m: int, fuse_wgrad: bool = False):
    g_ref = refs[_N_W + _N_B]
    q_ref = refs[_N_W + _N_B + 1]
    acts_ref = refs[_N_W + _N_B + 2]
    dmc_ref = refs[_N_W + _N_B + 3]
    grad_refs = refs[_N_W + _N_B + 4:]
    ws = {k: r[:] for k, r in zip(PACKED_FIELDS[:_N_W], refs[:_N_W])}
    bs = {k: r[:] for k, r in
          zip(PACKED_FIELDS[_N_W:_N_W + _N_B], refs[_N_W:_N_W + _N_B])}
    gw = dict(zip(PACKED_FIELDS, grad_refs))

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in grad_refs:
            r[:] = jnp.zeros_like(r)

    row_ids = (pl.program_id(0) * block_m
               + jax.lax.broadcasted_iota(jnp.int32, (block_m, 1), 0))
    valid = row_ids < num_rows
    mc = jnp.where(valid, mc_ref[:], 0.0)
    v = jnp.where(valid, v_ref[:], 0).astype(BF16)
    g = jnp.where(valid, g_ref[:], 0.0)
    q = jnp.where(valid, q_ref[:], 0.0)

    # --- reload saved residuals (zeroing ragged rows: their saved values
    # are undefined and 0 * NaN would poison the weight-grad dots) ---
    W = ws["w1"].shape[0]
    acts = [jnp.where(valid, acts_ref[:, i * W:(i + 1) * W], 0)
            for i in range(8)]
    masks = [a.astype(F32) > 0 for a in acts]
    h7 = acts[-1]

    # --- recompute the bandwidth-cheap pieces: exact IPE (elementwise),
    # the two head activations the view-branch backward needs, and the sz
    # gradient chain + g_x from the saved acts (9 dots; see the residual
    # note in _fwd_kernel for why sz is recomputed rather than spilled) ---
    x, x_f32, att, y = _ipe96x(mc, L, min_deg, F)
    c1 = _att_cos(x_f32, L)
    btl = (_f32dot(h7, ws["wb"]) + bs["bb"]).astype(BF16)
    zv = _f32dot(btl, ws["wva"]) + _f32dot(v, ws["wvb"]) + bs["bv"]
    hv = jnp.maximum(zv, 0.0).astype(BF16)
    g_x, sz, _ = _sigma_grad_chain(x, acts, ws)
    g_x = g_x.astype(BF16)

    col = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    g_rgb = (g * (col < 3)).astype(BF16)
    mask_d = col >= 3
    g_density = (g * mask_d).astype(BF16)

    # --- standard backward for g_out (identical math to v2) ---
    gw["wc"][:] += _dot_t_accum(hv, g_rgb)
    gw["bc"][:] += jnp.sum(g, axis=0, keepdims=True) * (
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
    gw["bd"][:] += jnp.sum(g, axis=0, keepdims=True) * mask_d[:1]
    dh = _dot_nt(dbtl, ws["wb"]) + _dot_nt(g_density, ws["wd"])

    dx = jnp.zeros((mc.shape[0], F), F32)
    dz_saved = [None] * 8
    for i in range(7, -1, -1):
        h_i = acts[i]
        h_prev = acts[i - 1] if i > 0 else x
        dz = (dh * masks[i]).astype(BF16)
        dz_saved[i] = dz
        if i == 5:
            if not fuse_wgrad:
                gw["w5a"][:] += _dot_t_accum(h_prev, dz)
                gw["w5b"][:] += _dot_t_accum(x, dz)
            gw["b5"][:] += jnp.sum(dz.astype(F32), axis=0, keepdims=True)
            dh = _dot_nt(dz, ws["w5a"])
            dx = dx + _dot_nt(dz, ws["w5b"])
        else:
            if not fuse_wgrad:
                gw[f"w{i}"][:] += _dot_t_accum(h_prev, dz)
            gw[f"b{i}"][:] += jnp.sum(dz.astype(F32), axis=0, keepdims=True)
            dh = _dot_nt(dz, ws[f"w{i}"])
    dx = dx + dh

    # --- normals adjoint: IPE-side products ---
    sel_y, sel_v = _sel_matrices(L, min_deg, F)
    cot_dy = _f32dot(q, sel_y)          # [M, F]
    cot_gx = (cot_dy * c1).astype(BF16)
    cot_c1 = cot_dy * g_x.astype(F32)

    # --- normals adjoint: walk the sz-chain forward ---
    # stage 0: g_x += sz_0 @ W0^T
    left = [None] * 8                    # fuse_wgrad: walk-side operands
    cot_sz = _f32dot(cot_gx, ws["w0"])
    left[0] = cot_gx
    if not fuse_wgrad:
        gw["w0"][:] += _dot_t_accum(cot_gx, sz[0])
    c = jnp.where(masks[0], cot_sz, 0.0).astype(BF16)  # cot(s_0)
    for i in range(1, 8):
        left[i] = c
        if i == 5:
            cot_sz = _f32dot(c, ws["w5a"]) + _f32dot(cot_gx, ws["w5b"])
            if not fuse_wgrad:
                gw["w5a"][:] += _dot_t_accum(c, sz[5])
                gw["w5b"][:] += _dot_t_accum(cot_gx, sz[5])
        else:
            cot_sz = _f32dot(c, ws[f"w{i}"])
            if not fuse_wgrad:
                gw[f"w{i}"][:] += _dot_t_accum(c, sz[i])
        c = jnp.where(masks[i], cot_sz, 0.0).astype(BF16)  # cot(s_i)
    # s_7 = broadcast(Wd[:, SIGMA_COL]): fold the row-sum into that column.
    sigma_onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, OUT_PAD), 1)
                    == SIGMA_COL)
    gw["wd"][:] += (jnp.sum(c.astype(F32), axis=0, keepdims=True).T
                    * sigma_onehot)

    if fuse_wgrad:
        # --- fused weight-gradient accumulation (round-4 megakernel
        # prerequisite, VERDICT r3 #6): each trunk weight receives TWO
        # rank-M contributions — h_prev^T dz_i from the primary backward
        # and left_i^T sz_i from the normals-adjoint walk. Row-concatenate
        # the operand pairs and contract ONCE per weight at doubled K:
        # identical math (block-partitioned matmul), half the weight-grad
        # dot count, and every merged dot is issued AFTER both chains so
        # none sits on the dependency path. ---
        def merged(a1, b1, a2, b2):
            return _dot_t_accum(jnp.concatenate([a1, a2], axis=0),
                                jnp.concatenate([b1, b2], axis=0))

        gw["w0"][:] += merged(x, dz_saved[0], left[0], sz[0])
        for i in range(1, 8):
            if i == 5:
                gw["w5a"][:] += merged(acts[4], dz_saved[5], left[5], sz[5])
                gw["w5b"][:] += merged(x, dz_saved[5], cot_gx, sz[5])
            else:
                gw[f"w{i}"][:] += merged(acts[i - 1], dz_saved[i],
                                         left[i], sz[i])

    # --- combine IPE cotangents from both paths and fold to moments ---
    cot_y = dx * c1 - cot_c1 * x_f32
    cot_var = -0.5 * (dx * x_f32 + cot_c1 * c1)
    dmc_ref[:] = _dot_nt(cot_y, sel_y) + _dot_nt(cot_var, sel_v)


def _specs(block_m):
    const = lambda *_: (0, 0)
    row = lambda w: pl.BlockSpec((block_m, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    return const, row


def _call_forward(mc, v, packed, L, min_deg, save_residuals=False):
    M = mc.shape[0]
    F = 2 * 3 * L
    # Residual outputs double the forward's VMEM window footprint; a 256-row
    # block keeps it well under the 16 MB scoped ceiling either way.
    block = BLOCK_M_BWD if save_residuals else BLOCK_M
    const, row = _specs(block)
    in_specs = [row(MC_WIDTH), row(v.shape[1])]
    in_specs += [pl.BlockSpec(p.shape, const, memory_space=pltpu.VMEM)
                 for p in packed]
    width = packed[1].shape[0]  # trunk width (w1 rows)
    out_specs = [row(OUT_PAD), row(MC_WIDTH)]
    out_shape = [jax.ShapeDtypeStruct((M, OUT_PAD), F32),
                 jax.ShapeDtypeStruct((M, MC_WIDTH), F32)]
    if save_residuals:
        out_specs += [row(8 * width)]
        out_shape += [jax.ShapeDtypeStruct((M, 8 * width), BF16)]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, L=L, min_deg=min_deg, F=F,
                          save_residuals=save_residuals),
        grid=(pl.cdiv(M, block),),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(mc, v, *packed)


def _call_backward(mc, v, packed, g, q, acts, L, min_deg,
                   fuse_wgrad=False):
    M = mc.shape[0]
    F = 2 * 3 * L
    const, row = _specs(BLOCK_M_BWD)
    width = packed[1].shape[0]
    in_specs = [row(MC_WIDTH), row(v.shape[1])]
    in_specs += [pl.BlockSpec(p.shape, const, memory_space=pltpu.VMEM)
                 for p in packed]
    in_specs += [row(OUT_PAD), row(MC_WIDTH), row(8 * width)]
    out_shapes = [jax.ShapeDtypeStruct((M, MC_WIDTH), F32)]
    out_specs = [row(MC_WIDTH)]
    for p in packed:
        out_shapes.append(jax.ShapeDtypeStruct(p.shape, F32))
        out_specs.append(pl.BlockSpec(p.shape, const,
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, L=L, min_deg=min_deg, F=F,
                          num_rows=M, block_m=BLOCK_M_BWD,
                          fuse_wgrad=fuse_wgrad),
        grid=(pl.cdiv(M, BLOCK_M_BWD),),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BWD_VMEM_LIMIT),
        interpret=_interpret(),
    )(mc, v, *packed, g, q, acts)
    return outs[0], tuple(outs[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_normals_core(mc, v, packed, L, min_deg, fuse_wgrad=False):
    return _call_forward(mc, v, packed, L, min_deg)


def _fused_normals_fwd(mc, v, packed, L, min_deg, fuse_wgrad=False):
    out, dsig, acts = _call_forward(mc, v, packed, L, min_deg,
                                    save_residuals=True)
    return (out, dsig), (mc, v, packed, acts)


def _fused_normals_bwd(L, min_deg, fuse_wgrad, res, cts):
    mc, v, packed, acts = res
    g, q = cts
    dmc, dpacked = _call_backward(mc, v, packed, g, q, acts, L, min_deg,
                                  fuse_wgrad=fuse_wgrad)
    dpacked = tuple(dw.astype(p.dtype) for dw, p in zip(dpacked, packed))
    return dmc, None, dpacked


_fused_normals_core.defvjp(_fused_normals_fwd, _fused_normals_bwd)


def fused_mlp_normals_apply(params, means: jax.Array, covs: jax.Array,
                            v_enc: jax.Array, num_density_channels: int,
                            min_deg: int, max_deg: int,
                            fuse_wgrad: bool = False
                            ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """IPE + MLP + d(raw_density[0])/d(means) in one fused kernel.

    Args/semantics match `_raw_outputs_density_grad` (models/base.py):
    returns (raw_rgb [..., 3], raw_density [..., C], d_raw_sigma [..., 3]),
    all fp32. First-order differentiable (custom_vjp with a hand-written
    backward kernel); the caller must not differentiate twice.

    `fuse_wgrad` (round-4): merge each trunk weight's two gradient
    contributions (primary backward + normals-adjoint walk) into one
    doubled-K dot in the backward kernel — identical math, half the
    weight-grad dot count (the megakernel prerequisite named in the
    round-3 kernel study).
    """
    L = max_deg - min_deg
    lead = means.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    mc = jnp.concatenate([
        means.reshape(-1, 3), covs.reshape(-1, 3),
        jnp.zeros((n, MC_WIDTH - 6), means.dtype)], axis=1)
    v = jnp.broadcast_to(v_enc, lead + (v_enc.shape[-1],)).reshape(
        -1, v_enc.shape[-1]).astype(BF16)
    packed = pack_params(params, num_density_channels)
    out, dsig = _fused_normals_core(mc.astype(F32), v, packed, L, min_deg,
                                    bool(fuse_wgrad))
    rgb = out[:, :3].reshape(lead + (3,))
    density = out[:, 3:3 + num_density_channels].reshape(
        lead + (num_density_channels,))
    d_raw_sigma = dsig[:, :3].reshape(lead + (3,))
    return rgb, density, d_raw_sigma
