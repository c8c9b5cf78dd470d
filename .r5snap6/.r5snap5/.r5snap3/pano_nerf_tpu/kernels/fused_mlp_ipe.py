"""Fused IPE + NeRF-MLP Pallas kernel (v2 of the fused path).

Extends kernels/fused_mlp.py by moving the integrated positional encoding
into the kernel: inputs are raw Gaussian moments (means+covs packed as
8 f32/row = 32 B) instead of encoded features (96 bf16 = 192 B), cutting
input bandwidth 6x and deleting the XLA-side IPE subgraph and its backward.

Layout discipline: the IPE is formulated entirely at 96-lane width — one
K=8 matmul against an iota-synthesized [8, 96] selection matrix produces
the phase-shifted frequency grid (sin block | cos block via a +pi/2 offset
row), so no [B, 3]- or [B, 48]-wide intermediate ever exists. The trunk and
heads, packing, and the weight-gradient accumulation are shared with the v1
kernel.

Same caveats as v1: custom_vjp (first-order subgraphs only).
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

MC_WIDTH = 8   # means(3) | covs(3) | pad(2)
_N_W, _N_B = 14, 12


def _sel_matrices(L: int, min_deg: int, F: int):
    """[8, F] selection matrices synthesized from iota.

    Feature column j (< 2*3L): deg = (j % 3L) // 3, dim = j % 3, and the
    second half (j >= 3L) is the cos block (phase offset handled by the
    caller). sel_y picks mean[dim] * 2^deg from mc rows 0:3; sel_v picks
    cov[dim] * 4^deg from mc rows 3:6. Exact in f32 (powers of two).
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (MC_WIDTH, F), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (MC_WIDTH, F), 1)
    j = col % (3 * L)
    deg = (j // 3 + min_deg).astype(F32)
    dim = j % 3
    sel_y = jnp.where((row == dim) & (col < 2 * 3 * L), jnp.exp2(deg), 0.0)
    sel_v = jnp.where((row == dim + 3) & (col < 2 * 3 * L),
                      jnp.exp2(2.0 * deg), 0.0)
    return sel_y, sel_v


def _ipe96(mc, L: int, min_deg: int, F: int):
    """[B, 8] moments -> IPE features [B, F] (F = 2*3L, 96 for deg 16).

    Returns (feat_bf16, att_f32, sin_arg f32) — the latter two are reused
    by the backward kernel.

    The phases are built ELEMENTWISE (three masked fma passes on the VPU),
    not with an MXU dot: the MXU truncates f32 dot inputs to bf16 — which
    garbles y = 2^deg * mean at every degree the attenuation hasn't killed
    — while each elementwise product against an exact power of two is exact
    f32, bitwise-matching ops/mip.py's HIGHEST-precision encoding.
    """
    x32, att, y = _ipe96x(mc, L, min_deg, F)[1:]
    return x32.astype(BF16), att, y


def _ipe96x(mc, L: int, min_deg: int, F: int):
    """_ipe96 variant that also returns the f32 features (att*sin(y))
    for backward-side reuse — callers derive att*cos(y) via _att_cos
    instead of a second transcendental."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)
    j = col % (3 * L)
    deg = (j // 3 + min_deg).astype(F32)
    dim = j % 3
    in_range = col < 2 * 3 * L
    y = jnp.where(col >= 3 * L, 0.5 * jnp.pi, 0.0)
    var = jnp.zeros((1, F), F32)
    for d in range(3):
        pick = (dim == d) & in_range
        y = y + mc[:, d:d + 1] * jnp.where(pick, jnp.exp2(deg), 0.0)
        var = var + mc[:, 3 + d:4 + d] * jnp.where(pick,
                                                   jnp.exp2(2.0 * deg), 0.0)
    att = jnp.exp(-0.5 * var)
    x32 = att * jnp.sin(y)
    return x32.astype(BF16), x32, att, y


def _att_cos(x32, L: int):
    """att * cos(y) from x32 = att * sin(y) WITHOUT a cos transcendental.

    The feature layout is [sin block | cos block] with y_cos = y_sin + pi/2
    and shared attenuation, so cos(y_sin) = sin(y_cos) and cos(y_cos) =
    -sin(y_sin): att*cos(y) is a half-width lane rotation with a sign flip
    — one VPU shuffle instead of a [rows, F] transcendental (the sin/exp
    evaluations dominate the forward kernels' VPU time; NOTES.md round-3
    kernel study).
    """
    P = 3 * L
    return jnp.concatenate([x32[:, P:2 * P], -x32[:, :P]], axis=1)


def _fwd_kernel(mc_ref, v_ref, *refs, L: int, min_deg: int, F: int):
    out_ref = refs[-1]
    ws = {k: r[:] for k, r in zip(PACKED_FIELDS[:_N_W], refs[:_N_W])}
    bs = {k: r[:] for k, r in
          zip(PACKED_FIELDS[_N_W:_N_W + _N_B], refs[_N_W:_N_W + _N_B])}
    x, _, _ = _ipe96(mc_ref[:], L, min_deg, F)
    h7, _ = _trunk_forward(x, ws, bs)
    density = _f32dot(h7, ws["wd"]) + bs["bd"]
    btl = (_f32dot(h7, ws["wb"]) + bs["bb"]).astype(BF16)
    zv = _f32dot(btl, ws["wva"]) + _f32dot(v_ref[:], ws["wvb"]) + bs["bv"]
    hv = jnp.maximum(zv, 0.0).astype(BF16)
    rgb = _f32dot(hv, ws["wc"]) + bs["bc"]
    out_ref[:] = rgb + density


def _bwd_ipe_kernel(mc_ref, v_ref, *refs, L: int, min_deg: int, F: int,
                    num_rows: int):
    g_ref = refs[_N_W + _N_B]
    dmc_ref = refs[_N_W + _N_B + 1]
    grad_refs = refs[_N_W + _N_B + 2:]
    ws = {k: r[:] for k, r in zip(PACKED_FIELDS[:_N_W], refs[:_N_W])}
    bs = {k: r[:] for k, r in
          zip(PACKED_FIELDS[_N_W:_N_W + _N_B], refs[_N_W:_N_W + _N_B])}
    gw = dict(zip(PACKED_FIELDS, grad_refs))

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in grad_refs:
            r[:] = jnp.zeros_like(r)

    row_ids = (pl.program_id(0) * BLOCK_M
               + jax.lax.broadcasted_iota(jnp.int32, (BLOCK_M, 1), 0))
    valid = row_ids < num_rows
    mc = jnp.where(valid, mc_ref[:], 0.0)
    v = jnp.where(valid, v_ref[:], 0).astype(BF16)
    g = jnp.where(valid, g_ref[:], 0.0)

    # --- recompute forward ---
    x, x32, att, y = _ipe96x(mc, L, min_deg, F)
    h7, acts = _trunk_forward(x, ws, bs)
    btl = (_f32dot(h7, ws["wb"]) + bs["bb"]).astype(BF16)
    zv = _f32dot(btl, ws["wva"]) + _f32dot(v, ws["wvb"]) + bs["bv"]
    hv = jnp.maximum(zv, 0.0).astype(BF16)

    col = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    g_rgb = (g * (col < 3)).astype(BF16)
    mask_d = col >= 3
    g_density = (g * mask_d).astype(BF16)

    # --- heads backward (identical math to v1) ---
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

    # --- trunk backward ---
    dx = jnp.zeros((mc.shape[0], F), F32)
    for i in range(7, -1, -1):
        h_i = acts[i]
        h_prev = acts[i - 1] if i > 0 else x
        dz = (dh * (h_i.astype(F32) > 0)).astype(BF16)
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

    # --- IPE backward: feat = att*sin(y); y = mc@sel_y (+pi/2 cos half);
    # att = exp(-0.5 mc@sel_v). dy = dfeat*att*cos(y);
    # datt-arg = -0.5*dfeat*att*sin(y). All [B, F] lanes. ---
    sel_y, sel_v = _sel_matrices(L, min_deg, F)
    dy = dx * _att_cos(x32, L)
    dvar = -0.5 * dx * x32
    dmc_ref[:] = _dot_nt(dy, sel_y) + _dot_nt(dvar, sel_v)


def _call_forward(mc, v, packed, L, min_deg):
    M = mc.shape[0]
    F = 2 * 3 * L
    const = lambda *_: (0, 0)
    row = lambda w: pl.BlockSpec((BLOCK_M, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [row(MC_WIDTH), row(v.shape[1])]
    in_specs += [pl.BlockSpec(p.shape, const, memory_space=pltpu.VMEM)
                 for p in packed]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, L=L, min_deg=min_deg, F=F),
        grid=(pl.cdiv(M, BLOCK_M),),
        in_specs=in_specs,
        out_specs=row(OUT_PAD),
        out_shape=jax.ShapeDtypeStruct((M, OUT_PAD), F32),
        interpret=_interpret(),
    )(mc, v, *packed)


def _call_backward(mc, v, packed, g, L, min_deg):
    M = mc.shape[0]
    F = 2 * 3 * L
    const = lambda *_: (0, 0)
    row = lambda w: pl.BlockSpec((BLOCK_M, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [row(MC_WIDTH), row(v.shape[1])]
    in_specs += [pl.BlockSpec(p.shape, const, memory_space=pltpu.VMEM)
                 for p in packed]
    in_specs += [row(OUT_PAD)]
    out_shapes = [jax.ShapeDtypeStruct((M, MC_WIDTH), F32)]
    out_specs = [row(MC_WIDTH)]
    for p in packed:
        out_shapes.append(jax.ShapeDtypeStruct(p.shape, F32))
        out_specs.append(pl.BlockSpec(p.shape, const,
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        functools.partial(_bwd_ipe_kernel, L=L, min_deg=min_deg, F=F,
                          num_rows=M),
        grid=(pl.cdiv(M, BLOCK_M),),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(mc, v, *packed, g)
    return outs[0], tuple(outs[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_ipe_core(mc, v, packed, L, min_deg):
    return _call_forward(mc, v, packed, L, min_deg)


def _fused_ipe_fwd(mc, v, packed, L, min_deg):
    return _call_forward(mc, v, packed, L, min_deg), (mc, v, packed)


def _fused_ipe_bwd(L, min_deg, res, g):
    mc, v, packed = res
    dmc, dpacked = _call_backward(mc, v, packed, g, L, min_deg)
    dpacked = tuple(dw.astype(p.dtype) for dw, p in zip(dpacked, packed))
    return dmc, None, dpacked


_fused_ipe_core.defvjp(_fused_ipe_fwd, _fused_ipe_bwd)


def fused_mlp_ipe_apply(params, means: jax.Array, covs: jax.Array,
                        v_enc: jax.Array, num_density_channels: int,
                        min_deg: int, max_deg: int
                        ) -> Tuple[jax.Array, jax.Array]:
    """IPE + MLP in one kernel.

    Args:
      means, covs: [..., 3] Gaussian moments (diagonal covariance).
      v_enc: [..., Fv] encoded viewdirs, broadcastable leading dims.
    Returns:
      raw_rgb [..., 3], raw_density [..., C] fp32 — identical semantics to
      integrated_pos_enc + NerfMLP.apply.
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
    out = _fused_ipe_core(mc.astype(F32), v, packed, L, min_deg)
    rgb = out[:, :3].reshape(lead + (3,))
    density = out[:, 3:3 + num_density_channels].reshape(
        lead + (num_density_channels,))
    return rgb, density
