"""Fused NeRF-MLP Pallas kernel: the whole network in VMEM per ray block.

Why: profiling the stock XLA step shows the model is HBM-bound, not
MXU-bound (bf16 vs fp32 is only ~15% apart, and throughput *drops* with
batch as fp32 layer residuals spill). At 256-wide layers the arithmetic
intensity of a single Dense is ~128 flops/byte — under the v5e ridge — so
materializing every inter-layer activation in HBM wastes most of the
bandwidth. This kernel:

* keeps ALL weights (~1.2 MB bf16) resident in VMEM and streams ray-sample
  rows through the full trunk + heads in one grid pass — inter-layer
  activations never leave VMEM;
* implements a custom VJP whose backward kernel *recomputes* the forward
  activations per block instead of storing them — residual memory drops from
  O(layers x M x width) to O(M x in_features), which un-spills large
  batches;
* accumulates weight gradients in f32 across sequential grid steps using
  constant-index output blocks (the canonical TPU reduction pattern).

Feature dims are padded to lane multiples of 128: x 96->128, viewdirs
27->128, heads 3+C -> 16 columns. The skip concat (reference
models/pano_mip_nerf.py:99-100: `cat[relu(l4(x)), input]` into layer 5) is
algebraically split into two matmuls h@W5a + x@W5b, avoiding an in-kernel
concat.

Second-order caveat: `jax.custom_vjp` is not twice-differentiable, so the
fused path serves first-order-only subgraphs — the coarse level, the
secondary (env/irradiance) radiance queries, and all of eval rendering. The
fine level keeps the stock XLA path during training because the
density-gradient normals feed the loss (grad-of-grad).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_M = 512
X_PAD = 128      # padded IPE feature width (96 used at deg 0..16)
V_PAD = 128      # padded viewdir feature width (27 used at deg 4 + identity)
OUT_PAD = 16     # rgb(3) + density channels(<=13)

F32 = jnp.float32
BF16 = jnp.bfloat16


def _interpret() -> bool:
    """Interpreter-mode escape hatch: lets the CPU test suite execute the
    Pallas kernels (tests set PANO_NERF_PALLAS_INTERPRET=1)."""
    import os
    return os.environ.get("PANO_NERF_PALLAS_INTERPRET", "0") == "1"


def _f32dot(a, b):
    return jnp.dot(a, b, preferred_element_type=F32)


def _dot_t_accum(a, b):
    """a^T @ b with f32 accumulation: [M, K]^T x [M, N] -> [K, N]."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=F32)


def _dot_nt(a, b):
    """a @ b^T with f32 accumulation: [M, N] x [K, N]^T -> [M, K]."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=F32)


# ---------------------------------------------------------------------------
# Parameter packing: flax dict -> padded bf16 tuple
# ---------------------------------------------------------------------------

PACKED_FIELDS = (
    "w0", "w1", "w2", "w3", "w4", "w5a", "w5b", "w6", "w7",
    "wd", "wb", "wva", "wvb", "wc",
    "b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7", "bd", "bb", "bv", "bc",
)


def pack_params(params, num_density_channels: int):
    """Flax NerfMLP params -> tuple of padded kernel operands.

    Weights are cast bf16; biases stay f32. Padding is with zeros, so padded
    rows/cols contribute nothing and gradients through `pack_params` flow
    back to the original parameters exactly (pad/slice are linear).
    """
    p = params["params"]
    C = num_density_channels

    def padw(w, rows, cols):
        # Row ("K") dims stay unpadded — Mosaic tiles non-128 contraction
        # dims internally; only head output columns get padded (for the
        # shared rgb|density output block).
        if cols == w.shape[1]:
            return w.astype(BF16)
        out = jnp.zeros((w.shape[0], cols), F32)
        return out.at[:, : w.shape[1]].set(w).astype(BF16)

    def padb(b, cols):
        out = jnp.zeros((1, cols), F32)
        return out.at[0, : b.shape[0]].set(b)

    w5 = p["trunk_5"]["kernel"]          # [256 + 96, 256]
    wva = p["view_0"]["kernel"]          # [256 + 27, 128]
    width = p["trunk_1"]["kernel"].shape[0]
    packed = dict(
        w0=padw(p["trunk_0"]["kernel"], None, width),
        w1=padw(p["trunk_1"]["kernel"], None, width),
        w2=padw(p["trunk_2"]["kernel"], None, width),
        w3=padw(p["trunk_3"]["kernel"], None, width),
        w4=padw(p["trunk_4"]["kernel"], None, width),
        w5a=padw(w5[:width], None, width),
        w5b=padw(w5[width:], None, width),
        w6=padw(p["trunk_6"]["kernel"], None, width),
        w7=padw(p["trunk_7"]["kernel"], None, width),
        wd=padw(p["density"]["kernel"], None, OUT_PAD),
        wb=padw(p["bottleneck"]["kernel"], None, width),
        wva=padw(wva[:width], None, wva.shape[1]),
        wvb=padw(wva[width:], None, wva.shape[1]),
        wc=padw(p["color"]["kernel"], None, OUT_PAD),
        b0=padb(p["trunk_0"]["bias"], width),
        b1=padb(p["trunk_1"]["bias"], width),
        b2=padb(p["trunk_2"]["bias"], width),
        b3=padb(p["trunk_3"]["bias"], width),
        b4=padb(p["trunk_4"]["bias"], width),
        b5=padb(p["trunk_5"]["bias"], width),
        b6=padb(p["trunk_6"]["bias"], width),
        b7=padb(p["trunk_7"]["bias"], width),
        bd=padb(p["density"]["bias"], OUT_PAD),
        bb=padb(p["bottleneck"]["bias"], width),
        bv=padb(p["view_0"]["bias"], wva.shape[1]),
        bc=padb(p["color"]["bias"], OUT_PAD),
    )
    # rgb goes to cols 0:3, density to cols 3:3+C of the shared head output.
    packed["wd"] = jnp.roll(packed["wd"], 3, axis=1)
    packed["bd"] = jnp.roll(packed["bd"], 3, axis=1)
    return tuple(packed[k] for k in PACKED_FIELDS)


def unpack_grads(grads: Tuple, params, num_density_channels: int):
    """Inverse of pack_params for gradients: padded tuple -> flax pytree."""
    g = dict(zip(PACKED_FIELDS, grads))
    p = params["params"]
    width = p["trunk_1"]["kernel"].shape[0]
    xdim = p["trunk_0"]["kernel"].shape[0]
    vdim = p["view_0"]["kernel"].shape[0] - width
    cw = p["color"]["kernel"].shape[0]
    C = num_density_channels

    gd = jnp.roll(g["wd"], -3, axis=1)
    gbd = jnp.roll(g["bd"], -3, axis=1)
    out = {
        "trunk_0": {"kernel": g["w0"], "bias": g["b0"][0]},
        "trunk_1": {"kernel": g["w1"], "bias": g["b1"][0]},
        "trunk_2": {"kernel": g["w2"], "bias": g["b2"][0]},
        "trunk_3": {"kernel": g["w3"], "bias": g["b3"][0]},
        "trunk_4": {"kernel": g["w4"], "bias": g["b4"][0]},
        "trunk_5": {"kernel": jnp.concatenate(
            [g["w5a"], g["w5b"]], axis=0), "bias": g["b5"][0]},
        "trunk_6": {"kernel": g["w6"], "bias": g["b6"][0]},
        "trunk_7": {"kernel": g["w7"], "bias": g["b7"][0]},
        "density": {"kernel": gd[:, :C], "bias": gbd[0, :C]},
        "bottleneck": {"kernel": g["wb"], "bias": g["bb"][0]},
        "view_0": {"kernel": jnp.concatenate(
            [g["wva"], g["wvb"]], axis=0), "bias": g["bv"][0]},
        "color": {"kernel": g["wc"][:cw, :3], "bias": g["bc"][0, :3]},
    }
    return {"params": jax.tree.map(lambda x: x.astype(F32), out)}


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _trunk_forward(x, ws, bs):
    """Shared forward through the trunk; returns (h7, activations list)."""
    acts = []
    h = x
    for i in range(8):
        if i == 5:
            z = _f32dot(h, ws["w5a"]) + _f32dot(x, ws["w5b"]) + bs["b5"]
        else:
            z = _f32dot(h, ws[f"w{i}"]) + bs[f"b{i}"]
        h = jnp.maximum(z, 0.0).astype(BF16)
        acts.append(h)
    return h, acts


def _fwd_kernel(x_ref, v_ref, *refs):
    out_ref = refs[-1]
    ws = {k: r[:] for k, r in zip(PACKED_FIELDS[:14], refs[:14])}
    bs = {k: r[:] for k, r in zip(PACKED_FIELDS[14:], refs[14:-1])}

    x = x_ref[:]
    h7, _ = _trunk_forward(x, ws, bs)
    density = _f32dot(h7, ws["wd"]) + bs["bd"]           # cols 3:3+C
    btl = (_f32dot(h7, ws["wb"]) + bs["bb"]).astype(BF16)
    zv = _f32dot(btl, ws["wva"]) + _f32dot(v_ref[:], ws["wvb"]) + bs["bv"]
    hv = jnp.maximum(zv, 0.0).astype(BF16)
    rgb = _f32dot(hv, ws["wc"]) + bs["bc"]               # cols 0:3
    out_ref[:] = rgb + density


def _pallas_forward(x: jax.Array, v: jax.Array, packed: Tuple) -> jax.Array:
    M = x.shape[0]
    grid = (pl.cdiv(M, BLOCK_M),)
    const = lambda *_: (0, 0)
    win = [pl.BlockSpec((BLOCK_M, x.shape[1]), lambda i: (i, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((BLOCK_M, v.shape[1]), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)]
    win += [pl.BlockSpec(p.shape, const, memory_space=pltpu.VMEM)
            for p in packed]
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=win,
        out_specs=pl.BlockSpec((BLOCK_M, OUT_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, OUT_PAD), F32),
        interpret=_interpret(),
    )(x, v, *packed)


# ---------------------------------------------------------------------------
# Backward kernel (recompute forward, backprop, accumulate weight grads)
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, v_ref, *refs, num_rows: int):
    g_ref = refs[14 + 12]
    dx_ref = refs[14 + 12 + 1]
    grad_refs = refs[14 + 12 + 2:]
    ws = {k: r[:] for k, r in zip(PACKED_FIELDS[:14], refs[:14])}
    bs = {k: r[:] for k, r in zip(PACKED_FIELDS[14:26], refs[14:26])}
    gw = dict(zip(PACKED_FIELDS, grad_refs))

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in grad_refs:
            r[:] = jnp.zeros_like(r)

    # Ragged last block: rows beyond num_rows hold undefined data (possibly
    # NaN bit patterns) — select them to zero so they cannot contaminate the
    # weight-gradient accumulation. num_rows is static.
    row_ids = (pl.program_id(0) * BLOCK_M
               + jax.lax.broadcasted_iota(jnp.int32, (BLOCK_M, 1), 0))
    valid = row_ids < num_rows
    x = jnp.where(valid, x_ref[:], 0).astype(BF16)
    v = jnp.where(valid, v_ref[:], 0).astype(BF16)

    # --- recompute forward, keeping activations ---
    h7, acts = _trunk_forward(x, ws, bs)
    btl = (_f32dot(h7, ws["wb"]) + bs["bb"]).astype(BF16)
    zv = _f32dot(btl, ws["wva"]) + _f32dot(v, ws["wvb"]) + bs["bv"]
    hv = jnp.maximum(zv, 0.0).astype(BF16)

    g = jnp.where(valid, g_ref[:], 0.0)  # [B, OUT_PAD] f32 cotangent
    g_rgb = (g * (jax.lax.broadcasted_iota(jnp.int32, g.shape, 1) < 3)
             ).astype(BF16)
    mask_d = (jax.lax.broadcasted_iota(jnp.int32, g.shape, 1) >= 3)
    g_density = (g * mask_d).astype(BF16)

    # --- color branch ---
    gw["wc"][:] += _dot_t_accum(hv, g_rgb)
    gw["bc"][:] += jnp.sum(g, axis=0, keepdims=True) * (
        jax.lax.broadcasted_iota(jnp.int32, (1, OUT_PAD), 1) < 3)
    dhv = _dot_nt(g_rgb, ws["wc"])
    dzv = (dhv * (hv.astype(F32) > 0)).astype(BF16)
    gw["wva"][:] += _dot_t_accum(btl, dzv)
    gw["wvb"][:] += _dot_t_accum(v, dzv)
    gw["bv"][:] += jnp.sum(dzv.astype(F32), axis=0, keepdims=True)
    dbtl = _dot_nt(dzv, ws["wva"]).astype(BF16)

    # --- bottleneck + density head into trunk output grad ---
    gw["wb"][:] += _dot_t_accum(h7, dbtl)
    gw["bb"][:] += jnp.sum(dbtl.astype(F32), axis=0, keepdims=True)
    gw["wd"][:] += _dot_t_accum(h7, g_density)
    gw["bd"][:] += jnp.sum(g, axis=0, keepdims=True) * mask_d[:1]
    dh = _dot_nt(dbtl, ws["wb"]) + _dot_nt(g_density, ws["wd"])

    # --- trunk backward ---
    dx = jnp.zeros((x.shape[0], x.shape[1]), F32)
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
    dx = dx + dh  # dh after i==0 loop iteration is dz0 @ w0^T
    dx_ref[:] = dx


def _pallas_backward(x, v, packed, g):

    M = x.shape[0]
    grid = (pl.cdiv(M, BLOCK_M),)
    const = lambda *_: (0, 0)
    row = lambda shape: pl.BlockSpec((BLOCK_M, shape), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    in_specs = [row(x.shape[1]), row(v.shape[1])]
    in_specs += [pl.BlockSpec(p.shape, const, memory_space=pltpu.VMEM)
                 for p in packed]
    in_specs += [row(OUT_PAD)]

    out_shapes = [jax.ShapeDtypeStruct((M, x.shape[1]), F32)]
    out_specs = [row(x.shape[1])]
    for p in packed:
        out_shapes.append(jax.ShapeDtypeStruct(p.shape, F32))
        out_specs.append(pl.BlockSpec(p.shape, const,
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, num_rows=M),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(x, v, *packed, g)
    return outs[0], tuple(outs[1:])


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _fused_core(x, v, packed):
    return _pallas_forward(x, v, packed)


def _fused_core_fwd(x, v, packed):
    return _pallas_forward(x, v, packed), (x, v, packed)


def _fused_core_bwd(res, g):
    x, v, packed = res
    dx, dpacked = _pallas_backward(x, v, packed, g)
    # Cast weight grads to the packed dtypes (bf16 weights, f32 biases).
    dpacked = tuple(dw.astype(p.dtype) for dw, p in zip(dpacked, packed))
    return dx, None, dpacked


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def fused_mlp_apply(params, x_enc: jax.Array, v_enc: jax.Array,
                    num_density_channels: int
                    ) -> Tuple[jax.Array, jax.Array]:
    """Drop-in replacement for NerfMLP.apply on flattened rows.

    Args:
      params: flax param dict of NerfMLP.
      x_enc: [..., 96] IPE features; v_enc: [..., 27] viewdir features
        (broadcastable leading dims, same rank).
    Returns:
      raw_rgb [..., 3], raw_density [..., C] — fp32 pre-activation, matching
      NerfMLP.__call__.
    """
    lead = x_enc.shape[:-1]
    x = x_enc.reshape(-1, x_enc.shape[-1])
    v = jnp.broadcast_to(v_enc, lead + (v_enc.shape[-1],)).reshape(
        -1, v_enc.shape[-1])
    packed = pack_params(params, num_density_channels)
    out = _fused_core(x.astype(BF16), v.astype(BF16), packed)
    rgb = out[:, :3].reshape(lead + (3,))
    density = out[:, 3:3 + num_density_channels].reshape(
        lead + (num_density_channels,))
    return rgb, density
