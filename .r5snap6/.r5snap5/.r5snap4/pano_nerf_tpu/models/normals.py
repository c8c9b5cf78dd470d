"""Explicit density-gradient normals: second-order autodiff eliminated.

The Pano-NeRF loss consumes surface normals computed as the (negative)
gradient of density w.r.t. the sample position (reference
/root/reference/models/pano_mip_nerf.py:298-306). Differentiating the loss
then differentiates that gradient — round-1 profiling measured 20%+ of step
time in the resulting grad-of-grad MLP passes plus 7-10% in dtype-conversion
traffic inside them (NOTES.md).

This module removes the second order entirely: the ReLU trunk is piecewise
linear, so d(raw_sigma)/d(encoding) is an explicit chain of mask-gated
matmuls over the SAME forward activations — ordinary first-order code that
JAX then differentiates once. The chain rule through the IPE features is
closed-form: with the encoding laid out as [sin block | cos block]
(deg-major, ops/mip.py:284-307),

    d enc_sin[deg, d] / d mean_d =  2^deg * enc_cos[deg, d]
    d enc_cos[deg, d] / d mean_d = -2^deg * enc_sin[deg, d]

so the position gradient needs no extra trig — one elementwise combine and a
power-of-two fold back to 3 dims.

Numerical semantics match the autodiff path exactly up to dtype: matmuls run
in the model compute dtype (bf16 on TPU), masks are exact, and the fold-back
accumulates in f32. ReLU's subgradient at 0 is taken as 0, identical to
JAX's rule for `jnp.maximum(x, 0)`; the boundary set has measure zero.

Kept in sync with `NerfMLP` (models/mlp.py) — `test_normals_explicit.py`
pins forward equality and gradient parity against the jax.vjp path.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
F32 = jnp.float32


def _scales(min_deg: int, max_deg: int) -> np.ndarray:
    return 2.0 ** np.arange(min_deg, max_deg, dtype=np.float32)


def mlp_with_density_grad(params, x_enc: Array, v_enc: Optional[Array],
                          skip_index: int, dtype: Any,
                          want_bottleneck: bool = False,
                          want_grad: bool = True):
    """NerfMLP forward + explicit d(raw_density[..., 0])/d(x_enc).

    Args:
      params: flax NerfMLP param dict.
      x_enc: [..., F] encoded samples; v_enc: [..., Fv] encoded viewdirs
        (broadcastable leading dims) or None.
      skip_index: trunk skip period (NerfMLP.skip_index).
      dtype: compute dtype of the matmuls (NerfMLP.dtype).
      want_bottleneck: also return the view-independent bottleneck features
        (compute dtype), so callers can re-query the color head under a
        different view direction via `view_branch_apply` without paying a
        second trunk evaluation (the view-consistency loss does this).
      want_grad: when False, skip the gradient walk entirely and return
        g_enc=None — a plain forward that still exposes the bottleneck
        (used by the point-normals mode, which runs the chain only at the
        per-ray expected point instead of at every sample).
        (Stacking BOTH directions through one 2M-row condition matmul was
        also tried and measured WORSE — 111.9k vs 117.1k rays/s on v5e:
        the stacked [2,B,S,283] tensor materializes and breaks the fusion
        windows the separate small branch fuses into.)
    Returns:
      raw_rgb [..., 3] f32, raw_density [..., C] f32 — identical to
      NerfMLP.__call__ — and g_enc [..., F] f32, the gradient of the raw
      density channel 0 w.r.t. x_enc. With `want_bottleneck`, a 4th element:
      bottleneck [..., W] (compute dtype) or None when v_enc is None.
    """
    p = params["params"]
    trunk = [p[k] for k in sorted(p) if k.startswith("trunk_")]
    view = [p[k] for k in sorted(p) if k.startswith("view_")]
    net_depth = len(trunk)

    def dense(h, layer):
        return (h @ layer["kernel"].astype(dtype)
                + layer["bias"].astype(dtype))

    inputs = x_enc.astype(dtype)
    # --- trunk forward: acts[i] = relu(z_i); concat_after[i] marks the
    # stages whose output re-injects `inputs` (mirrors NerfMLP exactly,
    # including a concat after the final layer for exotic depth/skip). ---
    acts = []
    concat_after = []
    h = inputs
    for i in range(net_depth):
        a = jax.nn.relu(dense(h, trunk[i]))
        acts.append(a)
        if i % skip_index == 0 and i > 0:
            h = jnp.concatenate([a, inputs], axis=-1)
            concat_after.append(True)
        else:
            h = a
            concat_after.append(False)
    trunk_out = h  # density AND bottleneck consume the post-concat tensor

    raw_density = dense(trunk_out, p["density"])

    bottleneck = None
    if v_enc is not None:
        bottleneck = dense(trunk_out, p["bottleneck"])
        v = jnp.broadcast_to(v_enc.astype(dtype),
                             bottleneck.shape[:-1] + v_enc.shape[-1:])
        hv = jnp.concatenate([bottleneck, v], axis=-1)
        for layer in view:
            hv = jax.nn.relu(dense(hv, layer))
        raw_rgb = dense(hv, p["color"])
    else:
        raw_rgb = dense(trunk_out, p["color"])

    if not want_grad:
        if want_bottleneck:
            return (raw_rgb.astype(F32), raw_density.astype(F32), None,
                    bottleneck)
        return raw_rgb.astype(F32), raw_density.astype(F32), None

    # --- explicit gradient chain, walked back through the stages ---
    width = trunk[-1]["kernel"].shape[1]
    # d raw_sigma / d trunk_out: the density kernel's sigma column,
    # row-constant over the batch.
    g_h = jnp.broadcast_to(
        p["density"]["kernel"][:, 0].astype(dtype), trunk_out.shape)
    g_enc = jnp.zeros(x_enc.shape, dtype)
    for i in range(net_depth - 1, -1, -1):
        if concat_after[i]:
            g_enc = g_enc + g_h[..., width:]
            g_a = g_h[..., :width]
        else:
            g_a = g_h
        mask = (acts[i] > 0).astype(dtype)
        g_h = (g_a * mask) @ trunk[i]["kernel"].T.astype(dtype)
    g_enc = g_enc + g_h  # layer 0's input is the encoding itself
    if want_bottleneck:
        return (raw_rgb.astype(F32), raw_density.astype(F32),
                g_enc.astype(F32), bottleneck)
    return (raw_rgb.astype(F32), raw_density.astype(F32),
            g_enc.astype(F32))


def view_branch_apply(params, bottleneck: Array, v_enc: Array,
                      dtype: Any) -> Array:
    """Re-run ONLY the view-conditioned color branch on saved bottleneck
    features: concat(bottleneck, v_enc) -> view layers -> color head.

    Matches the tail of NerfMLP.__call__ (models/mlp.py:64-72) exactly, so
    for the same bottleneck and view encoding the result is identical to a
    full forward — but costs only the 1x128 condition stack instead of the
    8x256 trunk. Used by the view-consistency loss to query the radiance
    head under an alternate direction at near-zero cost (the full re-eval
    it replaces measured ~18% of the train step: XLA cannot CSE the
    mlp.apply trunk against the explicit-normals trunk).
    """
    p = params["params"]
    view = [p[k] for k in sorted(p) if k.startswith("view_")]

    def dense(h, layer):
        return (h @ layer["kernel"].astype(dtype)
                + layer["bias"].astype(dtype))

    bottleneck = bottleneck.astype(dtype)
    v = jnp.broadcast_to(v_enc.astype(dtype),
                         bottleneck.shape[:-1] + v_enc.shape[-1:])
    hv = jnp.concatenate([bottleneck, v], axis=-1)
    for layer in view:
        hv = jax.nn.relu(dense(hv, layer))
    return dense(hv, p["color"]).astype(F32)


def density_means_grad(g_enc: Array, x_enc: Array, min_deg: int,
                       max_deg: int) -> Array:
    """Chain d(raw_sigma)/d(enc) through the IPE to d(raw_sigma)/d(means).

    Uses the closed-form IPE Jacobian (module docstring): features are laid
    out [sin | cos], each block deg-major over the 3 position dims.

    Args:
      g_enc: [..., 2*L*3] gradient w.r.t. the encoding (f32).
      x_enc: [..., 2*L*3] the encoding itself (any float dtype).
    Returns:
      [..., 3] f32 gradient w.r.t. the sample means.
    """
    L = max_deg - min_deg
    half = L * 3
    enc = x_enc.astype(F32)
    g = g_enc.astype(F32)
    enc_sin, enc_cos = enc[..., :half], enc[..., half:]
    g_sin, g_cos = g[..., :half], g[..., half:]
    combined = g_sin * enc_cos - g_cos * enc_sin        # [..., L*3]
    scales = jnp.asarray(np.repeat(_scales(min_deg, max_deg), 3))
    weighted = combined * scales
    return jnp.sum(weighted.reshape(weighted.shape[:-1] + (L, 3)), axis=-2)
