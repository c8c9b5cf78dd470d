"""Shadow-contrast probe: does the learned irradiance integral read
VISIBILITY from the density field?

On the `shadow` scene (data/synthetic.py: interior column + hard
point-source shadows) every prior scene's irradiance signal was pure
source intensity — the room is convex, all surfaces see all emitters.
Here the GT direct term is gated by the occluder, so the model's
secondary-march irradiance estimate at a shadowed floor point is only
correct if the marched density field OCCLUDES the rays toward the
emitter (the paper's geometry-aware shading claim, reference
models/pano_mip_nerf.py:315-359, exercised for the first time with a
visibility term in the GT).

The probe samples floor points on both sides of the GT shadow boundary,
computes the model's training-time irradiance estimate at each (the
fixed env-direction set, blurred-scale march, cosine x solid-angle
combine — exactly the eval-mode irradiance query), and reports the
shadow CONTRAST (lit/shadow luma ratio) for prediction vs GT, plus the
irradiance error per class. A model that fits the images but fails to
place the column's density would show pred contrast ~1 against GT >> 1.

Usage:
  python scripts/probe_shadow.py --data_path <scene> \
      --ckpt_dir <exp>/panonerf_0_1_2 [--scene_variant shadow] [--n 96]

Prints one JSON line per class (shadowed / lit) plus a contrast summary.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")  # eager probe stays off the tunnel

import jax.numpy as jnp
import numpy as np

from pano_nerf_tpu.data import synthetic
from pano_nerf_tpu.ops import mip

EPS_OFF_SURFACE = 1e-3


def _floor_points(spec, n: int, seed: int):
    """Floor samples split by GT shadow state (direct term blocked from
    EVERY bright emitter vs visible to ALL). Returns (pts_shadow,
    pts_lit), both offset off the surface with up normals."""
    rng = np.random.default_rng(seed)
    box = np.asarray(spec.box, dtype=np.float64)
    sh, lit = [], []
    want = n // 2
    while min(len(sh), len(lit)) < want:
        p = np.column_stack([
            rng.uniform(-box[0] + 0.1, box[0] - 0.1, 8 * n),
            np.full(8 * n, -box[1]),
            rng.uniform(-box[2] + 0.1, box[2] - 0.1, 8 * n)])
        # Exclude points under/inside an occluder footprint.
        keep = np.ones(p.shape[0], dtype=bool)
        for occ in spec.occluders:
            c, h = np.asarray(occ.center), np.asarray(occ.half)
            keep &= ~((np.abs(p[:, 0] - c[0]) <= h[0] + 0.05)
                      & (np.abs(p[:, 2] - c[2]) <= h[2] + 0.05))
        p = p[keep]
        up = np.broadcast_to(np.array([0.0, 1.0, 0.0]), p.shape)
        starts = p + EPS_OFF_SURFACE * up
        blocked = np.zeros(p.shape[0], dtype=bool)
        for e in spec.emitters:
            if max(e.radiance) < 4.0:
                continue  # dim fill emitters don't define the shadow
            c = synthetic._face_point(spec, e)
            blocked |= synthetic._segment_blocked(starts, c, spec)
        sh.extend(starts[blocked])
        lit.extend(starts[~blocked])
    return (np.asarray(sh[:want], np.float32),
            np.asarray(lit[:want], np.float32))


def _march(model, params, m, c, vd, t):
    """Composite one flattened batch of secondary rays; returns
    (composite [R,3], weights [R,S])."""
    raw_rgb, raw_den = model._raw_outputs(params, m, c, vd)[:2]
    rgb, den = model._activate_rgb_density(
        raw_rgb, raw_den, jax.random.PRNGKey(1), False)
    vr = mip.volumetric_rendering(rgb, den, t, vd, False)
    return vr[0], vr[3]


def _pred_irradiance(model, params, env_rays, pts: np.ndarray,
                     return_comp: bool = False):
    """The model's irradiance estimate at `pts` (up normals), mirroring
    what training CONSUMES for the checkpoint's knobs: the blurred-scale
    march by default; the tight-scale composite for env_tight_weights;
    the blurred-weights x tight-rgb read for a raw env_tight_rgb carrier
    (etr). The chroma-only combine (etc) keeps the blurred LUMA, and
    shadows are a luma phenomenon, so the blurred read is reported for
    it (the chroma swap cannot change the contrast)."""
    dirs = jnp.asarray(env_rays.directions)                  # [D, 3]
    N, D = pts.shape[0], dirs.shape[0]
    S = model.num_env_samples
    t_e, (m_e, c_e), vd = mip.sample_env_rays(
        jax.random.PRNGKey(0), jnp.asarray(pts), dirs, S,
        env_rays.near, env_rays.far, env_rays.radii, False)
    m_f = m_e.reshape(N * D, S, 3)
    c_f = c_e.reshape(N * D, S, 3)
    vd_f = vd.reshape(N * D, 3)
    t_f = t_e.reshape(N * D, S + 1)
    scale = getattr(model, "env_tight_rgb", 0.0)
    if getattr(model, "env_tight_weights", False):
        comp, _ = _march(model, params, m_f, c_f * scale, vd_f, t_f)
    elif getattr(model, "env_resample", False):
        comp_b, w_b = _march(model, params, m_f, c_f, vd_f, t_f)
        t2, (m2, c2) = model._resample_env(
            jax.random.PRNGKey(0), jnp.asarray(pts), vd,
            env_rays.radii, t_e, np.asarray(w_b).reshape(N, D, S), False)
        Sf = m2.shape[-2]
        comp, _ = _march(model, params, m2.reshape(N * D, Sf, 3),
                         c2.reshape(N * D, Sf, 3), vd_f,
                         t2.reshape(N * D, Sf + 1))
    elif scale > 0 and not getattr(model, "env_tight_chroma", False):
        _, w_b = _march(model, params, m_f, c_f, vd_f, t_f)
        raw_rgb_t, raw_den_t = model._raw_outputs(
            params, m_f, c_f * scale, vd_f)[:2]
        rgb_t, _ = model._activate_rgb_density(
            raw_rgb_t, raw_den_t, jax.random.PRNGKey(1), False)
        comp = jnp.sum(w_b[..., None] * rgb_t, axis=-2)
    else:
        comp, _ = _march(model, params, m_f, c_f, vd_f, t_f)
    comp = np.asarray(comp).reshape(N, D, 3)
    cos = np.maximum(np.asarray(dirs)[None, :, 1], 0.0)      # up normal
    domega = np.asarray(env_rays.lossmult).reshape(1, D)
    irr = (comp * (cos * domega)[..., None]).sum(1)
    return (irr, comp) if return_comp else irr


def _per_direction_report(model, params, env_rays, spec, pts: np.ndarray):
    """Mechanism decomposition: along each (point, env-direction) ray,
    compare the marched composite against GT radiance, split by what the
    GT ray hits (occluder column / emitter / other wall). A march that
    cannot RESOLVE the column shows pred >> GT exactly on the occluder
    class (it reads the emitter/wall through the column)."""
    dirs = np.asarray(env_rays.directions, np.float64)
    N, D = pts.shape[0], dirs.shape[0]
    _, comp = _pred_irradiance(model, params, env_rays, pts,
                               return_comp=True)
    p_rep = np.repeat(pts.astype(np.float64), D, axis=0)
    d_til = np.tile(dirs, (N, 1))
    t, hp, face, _, occ_id = synthetic._trace(p_rep, d_til, spec)
    gt_rgb = np.zeros((N * D, 3))
    keep = np.isfinite(t)
    # GT radiance along the ray = render_pano's shading at the hit point.
    alb = synthetic._albedo_at(np.where(keep[:, None], hp, 0.0), face,
                               spec.albedo_mode, occ_id, spec)
    nrm = synthetic._FACE_NORMALS[face] * np.where(
        occ_id[:, None] >= 0, 1.0, -1.0)
    irr = synthetic._irradiance_at(spec, np.where(keep[:, None], hp, 0.0),
                                   nrm)
    gt_rgb = alb / np.pi * irr
    is_emit = np.zeros(N * D, dtype=bool)
    for e in spec.emitters:
        m = synthetic._emitter_mask(spec, e, hp, face) & (occ_id < 0)
        gt_rgb[m] = e.radiance
        is_emit |= m
    cls = np.where(occ_id >= 0, "occluder",
                   np.where(is_emit, "emitter", "wall"))
    rows = []
    comp_flat = comp.reshape(N * D, 3)
    for tag in ("occluder", "emitter", "wall"):
        m = (cls == tag) & keep
        if not m.any():
            continue
        rows.append({"gt_hit": tag, "pairs": int(m.sum()),
                     "gt_luma": round(float(gt_rgb[m].mean()), 4),
                     "pred_luma": round(float(comp_flat[m].mean()), 4)})
    return rows


def _albedo_report(model, params, spec, p_sh: np.ndarray,
                   p_lit: np.ndarray) -> dict:
    """Shadow-baking measurement: expected surface albedo at the floor
    points via a downward primary-style march. GT albedo is
    shadow-FREE (irradiance and albedo are independent in the
    generator), so pred lit/shadow albedo ratio >> 1 means the
    decomposition explains the shadow with dark albedo instead of low
    irradiance — the exact failure a fog irradiance forces."""
    out = {}
    for tag, pts in (("shadow", p_sh), ("lit", p_lit)):
        N = pts.shape[0]
        origins = jnp.asarray(pts) + jnp.asarray([0.0, 0.8, 0.0])
        dirs = jnp.tile(jnp.asarray([[0.0, -1.0, 0.0]]), (N, 1))
        t, (m, c) = mip.sample_along_rays(
            jax.random.PRNGKey(0), origins, dirs,
            jnp.full((N, 1), 0.01), model.num_samples,
            jnp.full((N, 1), 0.05), jnp.full((N, 1), 1.2), False, False)
        raw_rgb, raw_den = model._raw_outputs(params, m, c, dirs)[:2]
        _, alb, _ = model._split_heads(raw_den)
        rgb, den = model._activate_rgb_density(
            raw_rgb, raw_den[..., :1], jax.random.PRNGKey(1), False)
        w = mip.volumetric_rendering(rgb, den, t, dirs, False)[3]
        w = w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-6)
        pred = np.asarray(jnp.sum(w[..., None] * alb, axis=-2))
        gt = synthetic._albedo_at(pts.astype(np.float64),
                                  np.full(N, 2, dtype=np.int64),
                                  spec.albedo_mode)
        out[tag] = {"pred": float(pred.mean()), "gt": float(gt.mean())}
    return {
        "albedo_lit_over_shadow_pred": round(
            out["lit"]["pred"] / max(out["shadow"]["pred"], 1e-6), 3),
        "albedo_lit_over_shadow_gt": round(
            out["lit"]["gt"] / max(out["shadow"]["gt"], 1e-6), 3),
        "albedo_pred_shadow": round(out["shadow"]["pred"], 4),
        "albedo_pred_lit": round(out["lit"]["pred"], 4),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--config", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "panonerf.yaml"))
    p.add_argument("--meta_file", default="transforms_all")
    p.add_argument("--reform_cam", type=int, default=0)
    p.add_argument("--range", nargs="+", type=float, default=[0, 10])
    p.add_argument("--scene_variant", default="shadow")
    p.add_argument("--n", type=int, default=96)
    p.add_argument("--probe_seed", type=int, default=0)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    from pano_nerf_tpu.core.config import parse_args
    from pano_nerf_tpu.engine.trainer import Trainer
    from train import prepare_hparams
    h = parse_args(p)

    ckpt_dir = os.path.abspath(h["ckpt_dir"])
    h["out_dir"] = os.path.dirname(ckpt_dir) or "."
    h = prepare_hparams(h)
    h["save_dir"] = ckpt_dir

    tr = Trainer(h)
    state = tr.ckpt.restore(tr.system.create_state(jax.random.PRNGKey(0)))
    spec = synthetic.SCENE_VARIANTS[h["scene_variant"]]
    if not spec.occluders:
        raise SystemExit("scene variant has no occluders — nothing to probe")

    p_sh, p_lit = _floor_points(spec, int(h["n"]), int(h["probe_seed"]))
    up = np.array([[0.0, 1.0, 0.0]])
    rows = {}
    for tag, pts in (("shadow", p_sh), ("lit", p_lit)):
        gt = synthetic._irradiance_at(
            spec, pts.astype(np.float64),
            np.broadcast_to(up, pts.shape))
        pred = _pred_irradiance(tr.system.model, state.params,
                                tr.system.env_rays, pts)
        row = {"class": tag, "points": int(pts.shape[0]),
               "gt_irr": [round(float(x), 4) for x in gt.mean(0)],
               "pred_irr": [round(float(x), 4) for x in pred.mean(0)],
               "gt_luma": round(float(gt.mean()), 4),
               "pred_luma": round(float(pred.mean()), 4)}
        rows[tag] = row
        print(json.dumps(row), flush=True)
    for row in _per_direction_report(tr.system.model, state.params,
                                     tr.system.env_rays, spec, p_sh):
        print(json.dumps(row), flush=True)
    print(json.dumps(_albedo_report(tr.system.model, state.params, spec,
                                    p_sh, p_lit)), flush=True)
    summary = {
        "gt_contrast": round(rows["lit"]["gt_luma"]
                             / max(rows["shadow"]["gt_luma"], 1e-6), 3),
        "pred_contrast": round(rows["lit"]["pred_luma"]
                               / max(rows["shadow"]["pred_luma"], 1e-6), 3),
        "pred_over_gt_shadow": round(rows["shadow"]["pred_luma"]
                                     / max(rows["shadow"]["gt_luma"], 1e-6),
                                     3),
        "pred_over_gt_lit": round(rows["lit"]["pred_luma"]
                                  / max(rows["lit"]["gt_luma"], 1e-6), 3),
    }
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
