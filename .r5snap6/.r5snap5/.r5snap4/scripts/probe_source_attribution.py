"""Per-source irradiance-evidence attribution for multi-emitter scenes.

The duo study (NOTES.md) left one open quality frontier: with two
opposite-chroma saturating sources, the cool source inherits the warm
spectrum. This probe quantifies, per source, what the irradiance loss
actually READS — separating three candidate mechanisms:

  * coverage: how many of the D fixed env directions, fired from lit
    surface points (exactly as training does — the reference fires the
    same global Fibonacci set from every surface point,
    /root/reference/models/mip.py:154-194), hit each source at all, and
    what cosine-weighted share of the irradiance integrand each source
    commands;
  * env-scale fidelity: the chroma/intensity of the blurred-scale
    composite along source-hitting directions vs the source's GT
    radiance (the env-scale decoupling, probed pointwise by
    probe_env_scale.py, here aggregated per source);
  * fine-scale fidelity: the same rays marched densely at the
    primary-supervised scale — if fine is right where env is flat, the
    flattening lives in the blurred scale, not in the field.

Usage:
  python scripts/probe_source_attribution.py --data_path <scene> \
      --ckpt_dir <exp>/panonerf_0_1_2 --scene_variant duo [--n_points 64]

Prints one JSON line per source plus a non-source (wall) row.
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


def _gt_along(spec, origins: np.ndarray, dirs: np.ndarray):
    """GT radiance + source id for rays (origins inside the box).

    Returns (radiance [N, 3], source_id [N] with -1 = non-emitter hit,
    t_hit [N]). Mirrors data/synthetic.render_pano's shading exactly
    (occluder geometry/shadows and the variant's albedo mode included).
    """
    t, pts, face, normals, occ_id = synthetic._trace(
        origins.astype(np.float64), dirs.astype(np.float64), spec)
    # Edge-grazing rays can miss every face (t = inf); zero their hit
    # point for the shading math below — callers exclude them by t.
    pts = np.where(np.isfinite(t)[:, None], pts, 0.0)
    albedo = synthetic._albedo_at(pts, face, spec.albedo_mode, occ_id, spec)
    irr = synthetic._irradiance_at(spec, pts, normals)
    radiance = albedo / np.pi * irr
    sid = np.full(t.shape[0], -1, dtype=np.int64)
    for i, e in enumerate(spec.emitters):
        mask = synthetic._emitter_mask(spec, e, pts, face) & (occ_id < 0)
        radiance[mask] = e.radiance
        sid[mask] = i
    return radiance.astype(np.float32), sid, t.astype(np.float32)


def _surface_points(spec, n_points: int, seed: int):
    """Lit surface samples (point, inward normal), emitter pixels excluded."""
    rng = np.random.default_rng(seed)
    box = np.asarray(spec.box, dtype=np.float64)
    pts_out, nrm_out = [], []
    while len(pts_out) < n_points:
        n_draw = 4 * n_points
        origins = rng.uniform(-0.5, 0.5, size=(n_draw, 3)) * box
        # Keep probe origins out of interior occluders (shadow variants).
        for occ in spec.occluders:
            inside = np.all(np.abs(origins - np.asarray(occ.center))
                            <= np.asarray(occ.half) + 0.02, axis=-1)
            origins = origins[~inside]
        d = rng.normal(size=(origins.shape[0], 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        _, pts, face, normals, occ_id = synthetic._trace(origins, d, spec)
        on_emitter = np.zeros(origins.shape[0], dtype=bool)
        for e in spec.emitters:
            on_emitter |= (synthetic._emitter_mask(spec, e, pts, face)
                           & (occ_id < 0))
        # Rays grazing a box edge can miss every face within tolerance
        # (t = inf) — drop them rather than propagate non-finite points.
        keep = ~on_emitter & np.isfinite(pts).all(-1)
        pts_out.extend(pts[keep])
        nrm_out.extend(normals[keep])
    pts = np.asarray(pts_out[:n_points], np.float32)
    nrm = np.asarray(nrm_out[:n_points], np.float32)
    return pts + EPS_OFF_SURFACE * nrm, nrm


def _composite(model, params, means, covs, t_s, dirs_flat):
    """Composite radiance along flattened secondary rays [R, S, 3].

    Returns (composite [R, 3], per-sample weights [R, S], per-sample
    rgb [R, S, 3], acc [R]).
    """
    raw_rgb, raw_den = model._raw_outputs(params, means, covs, dirs_flat)[:2]
    rgb, den = model._activate_rgb_density(
        raw_rgb, raw_den, jax.random.PRNGKey(1), False)
    vr = mip.volumetric_rendering(rgb, den, t_s, dirs_flat, False)
    return (np.asarray(vr[0]), np.asarray(vr[3]), np.asarray(rgb),
            np.asarray(vr[2]))


def attribute(params, model, env_rays, spec, n_points: int = 64,
              seed: int = 0, fine_samples: int = 96) -> dict:
    """Per-source irradiance-evidence report (see module docstring)."""
    pts, normals = _surface_points(spec, n_points, seed)
    dirs = np.asarray(env_rays.directions, np.float32)      # [D, 3]
    N, D = pts.shape[0], dirs.shape[0]

    # Geometry / GT for every (point, dir) pair.
    p_rep = np.repeat(pts, D, axis=0)                        # [N*D, 3]
    d_til = np.tile(dirs, (N, 1))                            # [N*D, 3]
    gt_rgb, sid, t_hit = _gt_along(spec, p_rep, d_til)
    cos = np.maximum(np.sum(np.repeat(normals, D, axis=0) * d_til, -1), 0.0)

    # Env-scale march: the EXACT training irradiance query (fixed mode).
    k = jax.random.PRNGKey(seed)
    t_e, (m_e, c_e), vd = mip.sample_env_rays(
        k, jnp.asarray(pts), jnp.asarray(dirs), model.num_env_samples,
        env_rays.near, env_rays.far, env_rays.radii, False)
    S = model.num_env_samples
    env_comp, env_w, env_rgb_s, env_acc = _composite(
        model, params, m_e.reshape(N * D, S, 3), c_e.reshape(N * D, S, 3),
        t_e.reshape(N * D, S + 1), vd.reshape(N * D, 3))
    t_env = np.asarray(t_e).reshape(N * D, S + 1)
    tm_env = 0.5 * (t_env[:, :-1] + t_env[:, 1:])                # [N*D, S]

    # Tight-scale color re-read (BaseNeRF.env_tight_rgb): when the model
    # trains with the blur-dilution fix, the irradiance integral
    # composites rgb read at scaled covariances against the blurred
    # weights — report THAT quantity so the probe measures what training
    # actually consumed (and whether the dilution is gone).
    tight_comp, tight_rgb_s = None, None
    if getattr(model, "env_tight_rgb", 0.0) > 0:
        raw_rgb_t, raw_den_t = model._raw_outputs(
            params, m_e.reshape(N * D, S, 3),
            (c_e * model.env_tight_rgb).reshape(N * D, S, 3),
            vd.reshape(N * D, 3))[:2]
        rgb_t, _ = model._activate_rgb_density(
            raw_rgb_t, raw_den_t, jax.random.PRNGKey(1), False)
        tight_rgb_s = np.asarray(rgb_t)                  # [N*D, S, 3]
        tight_comp = (env_w[..., None] * tight_rgb_s).sum(-2)

    # Illuminant-field chroma (BaseNeRF.illum_field, round-5 duo attack
    # #8): the per-(point, direction) softmax chroma the field re-tints
    # the consumed read with. The duo question is whether THIS quantity
    # separates the sources (opposite chroma along the two source
    # directions) where the radiance field's own secondary chroma
    # collapses to the scene mean.
    illum_ch = None
    if getattr(model, "illum_field", False) and \
            "illum" in params.get("params", {}):
        illum_ch = np.asarray(model._illum_chroma(
            params, jnp.asarray(pts),
            jnp.broadcast_to(jnp.asarray(dirs)[None], (N, D, 3)))
        ).reshape(N * D, 3)

    # Fine-scale march of the same rays, ending just past the GT hit.
    box_diag = 2.0 * float(np.linalg.norm(spec.box))
    far = jnp.asarray(np.minimum(t_hit + 0.5, box_diag).reshape(N, D, 1))
    t_f, (m_f, c_f), _ = mip.sample_env_rays(
        k, jnp.asarray(pts), jnp.asarray(dirs), fine_samples,
        jnp.zeros((N, D, 1), jnp.float32), far, env_rays.radii, False)
    fine_comp = _composite(
        model, params, m_f.reshape(N * D, fine_samples, 3),
        c_f.reshape(N * D, fine_samples, 3),
        t_f.reshape(N * D, fine_samples + 1), vd.reshape(N * D, 3))[0]

    above = (cos > 0.0) & np.isfinite(t_hit)
    total_cos = float(cos[above].sum()) or 1.0
    rows = []
    classes = [(i, f"source{i}") for i in range(len(spec.emitters))]
    classes.append((-1, "nonsource"))
    for cid, tag in classes:
        m = (sid == cid) & above
        row = {"class": tag, "pairs": int(m.sum()),
               "coverage": round(float(m.sum() / max(above.sum(), 1)), 4),
               "evidence_share": round(float(cos[m].sum() / total_cos), 4)}
        if cid >= 0:
            row["face"] = spec.emitters[cid].face
            row["gt_rgb"] = [round(float(x), 3)
                             for x in spec.emitters[cid].radiance]
        if m.any():
            for key, val in (("env_rgb", env_comp), ("fine_rgb", fine_comp),
                             ("gt_seen_rgb", gt_rgb)):
                row[key] = [round(float(x), 3) for x in val[m].mean(0)]
            if tight_comp is not None:
                row["tight_rgb"] = [round(float(x), 3)
                                    for x in tight_comp[m].mean(0)]
            if illum_ch is not None:
                row["illum_chroma"] = [round(float(x), 3)
                                       for x in illum_ch[m].mean(0)]
            # Under-read decomposition along these rays (env scale): how
            # much compositing weight lands BEFORE the GT hit (phantom
            # occluders), AT/past it (the source's own depth), and what
            # radiance the field paints there — separating "the march is
            # occluded by phantom density" from "the blurred radiance at
            # the source depth is diluted/wrong".
            at_src = tm_env[m] >= 0.8 * t_hit[m][:, None]        # [P, S]
            w_m = env_w[m]
            w_at = (w_m * at_src).sum(-1)
            row["env_w_before"] = round(float((w_m * ~at_src).sum(-1)
                                              .mean()), 4)
            row["env_w_at_source"] = round(float(w_at.mean()), 4)
            row["env_acc"] = round(float(env_acc[m].mean()), 4)
            num = (w_m[..., None] * at_src[..., None]
                   * env_rgb_s[m]).sum(1)
            rgb_at = num / np.maximum(w_at, 1e-6)[:, None]
            row["env_rgb_at_source"] = [
                round(float(x), 3)
                for x in rgb_at[w_at > 1e-3].mean(0)] \
                if (w_at > 1e-3).any() else None
            if tight_rgb_s is not None and (w_at > 1e-3).any():
                # The dilution headline number at the TIGHT read: what
                # radiance the fix delivers at the source depth (vs
                # env_rgb_at_source's blurred, ~20x-diluted value).
                num_t = (w_m[..., None] * at_src[..., None]
                         * tight_rgb_s[m]).sum(1)
                rgb_at_t = num_t / np.maximum(w_at, 1e-6)[:, None]
                row["tight_rgb_at_source"] = [
                    round(float(x), 3)
                    for x in rgb_at_t[w_at > 1e-3].mean(0)]
            # Chroma = channel fractions; flat spectrum -> [1/3, 1/3, 1/3].
            for key in ("env_rgb", "fine_rgb", "gt_seen_rgb"):
                v = np.asarray(row[key], np.float64)
                row[key.replace("_rgb", "_chroma")] = [
                    round(float(x), 3) for x in v / max(v.sum(), 1e-6)]
        rows.append(row)
    return {"n_points": N, "n_dirs": D, "env_samples": S,
            "fine_samples": fine_samples, "rows": rows}


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
    p.add_argument("--scene_variant", default="duo")
    p.add_argument("--n_points", type=int, default=64)
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
    rep = attribute(state.params, tr.system.model, tr.system.env_rays, spec,
                    n_points=int(h["n_points"]), seed=int(h["probe_seed"]))
    for row in rep["rows"]:
        print(json.dumps(row), flush=True)
    print(json.dumps({"meta": {k: rep[k] for k in
                               ("n_points", "n_dirs", "env_samples",
                                "fine_samples")}}))


if __name__ == "__main__":
    main()
