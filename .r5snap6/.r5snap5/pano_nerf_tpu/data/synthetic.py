"""Procedural panoramic scene generator (Replica-style data without Replica).

Renders an analytic Lambertian box room — emissive patches, per-face
procedurally varying albedo, exact depth and normals — into the on-disk
format the reference consumes (EXR quads + transforms_all.json,
/root/reference/datasets/pano_datasets.py:49-131). Radiance is a pure
function of the 3-D hit point, so multi-view supervision is consistent and a
radiance field can actually fit it: this powers end-to-end training tests and
the benchmark workload when the Replica `bathroom_0` scene is not on disk.

Scenes are parameterized by `SceneSpec` (box extents, emitter patches on any
face); the default spec reproduces the original single-ceiling-emitter
box-room bitwise, and `SCENE_VARIANTS` ships alternates for quality-recipe
generality studies (NOTES.md).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Sequence, Tuple

import numpy as np

from pano_nerf_tpu.data.io_exr import write_exr
from pano_nerf_tpu.data.pano_dataset import bld_to_wd, equirect_camera_dirs

# Face order: [-x, +x, -y, +y, -z, +z] (y is up; face 3 is the ceiling).
_FACE_NORMALS = np.array([
    [-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1],
], dtype=np.float64)
_FACE_BASE_ALBEDO = np.array([
    [0.70, 0.25, 0.20], [0.20, 0.60, 0.65], [0.45, 0.40, 0.35],
    [0.75, 0.75, 0.70], [0.25, 0.30, 0.65], [0.60, 0.55, 0.20],
])


@dataclasses.dataclass(frozen=True)
class Emitter:
    """A square emissive patch on a box face.

    `center` are the coordinates on the face's two tangent axes (the
    non-face axes in ascending axis order); `half` is the patch half-extent;
    `radiance` the emitted HDR radiance. The default scene's emitter is
    deliberately large and moderately bright: a tiny very-bright source
    makes the K-direction irradiance estimator ill-conditioned (directions
    miss it), which destabilizes HDR recovery for this scene in the
    reference formulation and ours alike.
    """
    face: int = 3
    center: Tuple[float, float] = (0.0, 0.0)
    half: float = 1.3
    radiance: Tuple[float, float, float] = (9.0, 8.4, 7.2)


@dataclasses.dataclass(frozen=True)
class Occluder:
    """An axis-aligned box standing inside the room.

    Cameras see its EXTERIOR faces; it blocks emitter visibility (hard
    point-source shadows) in `_irradiance_at`. `albedo_shift` rolls the
    per-face base-albedo table so occluder faces are distinguishable
    from the room face behind them.
    """
    center: Tuple[float, float, float] = (1.2, -0.35, 0.8)
    half: Tuple[float, float, float] = (0.25, 1.15, 0.25)
    albedo_shift: int = 3


@dataclasses.dataclass(frozen=True)
class SceneSpec:
    """Analytic box-room description (half-extents + emissive patches).

    `albedo_mode`: "wave" (default) — the smooth sinusoidal modulation;
    its wave multiplies all three channels equally, so albedo CHROMA is
    constant per face (the easy case for the albedo-chroma prior).
    "checker" — a world-space checker alternating each face's base
    albedo with its hue-rotated complement: albedo chroma varies
    SPATIALLY within every face, the hard case for any prior that
    assumes locally consistent surface chroma.

    `occluders`: interior boxes that both occlude primary rays and cast
    hard shadows from every emitter (the point-source visibility term) —
    the geometry class where the irradiance integral must read the
    density field's OCCLUSION, not just the source intensity.
    """
    box: Tuple[float, float, float] = (2.0, 1.5, 2.5)
    emitters: Tuple[Emitter, ...] = (Emitter(),)
    albedo_mode: str = "wave"
    occluders: Tuple[Occluder, ...] = ()


# Default box half-extents, importable for geometry assertions.
BOX = np.array(SceneSpec().box, dtype=np.float64)


# The original box room (kept as the default everywhere: benchmarks,
# tests, and the quality anchors in NOTES.md/BASELINE.md are measured on
# it) plus alternates for recipe-generality studies.
SCENE_VARIANTS = {
    "default": SceneSpec(),
    # Harder HDR geometry: a smaller, brighter, strongly color-ordered
    # WALL emitter (secondary rays reach it at grazing angles from the
    # floor) plus a dim ceiling patch — tests that the shipped HDR recipe
    # generalizes beyond the scene its defaults were tuned on.
    "wall": SceneSpec(emitters=(
        Emitter(face=0, center=(0.2, 0.6), half=0.7,
                radiance=(11.0, 7.5, 5.0)),
        Emitter(face=3, center=(-0.6, -0.8), half=0.5,
                radiance=(2.5, 2.8, 3.2)),
    )),
    # Source separation: TWO saturating emitters with OPPOSITE chroma on
    # different faces (warm ceiling + cool wall). Every channel of both
    # exceeds or nears the knee, so LDR observations alone cannot order
    # them — tests whether the irradiance coupling attributes the right
    # spectrum to the right source.
    "duo": SceneSpec(emitters=(
        Emitter(face=3, center=(0.5, 0.5), half=0.8,
                radiance=(9.5, 8.0, 6.5)),
        Emitter(face=1, center=(-0.4, 0.3), half=0.8,
                radiance=(6.5, 8.0, 9.5)),
    )),
    # Attribution probes for the duo scene's cross-source chroma failure
    # (NOTES.md duo study: the cool wall source inherits the warm ceiling
    # spectrum). Each isolates one mechanism:
    #   duo_cool — the cool WALL source ALONE. If its chroma recovers
    #     correctly in isolation, the duo failure is joint-attribution;
    #     if it still comes out warm/flat, the wall-emitter geometry
    #     (weak grazing irradiance evidence) is the binding limit.
    #   duo_warm — the warm CEILING source alone (control; expected to
    #     recover, like the default box scene).
    #   duo_swap — same two positions, spectra exchanged (warm on the
    #     wall, cool on the ceiling). If the CEILING source always
    #     recovers its order regardless of spectrum, position/evidence
    #     strength drives attribution; if WARM always wins both sources,
    #     a learned spectrum prior couples them.
    "duo_cool": SceneSpec(emitters=(
        Emitter(face=1, center=(-0.4, 0.3), half=0.8,
                radiance=(6.5, 8.0, 9.5)),
    )),
    "duo_warm": SceneSpec(emitters=(
        Emitter(face=3, center=(0.5, 0.5), half=0.8,
                radiance=(9.5, 8.0, 6.5)),
    )),
    "duo_swap": SceneSpec(emitters=(
        Emitter(face=3, center=(0.5, 0.5), half=0.8,
                radiance=(6.5, 8.0, 9.5)),
        Emitter(face=1, center=(-0.4, 0.3), half=0.8,
                radiance=(9.5, 8.0, 6.5)),
    )),
    # Chromatic-texture generality: the default emitter over checker
    # albedo whose CHROMA varies spatially within each face (the wave
    # texture modulates all channels equally, so per-face chroma is
    # constant — exactly the condition the albedo-chroma prior and the
    # illuminant-compensated variant were tuned under). Gates whether
    # the shipped HDR recipes survive spatially-varying surface chroma.
    "checker": SceneSpec(albedo_mode="checker"),
    # Occlusion generality: the default scene plus a floor-to-mid-height
    # column that (a) the cameras see as foreground geometry and (b)
    # casts a hard shadow from the ceiling emitter onto the floor/walls.
    # Every other variant is a convex room interior where all surfaces
    # see all emitters; this is the first scene where the irradiance
    # integral's VISIBILITY (secondary rays marching through occluding
    # density) carries signal, and where the surface loss must agree
    # with shadowed GT.
    "shadow": SceneSpec(occluders=(Occluder(),)),
}


def _face_point(spec: SceneSpec, e: Emitter) -> np.ndarray:
    """3-D center of an emitter patch on its face."""
    axis = e.face // 2
    sign = 1.0 if e.face % 2 else -1.0
    oth = [a for a in range(3) if a != axis]
    c = np.zeros(3)
    c[axis] = sign * spec.box[axis]
    c[oth[0]], c[oth[1]] = e.center
    return c


def _intersect_box(origins: np.ndarray, dirs: np.ndarray,
                   box: np.ndarray
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ray/box-interior intersection.

    Args:
      origins, dirs: [N, 3] (origins strictly inside the box, dirs unit).
    Returns:
      t [N], hit points [N, 3], face index [N].
    """
    n = origins.shape[0]
    t_best = np.full(n, np.inf)
    face = np.zeros(n, dtype=np.int64)
    for axis in range(3):
        for sign, f in ((-1.0, 2 * axis), (1.0, 2 * axis + 1)):
            denom = dirs[:, axis]
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (sign * box[axis] - origins[:, axis]) / denom
            valid = (t > 1e-6) & np.isfinite(t) & (t < t_best)
            if not valid.any():
                continue
            p = origins[valid] + t[valid, None] * dirs[valid]
            oth = [a for a in range(3) if a != axis]
            inside = ((np.abs(p[:, oth[0]]) <= box[oth[0]] + 1e-9)
                      & (np.abs(p[:, oth[1]]) <= box[oth[1]] + 1e-9))
            idx = np.where(valid)[0][inside]
            t_best[idx] = t[idx]
            face[idx] = f
    # Edge-grazing rays can miss every face within tolerance (t = inf);
    # their hit point is undefined (inf * 0 -> nan) — callers filter by t.
    with np.errstate(invalid="ignore"):
        pts = origins + t_best[:, None] * dirs
    return t_best, pts, face


def _intersect_occluder(origins: np.ndarray, dirs: np.ndarray,
                        occ: Occluder) -> Tuple[np.ndarray, np.ndarray]:
    """Ray/box-EXTERIOR intersection (slab method).

    Returns t [N] (inf on miss) and hit face index [N] in the same
    [-x,+x,-y,+y,-z,+z] order as the room faces (outward normals).
    """
    c = np.asarray(occ.center, dtype=np.float64)
    h = np.asarray(occ.half, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (c - h - origins) / dirs
        t2 = (c + h - origins) / dirs
    # Degenerate axes (dir component == 0): inside the slab -> (-inf, inf)
    # from the division; exactly ON a slab boundary gives 0/0 = nan —
    # treat as non-blocking on that axis.
    lo = np.minimum(t1, t2)
    hi = np.maximum(t1, t2)
    lo = np.where(np.isnan(lo), -np.inf, lo)
    hi = np.where(np.isnan(hi), np.inf, hi)
    t_near = lo.max(axis=-1)
    t_far = hi.min(axis=-1)
    hit = (t_near < t_far) & (t_near > 1e-6)
    axis = lo.argmax(axis=-1)
    # Entering from the low side iff the entry t came from the (c-h) plane.
    enter_lo = np.take_along_axis(
        np.isclose(lo, t1), axis[:, None], axis=-1)[:, 0]
    face = 2 * axis + (~enter_lo).astype(np.int64)
    return np.where(hit, t_near, np.inf), face


def _trace(origins: np.ndarray, dirs: np.ndarray, spec: SceneSpec
           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
                      np.ndarray]:
    """Nearest hit against the room walls and every occluder.

    Returns t [N], points [N,3], face [N], inward surface normals [N,3],
    and occ_id [N] (-1 = room wall, else occluder index).
    """
    box = np.asarray(spec.box, dtype=np.float64)
    t, pts, face = _intersect_box(origins, dirs, box)
    occ_id = np.full(t.shape, -1, dtype=np.int64)
    for i, occ in enumerate(spec.occluders):
        t_o, face_o = _intersect_occluder(origins, dirs, occ)
        closer = t_o < t
        t = np.where(closer, t_o, t)
        face = np.where(closer, face_o, face)
        occ_id = np.where(closer, i, occ_id)
    with np.errstate(invalid="ignore"):
        pts = origins + t[:, None] * dirs
    # Room walls face inward (-outward); occluder exteriors face outward.
    normals = _FACE_NORMALS[face] * np.where(occ_id[:, None] >= 0, 1.0,
                                             -1.0)
    return t, pts, face, normals, occ_id


def _albedo_at(pts: np.ndarray, face: np.ndarray,
               mode: str = "wave",
               occ_id: np.ndarray | None = None,
               spec: SceneSpec | None = None) -> np.ndarray:
    """Per-face albedo in the NeRFactor-ish [0.05, 0.8].

    "wave": smooth sinusoidal modulation, constant chroma per face.
    "checker": world-space checker (cell 0.8) alternating the face's
    base albedo with its channel-rotated complement — spatially varying
    chroma with hard edges, plus the wave as intensity variation.
    Occluder hits (occ_id >= 0) read a rolled base-albedo table so the
    column is chromatically distinct from the wall behind it.
    """
    base = _FACE_BASE_ALBEDO[face]
    alt = np.roll(_FACE_BASE_ALBEDO, 1, axis=-1)[face]
    if occ_id is not None and spec is not None:
        for i, occ in enumerate(spec.occluders):
            rolled = np.roll(_FACE_BASE_ALBEDO, occ.albedo_shift, axis=0)
            on = occ_id == i
            base = np.where(on[:, None], rolled[face], base)
            alt = np.where(on[:, None],
                           np.roll(rolled, 1, axis=-1)[face], alt)
    wave = 0.5 + 0.5 * np.sin(2.1 * pts[:, 0]) * np.cos(1.7 * pts[:, 2]) \
        * np.sin(1.3 * pts[:, 1] + 0.7)
    if mode == "checker":
        parity = (np.floor(pts / 0.8).astype(np.int64).sum(-1) % 2
                  ).astype(np.float64)[:, None]
        base = base * (1.0 - parity) + alt * parity
    elif mode != "wave":
        raise ValueError(f"unknown albedo_mode {mode!r}")
    alb = base * (0.6 + 0.4 * wave[:, None])
    return np.clip(alb, 0.05, 0.8)


def _emitter_mask(spec: SceneSpec, e: Emitter, pts: np.ndarray,
                  face: np.ndarray) -> np.ndarray:
    axis = e.face // 2
    oth = [a for a in range(3) if a != axis]
    return ((face == e.face)
            & (np.abs(pts[:, oth[0]] - e.center[0]) < e.half)
            & (np.abs(pts[:, oth[1]] - e.center[1]) < e.half))


def _segment_blocked(starts: np.ndarray, end: np.ndarray,
                     spec: SceneSpec) -> np.ndarray:
    """True where the segment start -> end crosses any occluder box."""
    blocked = np.zeros(starts.shape[0], dtype=bool)
    d = end - starts
    for occ in spec.occluders:
        c = np.asarray(occ.center, dtype=np.float64)
        h = np.asarray(occ.half, dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (c - h - starts) / d
            t2 = (c + h - starts) / d
        lo = np.minimum(t1, t2)
        hi = np.maximum(t1, t2)
        lo = np.where(np.isnan(lo), -np.inf, lo)
        hi = np.where(np.isnan(hi), np.inf, hi)
        t_near = lo.max(axis=-1)
        t_far = hi.min(axis=-1)
        # Overlap of [t_near, t_far] with the open segment (0, 1); eps
        # margins keep surface-adjacent starts and the emitter end open.
        blocked |= ((t_near < t_far) & (t_far > 1e-4)
                    & (t_near < 1.0 - 1e-4))
    return blocked


def _irradiance_at(spec: SceneSpec, pts: np.ndarray, normals: np.ndarray
                   ) -> np.ndarray:
    """Approximate irradiance from the emissive patches + ambient bounce.

    Point-source approximation of each patch (center c, area A): E =
    L * A * cos(theta_r) * cos(theta_l) / d^2, plus a constant ambient term —
    smooth, positive, view-independent. Occluders gate the direct term
    (hard point-source shadows); the ambient bounce term stays unshadowed
    (shadows are lit by bounce light, not pitch black).
    """
    total = np.zeros((pts.shape[0], 3))
    for e in spec.emitters:
        c = _face_point(spec, e)
        n_e = -_FACE_NORMALS[e.face]          # inward patch normal
        rad = np.asarray(e.radiance, dtype=np.float64)
        area = (2 * e.half) ** 2
        v = c - pts
        d2 = np.sum(v * v, axis=-1) + 1e-6
        lv = v / np.sqrt(d2)[:, None]
        cos_r = np.clip(np.sum(normals * lv, axis=-1), 0.0, None)
        cos_l = np.clip(np.sum(-lv * n_e, axis=-1), 0.0, None)
        mean_L = rad.mean()
        direct = mean_L * area * cos_r * cos_l / d2
        if spec.occluders:
            shadow_starts = pts + 1e-4 * normals
            direct = np.where(_segment_blocked(shadow_starts, c, spec),
                              0.0, direct)
        ambient = 0.35 * mean_L * area / 20.0
        total = total + (direct + ambient)[:, None] * (rad / mean_L)
    return total


def render_pano(origin: np.ndarray, height: int, width: int,
                spec: SceneSpec = SceneSpec()):
    """Render one panorama quad set from a camera at `origin` (world, y-up).

    Returns dict of float32 arrays: image [H,W,3] HDR, albedo [H,W,3],
    normal [H,W,3] in [0,1] encoding, depth [H,W,1].
    """
    dirs, _ = equirect_camera_dirs(height, width)
    dirs = dirs.reshape(-1, 3).astype(np.float64)
    origins = np.broadcast_to(origin, dirs.shape)
    t, pts, face, normals, occ_id = _trace(origins, dirs, spec)
    albedo = _albedo_at(pts, face, spec.albedo_mode, occ_id, spec)

    irr = _irradiance_at(spec, pts, normals)
    radiance = albedo / np.pi * irr
    for e in spec.emitters:
        radiance[_emitter_mask(spec, e, pts, face) & (occ_id < 0)] \
            = e.radiance

    out = {
        "image": radiance.reshape(height, width, 3),
        "albedo": albedo.reshape(height, width, 3),
        "normal": ((normals + 1) / 2).reshape(height, width, 3),
        "depth": t.reshape(height, width, 1),
    }
    return {k: v.astype(np.float32) for k, v in out.items()}


def generate_scene(out_dir: str, n_views: int = 6, height: int = 64,
                   width: int = 128, seed: int = 0, factor: int = 1,
                   variant: str | SceneSpec = "default") -> dict:
    """Write a synthetic scene in the reference's on-disk layout.

    `height`/`width` are the stored resolution; pass the matching
    `factor` to PanoDataset (files are stored at the requested size, so use
    factor=1 unless you want extra downsampling). `variant` selects a
    SCENE_VARIANTS entry (or pass a SceneSpec directly).
    """
    spec = (SCENE_VARIANTS[variant] if isinstance(variant, str)
            else variant)
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    meta = {m: [] for m in ("image", "albedo", "normal", "depth")}

    def _inside_occluder(o: np.ndarray) -> bool:
        return any(np.all(np.abs(o - np.asarray(occ.center))
                          <= np.asarray(occ.half) + 0.05)
                   for occ in spec.occluders)

    b2w = bld_to_wd()
    for i in range(n_views):
        origin = rng.uniform(-0.5, 0.5, 3) * np.array([1.0, 0.6, 1.0])
        # Rejection keeps cameras out of interior occluders (no rng
        # consumption change for occluder-free variants).
        while _inside_occluder(origin):
            origin = rng.uniform(-0.5, 0.5, 3) * np.array([1.0, 0.6, 1.0])
        quads = render_pano(origin, height, width, spec)
        # The loader reconstructs origin as translate @ bld_to_wd()
        # (pano_datasets.py:96-97); store the pre-image of that map.
        translate = origin @ np.linalg.inv(b2w)
        mx = np.eye(4)
        mx[:3, -1] = translate
        for material, img in quads.items():
            sub = os.path.join(out_dir, material)
            os.makedirs(sub, exist_ok=True)
            rel = f"{material}/{i:03d}"
            write_exr(os.path.join(out_dir, rel + ".exr"), img,
                      pixel_type="float")
            meta[material].append({
                "file_path": rel,
                "transform_matrix": mx.tolist(),
            })

    with open(os.path.join(out_dir, "transforms_all.json"), "w") as fp:
        json.dump(meta, fp)
    return meta
