"""HDR source-recovery study: env-direction estimator variants at ~1x cost.

The paper's headline capability is HDR radiance recovery — and the
reference's fixed Fibonacci irradiance estimator makes the emitter's
radiance diverge at the default D=10 directions (coverage bias), while
naive per-ray rotation at D=10 diverges faster (high estimator variance
rectified through the concave tonemap: NOTES.md HDR study). This harness
compares the `nerf.env_sampling` estimator modes and D/S cost splits on
the full train.py pipeline on the synthetic box-room scene, tracking per
validation step,

  * HDR / LDR ws-PSNR (from metrics.jsonl, the trainer's own log), and
  * predicted-vs-GT emitter radiance, recovered from the saved
    gt_hdr / pred_hdr EXR products (emitter pixels = GT radiance > 4;
    surfaces are < ~1.5, the emitter is 7.2-9.0).

Usage:
  python scripts/hdr_study.py --steps 44000 --variants rotated fixed \
      [--out /tmp/hdr_study]

Prints one JSON line per variant plus a final summary line.
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pano_nerf_tpu.data.io_exr import read_exr  # noqa: E402

EMITTER_THRESHOLD = 4.0


# Variant -> config overrides. D = nerf.num_ray_samples (directions),
# S = nerf.num_env_samples (samples per env ray); cost scales with D*S
# (reference default 10x10).
VARIANTS = {
    # The shipped configs/panonerf.yaml exactly as users get it.
    "prod": {},
    "fixed": {"nerf.env_sampling": "fixed"},
    "rotated": {"nerf.env_sampling": "rotated"},
    "importance": {"nerf.env_sampling": "importance"},
    "strat10": {"nerf.env_sampling": "stratified"},
    "strat40s3": {"nerf.env_sampling": "stratified",
                  "nerf.num_ray_samples": 40, "nerf.num_env_samples": 3},
    "strat40s2": {"nerf.env_sampling": "stratified",
                  "nerf.num_ray_samples": 40, "nerf.num_env_samples": 2},
    # Rotated rigid lattice at higher D / fewer samples per env ray: the
    # measured variance sweet spot (the rigid Fibonacci geometry is itself
    # a stratification; jittering it measurably hurts).
    "rot40s3": {"nerf.env_sampling": "rotated",
                "nerf.num_ray_samples": 40, "nerf.num_env_samples": 3},
    "rot40s2": {"nerf.env_sampling": "rotated",
                "nerf.num_ray_samples": 40, "nerf.num_env_samples": 2},
    "rot64s2": {"nerf.env_sampling": "rotated",
                "nerf.num_ray_samples": 64, "nerf.num_env_samples": 2},
    # Gold estimator (4x cost): convergence reference for the study.
    "rot40s10": {"nerf.env_sampling": "rotated",
                 "nerf.num_ray_samples": 40, "nerf.num_env_samples": 10},
    # Delayed surface loss: let the radiance field converge in LDR first.
    "rot40s3d": {"nerf.env_sampling": "rotated",
                 "nerf.num_ray_samples": 40, "nerf.num_env_samples": 3,
                 "train.surface_start_step": 0.2},
    "rot40s2d": {"nerf.env_sampling": "rotated",
                 "nerf.num_ray_samples": 40, "nerf.num_env_samples": 2,
                 "train.surface_start_step": 0.2},
    # With the round-2 stabilizer losses (distortion + saturation knee
    # prior) at their yaml defaults — the "x" suffix marks runs after the
    # loss change; earlier variants ran without those terms.
    "refx": {"nerf.env_sampling": "fixed"},
    "rot40s3x": {"nerf.env_sampling": "rotated",
                 "nerf.num_ray_samples": 40, "nerf.num_env_samples": 3},
    "rot40s10x": {"nerf.env_sampling": "rotated",
                  "nerf.num_ray_samples": 40, "nerf.num_env_samples": 10},
    "rotx": {"nerf.env_sampling": "rotated"},
    # With the unclipped-prediction tonemap fix on top of the stabilizers.
    "refx2": {"nerf.env_sampling": "fixed"},
    # Round-3: view-consistency loss on top of refx2 — ties the
    # view-dependent radiance head across directions so irradiance
    # evidence can lift saturated sources above the knee (the measured
    # decoupling, NOTES.md HDR study mechanism 2). Number = weight.
    "vc003": {"nerf.env_sampling": "fixed", "loss.view_consistency": 0.03},
    "vc01": {"nerf.env_sampling": "fixed", "loss.view_consistency": 0.1},
    "vc03": {"nerf.env_sampling": "fixed", "loss.view_consistency": 0.3},
    "vc1": {"nerf.env_sampling": "fixed", "loss.view_consistency": 1.0},
    # VC + weakened saturation-knee prior: with the head tied, the
    # irradiance evidence must out-pull w_sat to lift the emitter ABOVE
    # the knee — probe whether the 0.01 default is the binding constraint.
    "vc01s": {"nerf.env_sampling": "fixed", "loss.view_consistency": 0.1,
              "loss.saturation_loss": 0.003},
    "vc03s": {"nerf.env_sampling": "fixed", "loss.view_consistency": 0.3,
              "loss.saturation_loss": 0.003},
    # Measured vc01s = HDR -0.90 @44k (best in repo; beats refx2's 88k
    # asymptote in half the steps) with the emitter still below the knee:
    # probe whether the VC tie alone now supplies the stability the knee
    # prior was providing, freeing the emitter to rise to the true level.
    "vc01s1": {"nerf.env_sampling": "fixed", "loss.view_consistency": 0.1,
               "loss.saturation_loss": 0.001},
    "vc01s0": {"nerf.env_sampling": "fixed", "loss.view_consistency": 0.1,
               "loss.saturation_loss": 0.0},
    # Training FLOP-diet quality probes (round 3): shorter ray march
    # and/or fewer samples per secondary env ray. Quality gates the
    # production adoption of the faster operating point. NOTE: the "cN"
    # names are historical — those runs executed N coarse + N fine
    # samples (the old num_coarse_samples knob leaked the cut into the
    # fine resampler); under the corrected knob semantics the SAME
    # computation is num_samples=N, which is what these now set.
    "vc01s1c32": {"nerf.env_sampling": "fixed",
                  "loss.view_consistency": 0.1,
                  "loss.saturation_loss": 0.001,
                  "nerf.num_samples": 32},
    "vc01s1e5": {"nerf.env_sampling": "fixed",
                 "loss.view_consistency": 0.1,
                 "loss.saturation_loss": 0.001,
                 "nerf.num_env_samples": 5},
    "vc01s1c32e5": {"nerf.env_sampling": "fixed",
                    "loss.view_consistency": 0.1,
                    "loss.saturation_loss": 0.001,
                    "nerf.num_samples": 32,
                    "nerf.num_env_samples": 5},
    # Diet isolation at the beyond-knee recipe (vc 0.1, sat 0): which knob
    # pays the measured -1.6 dB LDR of the combined diet — the coarse CDF
    # cut or the env-ray sample cut?
    "vc01s0c32": {"nerf.env_sampling": "fixed",
                  "loss.view_consistency": 0.1,
                  "loss.saturation_loss": 0.0,
                  "nerf.num_samples": 32},
    "vc01s0e5": {"nerf.env_sampling": "fixed",
                 "loss.view_consistency": 0.1,
                 "loss.saturation_loss": 0.0,
                 "nerf.num_env_samples": 5},
    "vc01s0c48": {"nerf.env_sampling": "fixed",
                  "loss.view_consistency": 0.1,
                  "loss.saturation_loss": 0.0,
                  "nerf.num_samples": 48},
    # Gentler coarse cut (the round-3 production-default candidate: +5%
    # rays/s; c48's +27% measurably pins the emitter back AT the knee).
    "vc01s0c56": {"nerf.env_sampling": "fixed",
                  "loss.view_consistency": 0.1,
                  "loss.saturation_loss": 0.0,
                  "nerf.num_samples": 56},
    # Point-normals (round-3): ONE density-gradient query at the per-ray
    # expected Gaussian instead of the per-sample chain (+~90% train
    # rays/s). Semantics: -grad sigma(E[x]) vs E[-grad sigma(x_i)].
    "pnorm": {"nerf.point_normals": True},
    # Point-normals + delayed surface loss: give the volumetric field 10%
    # of the schedule to localize surfaces before the expected-point
    # normal query starts steering the surface loss.
    "pnormd": {"nerf.point_normals": True,
               "train.surface_start_step": 0.1},
    # Point-normals with the reference's env S=10: spend part of the +45%
    # step-cost saving on secondary-march quality to stabilize HDR.
    "pnorm_e10": {"nerf.point_normals": True,
                  "nerf.num_env_samples": 10},
    "vc01s0c32e5": {"nerf.env_sampling": "fixed",
                    "loss.view_consistency": 0.1,
                    "loss.saturation_loss": 0.0,
                    "nerf.num_samples": 32,
                    "nerf.num_env_samples": 5},
    # Emissive-surface decomposition (round-3 HDR attack #2): explicit
    # view-independent self-emission channels; surface render becomes
    # emission + reflection. On top of the shipped defaults (vc 0.1, s0).
    "em": {"nerf.emissive_head": True},
    # Sparsity sweep: weaker prior frees the emitter to carry more
    # intensity in emission; stronger pins decomposition to reflection.
    "em001": {"nerf.emissive_head": True, "loss.emission_sparsity": 0.001},
    "em1": {"nerf.emissive_head": True, "loss.emission_sparsity": 0.1},
    # Emission without the vc tie: does the architectural decomposition
    # alone replace the loss-side tie?
    "em_novc": {"nerf.emissive_head": True, "loss.view_consistency": 0.0},
    # Emission + point normals: if emission carries the HDR evidence, the
    # per-sample normal chain may no longer be what stabilizes HDR — and
    # pnorm is +45% train throughput (NOTES.md round-3 pnorm study).
    "em_pn": {"nerf.emissive_head": True, "nerf.point_normals": True},
    # LDR-cost diagnosis (first em round measured HDR +2.9 BEST-EVER
    # stability but LDR -3.3 dB): is the cost the fresh-head emission
    # floor (softplus(-3)=0.049 radiance glows through the tonemap on
    # dark pixels) or under-sparsity (emission absorbing texture)?
    "em_b6": {"nerf.emissive_head": True, "nerf.emission_bias": -6.0},
    # Reference-default secondary march density (S=10 vs the shipped 5):
    # the occlusion study (shadow scene) probes whether a finer env march
    # can resolve a thin occluder the S=5 spacing steps over.
    "e10": {"nerf.num_env_samples": 10},
    # Stochastic per-direction distillation (loss.env_distill +
    # nerf.env_distill_samples): tie the secondary read along ONE random
    # direction per point to a finer re-march of the same ray. The
    # occlusion-study fog attack — the first variant that supervises the
    # blurred scale PER DIRECTION (the 6 prior attacks all left the
    # per-direction read unconstrained or moved it to an under-sampled
    # scale). Weight ladder: the tie competes with the irradiance loss's
    # preference for fog.
    "ed003": {"nerf.env_distill_samples": 16, "loss.env_distill": 0.03},
    "ed01": {"nerf.env_distill_samples": 16, "loss.env_distill": 0.1},
    "ed03": {"nerf.env_distill_samples": 16, "loss.env_distill": 0.3},
    "ed1": {"nerf.env_distill_samples": 16, "loss.env_distill": 1.0},
    # Composition with the hdr preset (the distill shapes the blurred
    # luma the etc combine carries).
    "etc_chromic_ed03": {"nerf.env_tight_rgb": 0.01,
                         "nerf.env_tight_chroma": True,
                         "loss.chrom_illum_comp": True,
                         "nerf.env_distill_samples": 16,
                         "loss.env_distill": 0.3},
    # Re-pointed at the ladder's working weight (0.3 diverged on shadow;
    # 0.1 is contrast 1.92 at LDR parity — NOTES.md env_distill study).
    "etc_chromic_ed01": {"nerf.env_tight_rgb": 0.01,
                         "nerf.env_tight_chroma": True,
                         "loss.chrom_illum_comp": True,
                         "nerf.env_distill_samples": 16,
                         "loss.env_distill": 0.1},
    # Round-4 env_distill schedules (occlusion-affordability study,
    # VERDICT r3 #4): the flat w=0.1 tie buys shadow contrast 1.10 ->
    # 1.92 and removes the albedo shadow-baking at LDR parity, but costs
    # HDR endpoint (-1.6 vs -1.1) and normal ws-MAE (41 vs 23). The
    # hypothesis: the damage is EARLY gradient pressure on a still-
    # settling field; the recovery series (-3.5 -> -1.6 over the last
    # 12k) suggests the late-run tie is benign. Delay/ramp the weight.
    "ed01_s45": {"nerf.env_distill_samples": 16, "loss.env_distill": 0.1,
                 "loss.env_distill_start": 0.45},
    "ed01_s45r2": {"nerf.env_distill_samples": 16, "loss.env_distill": 0.1,
                   "loss.env_distill_start": 0.45,
                   "loss.env_distill_ramp": 0.2},
    "ed01_s25r25": {"nerf.env_distill_samples": 16,
                    "loss.env_distill": 0.1,
                    "loss.env_distill_start": 0.25,
                    "loss.env_distill_ramp": 0.25},
    # Higher late weight: 0.3 from step 0 DIVERGED (LDR 16.2); with the
    # field settled it may instead buy the contrast 1.92 -> >=3 the
    # round-3 ladder could not reach.
    "ed03_s45r2": {"nerf.env_distill_samples": 16, "loss.env_distill": 0.3,
                   "loss.env_distill_start": 0.45,
                   "loss.env_distill_ramp": 0.2},
    # Pairing (VERDICT r3 #4 option 3): distill the TIGHT-weight read —
    # env_rgb under etw IS the tight composite, so the tie and the
    # consumed read ride the same primary-supervised scale.
    "etw_ed01_s45r2": {"nerf.env_tight_rgb": 0.01,
                       "nerf.env_tight_weights": True,
                       "nerf.env_distill_samples": 16,
                       "loss.env_distill": 0.1,
                       "loss.env_distill_start": 0.45,
                       "loss.env_distill_ramp": 0.2},
    # INVERSE schedule (anneal-off): tie on from step 0 — co-adaptation
    # from scratch is what works (the delayed-onset gate measured a
    # mid-run introduction destabilizing a settled field) — then fall
    # linearly to zero over [55%, 70%] of the schedule so the HDR
    # machinery repairs the endpoint with the structure already built.
    "ed01_e55f15": {"nerf.env_distill_samples": 16,
                    "loss.env_distill": 0.1,
                    "loss.env_distill_end": 0.55,
                    "loss.env_distill_fall": 0.15},
    "etc_chromic_ed01_e55f15": {"nerf.env_tight_rgb": 0.01,
                                "nerf.env_tight_chroma": True,
                                "loss.chrom_illum_comp": True,
                                "nerf.env_distill_samples": 16,
                                "loss.env_distill": 0.1,
                                "loss.env_distill_end": 0.55,
                                "loss.env_distill_fall": 0.15},
    "etc_chromic_ed01_e7f15": {"nerf.env_tight_rgb": 0.01,
                               "nerf.env_tight_chroma": True,
                               "loss.chrom_illum_comp": True,
                               "nerf.env_distill_samples": 16,
                               "loss.env_distill": 0.1,
                               "loss.env_distill_end": 0.7,
                               "loss.env_distill_fall": 0.15},
    "ed01_e7f15": {"nerf.env_distill_samples": 16,
                   "loss.env_distill": 0.1,
                   "loss.env_distill_end": 0.7,
                   "loss.env_distill_fall": 0.15},
    # Scheduled COMPOSITION: the flat etc_chromic_ed01 measured the best
    # shadow contrast in the repo (probe 3.78 vs GT 4.91, albedo baking
    # gone at 1.01) but wrecked the HDR endpoint (-6.1, emitter read
    # 0.70 vs 8.2). Delay+ramp the tie so the preset's ordered spectrum
    # settles first, then the distill fixes per-direction structure.
    "etc_chromic_ed01_s45r2": {"nerf.env_tight_rgb": 0.01,
                               "nerf.env_tight_chroma": True,
                               "loss.chrom_illum_comp": True,
                               "nerf.env_distill_samples": 16,
                               "loss.env_distill": 0.1,
                               "loss.env_distill_start": 0.45,
                               "loss.env_distill_ramp": 0.2},
    # Hotter LR start (time-to-quality lever, queue-17 probes: 25 dB in
    # 2000 / 1000 steps vs 5000 at the shipped 2e-4). The 44k gates ask
    # whether the HDR dynamics (vc tie, saturation guard, irradiance
    # coupling) survive the hotter schedule at unchanged endpoint
    # quality — the precondition for a default change.
    "lr4": {"optimizer.lr_init": 4e-4},
    "lr1e3": {"optimizer.lr_init": 1e-3},
    "lr1e3f": {"optimizer.lr_init": 1e-3,
               "optimizer.lr_final": 5e-6},
    "lr1e3w": {"optimizer.lr_init": 1e-3,
               "optimizer.lr_delay_steps": 1000},
    "etc_chromic_lr1e3": {"nerf.env_tight_rgb": 0.01,
                          "nerf.env_tight_chroma": True,
                          "loss.chrom_illum_comp": True,
                          "optimizer.lr_init": 1e-3},
    "etc_chromic_lr4": {"nerf.env_tight_rgb": 0.01,
                        "nerf.env_tight_chroma": True,
                        "loss.chrom_illum_comp": True,
                        "optimizer.lr_init": 4e-4},
    # Occlusion fix (nerf.env_tight_weights): composite the secondary
    # march entirely at the tight scale — radiance AND transmittance from
    # the tight re-read at blurred-placed samples. The blurred composite
    # was measured to be a per-direction fog (shadow probe: contrast 1.10
    # vs GT 4.91); the tight-scale density is primary-supervised, so a
    # real occluder terminates the march. No CDF feedback (the
    # env_resample failure mode).
    "etw": {"nerf.env_tight_rgb": 0.01, "nerf.env_tight_weights": True},
    # + finer placement (the S=5 uniform march can step over a thin
    # occluder entirely; S=10 halves the spacing).
    "etw_e10": {"nerf.env_tight_rgb": 0.01,
                "nerf.env_tight_weights": True,
                "nerf.num_env_samples": 10},
    # + the compensated albedo prior (the chromic half of the best
    # single-source recipe; the chroma half is subsumed — the tight
    # composite carries tight chroma by construction).
    "etw_chromic": {"nerf.env_tight_rgb": 0.01,
                    "nerf.env_tight_weights": True,
                    "loss.chrom_illum_comp": True},
    # Float-LDR GT (no 8-bit quantization): probe whether the quasi-
    # saturated channel drift on the wall scene is quantization-limited.
    # MEASURED NO (44k wall): B 8.89 vs prod 7.77 (GT 5.0), HDR -0.82
    # vs +1.38 — the ACES slope near the knee, not the quantizer, kills
    # the restoring gradient (NOTES.md).
    "noq": {"loss.gt_quantize": False},
    "em_b6s1": {"nerf.emissive_head": True, "nerf.emission_bias": -6.0,
                "loss.emission_sparsity": 0.1},
    # More irradiance directions at the prod recipe: the wall scene's R
    # channel is under-pulled (7.64 vs GT 11.0) because a small grazing
    # emitter subtends few of the D=10 Fibonacci directions — round-1
    # measured D=40 recovering a small emitter to within 11%. ~2.4x env
    # cost; probes whether channel-structure recovery is direction-
    # coverage-limited.
    "d40": {"nerf.num_ray_samples": 40},
    "d20": {"nerf.num_ray_samples": 20},
    # Chromaticity-prior ablation: the prior ties albedo chroma to LDR
    # pixel chroma, but a surface lit by a COLORED emitter looks like the
    # illuminant in LDR — the prior pushes illuminant chroma into albedo,
    # potentially canceling exactly the per-channel source signal the
    # irradiance coupling transmits (the flat-channel mechanism suspect
    # on the wall scene). 0 = off; reference default 0.1.
    "chrom0": {"loss.chrom_loss": 0.0},
    "chrom03": {"loss.chrom_loss": 0.03},
    # Illuminant-compensated chromaticity (loss.chrom_illum_comp): tie
    # albedo chroma to GT / stop-grad(irradiance) instead of raw LDR —
    # keeps the prior's regularization without pushing illuminant chroma
    # into albedo on chromatic scenes (duo attribution matrix).
    "chromic": {"loss.chrom_illum_comp": True},
    # Combo: compensated chroma prior + the rgb-only cross-scale distill —
    # the two targeted fixes for the duo chroma failure (illuminant chroma
    # leaking into albedo; irradiance evidence riding the phantom blurred
    # field) together.
    "chromic_sd01": {"loss.chrom_illum_comp": True,
                     "loss.scale_distill": 0.1},
    # Compensated chroma prior + emissive decomposition on chromatic
    # scenes: chromic recovers partial channel order on duo_cool by
    # keeping illuminant chroma out of albedo; the emissive head gives
    # the source an explicit view-independent channel to carry it. Probe
    # whether the two compose (em at the LDR-near-parity b-6 recipe).
    "chromic_em": {"loss.chrom_illum_comp": True,
                   "nerf.emissive_head": True,
                   "nerf.emission_bias": -6.0},
    # Two-level secondary march (nerf.env_resample): the irradiance
    # evidence rides tight Gaussians at the primary-supervised IPE scale
    # instead of the blurred placement scale (the round-3 env-scale probe
    # showed the blurred-scale field is decoupled — free phantom radiance).
    "envrs": {"nerf.env_resample": True},
    "envrs3": {"nerf.env_resample": True, "nerf.num_env_fine_samples": 3},
    "envrs_chrom0": {"nerf.env_resample": True, "loss.chrom_loss": 0.0},
    # Cross-scale self-distillation (loss.scale_distill): anchor the
    # blurred-scale field the irradiance queries read to the fine field
    # (the other attack on the same env-scale decoupling; composable with
    # envrs, which changes WHICH scale carries the evidence instead).
    "sd01": {"loss.scale_distill": 0.1},
    "sd03": {"loss.scale_distill": 0.3},
    "sd001": {"loss.scale_distill": 0.01},
    # Distance tie included (measured collapsing at 0.1 — kept only as
    # the reproduction recipe for that negative result).
    "sd01_dist": {"loss.scale_distill": 0.1,
                  "loss.scale_distill_dist": 0.1},
    "sd01_envrs": {"loss.scale_distill": 0.1, "nerf.env_resample": True},
    # Runaway guard: one-sided pull toward 2x the knee — identically zero
    # until a channel exceeds it, so healthy runs are bitwise unaffected;
    # bounds the wall-scene seed-1 divergence (emitter inflating to
    # 1.6-2.5x knee) without capping beyond-knee recovery.
    "guard": {"loss.saturation_loss": 0.01, "loss.saturation_margin": 2.0},
    "guard15": {"loss.saturation_loss": 0.01,
                "loss.saturation_margin": 1.5},
    # Chroma-flattening probe: does the per-channel vc tie itself suppress
    # channel-structure recovery (the env view, where irradiance evidence
    # orders channels, is pulled toward the knee-flattened primary view)?
    "vc0": {"loss.view_consistency": 0.0},
    # Chroma-preserving vc: tie log-LUMA only — keeps the intensity
    # transmission the box scene needs while freeing chroma to follow
    # the irradiance evidence (the vc0 probe showed the per-channel tie
    # suppresses the B channel's correct downward separation).
    "vcl": {"loss.vc_luma": True},
    # Saturation-masked per-channel tie ON TOP of the luma tie: channels
    # whose GT is unsaturated carry trustworthy primary-view chroma (the
    # vol loss pins them), so tying exactly those across views transmits
    # real chroma while saturated channels stay luma-only. On the duo
    # scenes each opposite-chroma source keeps one channel below the
    # knee — the anchor this mask exposes.
    "vcsm": {"loss.vc_sat_mask": True},
    "vcsm_chromic": {"loss.vc_sat_mask": True,
                     "loss.chrom_illum_comp": True},
    # Tight-scale radiance re-read on the secondary march (blur-dilution
    # fix, BaseNeRF.env_tight_rgb): the attribution probe measured 83% of
    # the blurred march's weight reaching the true source depth but
    # reading ~0.3 radiance vs GT 6.5-9.5 — the env-scale IPE averages the
    # small emitter with its surrounding wall, smearing per-channel
    # evidence. etr reads color at the fine primary scale (cov x0.01);
    # etr1 at an intermediate scale (x0.1).
    "etr": {"nerf.env_tight_rgb": 0.01},
    "etr1": {"nerf.env_tight_rgb": 0.1},
    # Composition with the saturation-masked chroma tie: tight color
    # evidence + cross-view transmission of the unsaturated anchors.
    "etr_vcsm": {"nerf.env_tight_rgb": 0.01, "loss.vc_sat_mask": True},
    # Hybrid combine (BaseNeRF.env_tight_chroma): the etr scale ladder
    # measured a clean decomposition — the blurred read carries the right
    # INTENSITY (prod ratio ~0.9-1.2) with a flattened/flipped spectrum,
    # the tight read carries the right CHANNEL ORDER (the only variant
    # that cool-orders duo_cool) but under-reads small emitters (ratio
    # 0.57-0.73) and costs 3-5 dB LDR when it carries the full radiance.
    # etc keeps the blurred luma and takes only the chroma from the tight
    # read; etc1 the same at the intermediate scale.
    "etc": {"nerf.env_tight_rgb": 0.01, "nerf.env_tight_chroma": True},
    "etc1": {"nerf.env_tight_rgb": 0.1, "nerf.env_tight_chroma": True},
    # Composition: hybrid chroma read + illuminant-compensated albedo
    # prior — the two individually-positive chromatic-scene recipes.
    "etc_chromic": {"nerf.env_tight_rgb": 0.01,
                    "nerf.env_tight_chroma": True,
                    "loss.chrom_illum_comp": True},
    # Dominant-hit variant: 1/S the tight re-read rows (the cheap etc).
    "etct": {"nerf.env_tight_rgb": 0.01, "nerf.env_tight_chroma": True,
             "nerf.env_tight_top1": True},
    # Top-K interpolation between etct (cheap, under-reads the grazing
    # wall emitter: ratio 0.737 vs etc 1.003) and the full-S etc: K
    # weighted dominant hits recover the weight mass a single argmax
    # misses when the blurred march straddles the emitter boundary.
    "etck2": {"nerf.env_tight_rgb": 0.01, "nerf.env_tight_chroma": True,
              "nerf.env_tight_topk": 2},
    "etck4": {"nerf.env_tight_rgb": 0.01, "nerf.env_tight_chroma": True,
              "nerf.env_tight_topk": 4},
    # Top-K composition with the compensated prior (the best single-
    # source recipe) at reduced re-read cost.
    "etck4_chromic": {"nerf.env_tight_rgb": 0.01,
                      "nerf.env_tight_chroma": True,
                      "nerf.env_tight_topk": 4,
                      "loss.chrom_illum_comp": True},
    # K=2 composition: the wall topk gates measured K=2 at full-S-level
    # recovery (+3.51 vs etc +2.51, ordered, ratio 0.872) where top1
    # under-read (0.737) — two hits capture the straddled weight mass.
    "etck2_chromic": {"nerf.env_tight_rgb": 0.01,
                      "nerf.env_tight_chroma": True,
                      "nerf.env_tight_topk": 2,
                      "loss.chrom_illum_comp": True},
    # Two-source (duo) attack: the albedo-chroma prior pushes the local
    # illuminant's color into albedo at jointly-lit surfaces (duo_cool
    # chrom0 was +2.46 vs prod -0.55); combine the prior ablation with
    # the hybrid chroma read that fixes single-source channel order.
    "etc_chrom0": {"nerf.env_tight_rgb": 0.01, "nerf.env_tight_chroma": True,
                   "loss.chrom_loss": 0.0},
    # Illuminant-chroma GATE (loss.chrom_gate): per-pixel release of the
    # albedo-chroma prior where the stop-grad irradiance integral is
    # strongly colored — the adaptive middle between the plain prior
    # (right under neutral illumination, box) and the full ablation
    # (required under colored/mixed illumination, duo/duo_cool). If the
    # gated prior matches chrom0 on duo and prod on box, the scene-class
    # recipe split collapses into one default candidate.
    "chromg": {"loss.chrom_gate": True},
    "etc_chromg": {"nerf.env_tight_rgb": 0.01,
                   "nerf.env_tight_chroma": True,
                   "loss.chrom_gate": True},
    # Chroma-only cross-view tie (loss.vc_chroma): the attribution probe
    # isolated the duo failure to the view-dependent head collapsing to
    # ONE global illuminant chroma along secondary directions (NOTES.md
    # duo cross-source assignment) — the tie forces each point's
    # spectrum view-independent. Composed over the two duo recipes.
    "etc_chromic_vcc": {"nerf.env_tight_rgb": 0.01,
                        "nerf.env_tight_chroma": True,
                        "loss.chrom_illum_comp": True,
                        "loss.vc_chroma": 0.1},
    "etc_chrom0_vcc": {"nerf.env_tight_rgb": 0.01,
                       "nerf.env_tight_chroma": True,
                       "loss.chrom_loss": 0.0,
                       "loss.vc_chroma": 0.1},
    # One-way (stop-grad-primary) chroma tie: the symmetric vcc measured
    # NEGATIVE on duo (-3.18 — the unsupervised alt side drags the
    # primary INTO the collapse, flipping the cool source's spectrum);
    # sg lets the secondary read inherit the primary per-source spectrum
    # without back-pressure.
    "etc_chromic_vccsg": {"nerf.env_tight_rgb": 0.01,
                          "nerf.env_tight_chroma": True,
                          "loss.chrom_illum_comp": True,
                          "loss.vc_chroma": 0.1,
                          "loss.vc_chroma_sg": True},
    "etc_chrom0_vccsg": {"nerf.env_tight_rgb": 0.01,
                         "nerf.env_tight_chroma": True,
                         "loss.chrom_loss": 0.0,
                         "loss.vc_chroma": 0.1,
                         "loss.vc_chroma_sg": True},
    # Chroma HEAD (nerf.chroma_head, duo attack #4 — structural): both
    # loss-side chroma ties measured NEGATIVE (the symmetric tie drags
    # the supervised primary into the collapse; the one-way sg tie
    # regresses duo_cool +4.43 -> +1.01 with a backwards spectrum and
    # merely flips which duo source resolves). The head factorizes
    # rgb = 3*softplus(mean(raw_rgb)) * softmax(chroma(trunk)) so a
    # point's spectrum is ONE view-independent simplex — the secondary
    # reads consume exactly the primary-supervised spectrum by
    # construction, no tie loss needed.
    "ch": {"nerf.chroma_head": True},
    "etc_ch": {"nerf.env_tight_rgb": 0.01, "nerf.env_tight_chroma": True,
               "nerf.chroma_head": True},
    "etc_chromic_ch": {"nerf.env_tight_rgb": 0.01,
                       "nerf.env_tight_chroma": True,
                       "loss.chrom_illum_comp": True,
                       "nerf.chroma_head": True},
    "etc_chrom0_ch": {"nerf.env_tight_rgb": 0.01,
                      "nerf.env_tight_chroma": True,
                      "loss.chrom_loss": 0.0,
                      "nerf.chroma_head": True},
    # Round-5 spatially-varying illuminant field (duo attack #8 — the
    # structure the round-4 duo_swap closure names as missing): a tiny
    # MLP on the stop-grad surface point emits per-channel low-order SH
    # coefficients; evaluated at the D env directions + softmaxed it
    # re-tints the secondary read's CHROMA under a luma-preserving
    # combine. Supervised only through the irradiance integral, so the
    # consensus of RECEIVING surfaces — not the collapsed radiance
    # chroma — sets each source's spectrum.
    "ilf": {"nerf.illum_field": True},
    # + the best duo recipe (etc + prior ablation).
    "etc_chrom0_ilf": {"nerf.env_tight_rgb": 0.01,
                       "nerf.env_tight_chroma": True,
                       "loss.chrom_loss": 0.0,
                       "nerf.illum_field": True},
    # + the hdr preset (single-source regression gate for the field).
    "etc_chromic_ilf": {"nerf.env_tight_rgb": 0.01,
                        "nerf.env_tight_chroma": True,
                        "loss.chrom_illum_comp": True,
                        "nerf.illum_field": True},
    # SH-degree ablation (deg 1 = 4 bases; deg 3 = 16).
    "ilf_d1": {"nerf.illum_field": True, "nerf.illum_sh_deg": 1},
    "ilf_d3": {"nerf.illum_field": True, "nerf.illum_sh_deg": 3},
    "etc_chrom0_ilf_d1": {"nerf.env_tight_rgb": 0.01,
                          "nerf.env_tight_chroma": True,
                          "loss.chrom_loss": 0.0,
                          "nerf.illum_field": True,
                          "nerf.illum_sh_deg": 1},
    # Round-5 shadow normals study (VERDICT r4 #3): the preset's tie
    # costs normal ws-MAE 33.8 vs prod 22.9; boost the orientation loss
    # while the tie is on, riding the same trapezoid off.
    "shadow_ob3": {"nerf.env_tight_rgb": 0.01,
                   "nerf.env_tight_chroma": True,
                   "loss.chrom_illum_comp": True,
                   "nerf.env_distill_samples": 16,
                   "loss.env_distill": 0.1,
                   "loss.env_distill_end": 0.7,
                   "loss.env_distill_fall": 0.15,
                   "loss.ort_tie_boost": 3.0},
    "shadow_ob10": {"nerf.env_tight_rgb": 0.01,
                    "nerf.env_tight_chroma": True,
                    "loss.chrom_illum_comp": True,
                    "nerf.env_distill_samples": 16,
                    "loss.env_distill": 0.1,
                    "loss.env_distill_end": 0.7,
                    "loss.env_distill_fall": 0.15,
                    "loss.ort_tie_boost": 10.0},
    # Round-5 duo attack #8b (loss.illum_distill): the field learns each
    # source's correct spectrum from receiver consensus (probe-measured
    # on the ilf checkpoint) but nothing moves the emitters' own
    # radiance — close the loop by pulling the pre-tint secondary
    # chroma toward the stop-grad field chroma.
    "etc_chrom0_ilfd003": {"nerf.env_tight_rgb": 0.01,
                           "nerf.env_tight_chroma": True,
                           "loss.chrom_loss": 0.0,
                           "nerf.illum_field": True,
                           "loss.illum_distill": 0.03},
    "etc_chrom0_ilfd01": {"nerf.env_tight_rgb": 0.01,
                          "nerf.env_tight_chroma": True,
                          "loss.chrom_loss": 0.0,
                          "nerf.illum_field": True,
                          "loss.illum_distill": 0.1},
    "etc_chrom0_ilfd03": {"nerf.env_tight_rgb": 0.01,
                          "nerf.env_tight_chroma": True,
                          "loss.chrom_loss": 0.0,
                          "nerf.illum_field": True,
                          "loss.illum_distill": 0.3},
    # Phase-2 recipe (learn-then-teach): the always-on distill measurably
    # destabilizes the field's own inference (duo ilfd01 probe: the warm
    # source's field chroma drifts G-peaked once the radiance starts
    # matching it — the identification residual becomes self-fulfilling).
    # Let the field learn to 50% (its distill-free equilibrium is
    # near-exact on duo), FREEZE it (train.illum_freeze), then ramp the
    # pull in.
    "etc_chrom0_ilfds": {"nerf.env_tight_rgb": 0.01,
                         "nerf.env_tight_chroma": True,
                         "loss.chrom_loss": 0.0,
                         "nerf.illum_field": True,
                         "loss.illum_distill": 0.1,
                         "loss.illum_distill_start": 0.5,
                         "loss.illum_distill_ramp": 0.05,
                         "train.illum_freeze": 0.5},
    "etc_chrom0_ilfds3": {"nerf.env_tight_rgb": 0.01,
                          "nerf.env_tight_chroma": True,
                          "loss.chrom_loss": 0.0,
                          "nerf.illum_field": True,
                          "loss.illum_distill": 0.3,
                          "loss.illum_distill_start": 0.5,
                          "loss.illum_distill_ramp": 0.05,
                          "train.illum_freeze": 0.5},
    # Earlier, gentler phase boundary: ilfds (freeze/start at 50%, ramp
    # 5%) taught the warm source the correct ORDER — the first ilf-family
    # variant to do so — but paid the mid-run-introduction cost (LDR
    # 29.5 -> 27.9). Shorter clean phase + longer ramp gives 75% of the
    # schedule for co-adaptation.
    "etc_chrom0_ilfds25": {"nerf.env_tight_rgb": 0.01,
                           "nerf.env_tight_chroma": True,
                           "loss.chrom_loss": 0.0,
                           "nerf.illum_field": True,
                           "loss.illum_distill": 0.1,
                           "loss.illum_distill_start": 0.25,
                           "loss.illum_distill_ramp": 0.2,
                           "train.illum_freeze": 0.25},
    # Round-5 occlusion attack #13 (loss.env_distill_acc): the radiance
    # tie calibrates what the blurred read returns, but the post-release
    # wall fog lives in the blurred march's TRANSMITTANCE (0.50 vs GT
    # 0.17 at contrast 3.15). Tie the same direction's acc to the fine
    # re-march's, riding the same anneal-off trapezoid, on top of the
    # shipped shadow preset.
    "shadow_eda": {"nerf.env_tight_rgb": 0.01,
                   "nerf.env_tight_chroma": True,
                   "loss.chrom_illum_comp": True,
                   "nerf.env_distill_samples": 16,
                   "loss.env_distill": 0.1,
                   "loss.env_distill_acc": 0.1,
                   "loss.env_distill_end": 0.7,
                   "loss.env_distill_fall": 0.15},
    "shadow_eda03": {"nerf.env_tight_rgb": 0.01,
                     "nerf.env_tight_chroma": True,
                     "loss.chrom_illum_comp": True,
                     "nerf.env_distill_samples": 16,
                     "loss.env_distill": 0.1,
                     "loss.env_distill_acc": 0.3,
                     "loss.env_distill_end": 0.7,
                     "loss.env_distill_fall": 0.15},
    # Attack #14 (loss.env_distill_dist): the acc tie measured vacuous
    # (blurred total opacity already ~1 every direction; shadow_eda:
    # wall fog 0.60 vs the preset's 0.50, calibration broke). The fog
    # is WHERE the weight lands — tie the blurred expected distance to
    # the fine re-march's (log space), on the shipped shadow preset.
    "shadow_edd": {"nerf.env_tight_rgb": 0.01,
                   "nerf.env_tight_chroma": True,
                   "loss.chrom_illum_comp": True,
                   "nerf.env_distill_samples": 16,
                   "loss.env_distill": 0.1,
                   "loss.env_distill_dist": 0.1,
                   "loss.env_distill_end": 0.7,
                   "loss.env_distill_fall": 0.15,
                   "loss.ort_tie_boost": 3.0},
}


def per_source_stats(pred: np.ndarray, gt: np.ndarray,
                     spec) -> list:
    """Per-emitter pred/gt channel means for multi-source scenes.

    Emitter pixels in the synthetic GT carry the emitter radiance EXACTLY
    (data/synthetic.py render_pano sets them directly), so an exact-match
    mask attributes each pixel to its source without geometry plumbing.
    Only bright sources (max channel > EMITTER_THRESHOLD) are reported.
    """
    rows = []
    for i, e in enumerate(spec.emitters):
        rad = np.asarray(e.radiance, dtype=np.float32)
        if rad.max() <= EMITTER_THRESHOLD:
            continue
        mask = np.all(np.abs(gt - rad) < 0.05, axis=-1)
        if not mask.any():
            continue
        rows.append({"source": i, "face": e.face,
                     "gt_rgb": [round(float(x), 3) for x in rad],
                     "pred_rgb": [round(float(x), 3)
                                  for x in pred[mask].mean(0)],
                     "pixels": int(mask.sum())})
    return rows


def run_variant(name: str, scene: str, out_root: str,
                steps: int, val_epochs: int, env_dirs: int,
                seed: int = 0, spec=None) -> dict:
    out_dir = os.path.join(out_root,
                           name if seed == 0 else f"{name}-seed{seed}")
    cmd = [
        sys.executable, os.path.join(ROOT, "train.py"),
        "--data_path", scene, "--out_dir", out_dir,
        "--config", os.path.join(ROOT, "configs", "panonerf.yaml"),
        "train.factor", "1", "val.factor", "1",
        "train.sample_num", "'n0_1_2'",
        "optimizer.max_steps", str(steps),
        "val.check_every_n_epoch", str(val_epochs),
        "val.chunk_size", "4096",
        "nerf.num_ray_samples", str(env_dirs),
        "log_every_n_step", "2000",
    ]
    for k, v in VARIANTS[name].items():
        cmd += [k, str(v)]
    cmd += ["seed", str(seed)]
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=ROOT)
    wall = time.time() - t0
    exp = os.path.join(out_dir, "panonerf_0_1_2")

    series = []
    psnrs = {}
    with open(os.path.join(exp, "metrics.jsonl")) as fp:
        for line in fp:
            rec = json.loads(line)
            if "psnr_hdr_vol" in rec:
                psnrs[int(rec["step"])] = rec
    for vdir in sorted(glob.glob(os.path.join(exp, "val_*"))):
        step = int(os.path.basename(vdir).split("_")[1])
        pm, gm = [], []
        src_acc = {}
        for pred_f in sorted(glob.glob(os.path.join(vdir, "pred_hdr",
                                                    "*.exr"))):
            gt_f = os.path.join(vdir, "gt_hdr", os.path.basename(pred_f))
            if not os.path.exists(gt_f):
                continue
            pred, gt = read_exr(pred_f), read_exr(gt_f)
            mask = gt.max(-1) > EMITTER_THRESHOLD
            if mask.any():
                pm.append(pred[mask].mean(0))      # per-channel [3]
                gm.append(gt[mask].mean(0))
            if spec is not None and len(spec.emitters) >= 1:
                for r in per_source_stats(pred, gt, spec):
                    src_acc.setdefault(r["source"], []).append(r)
        row = {"step": step}
        if src_acc:
            row["per_source"] = [
                {"source": s, "face": rs[0]["face"],
                 "gt_rgb": rs[0]["gt_rgb"],
                 "pred_rgb": [round(float(np.mean([r["pred_rgb"][c]
                                                   for r in rs])), 3)
                              for c in range(3)]}
                for s, rs in sorted(src_acc.items())]
        if pm:
            pmc = np.mean(pm, axis=0)
            gmc = np.mean(gm, axis=0)
            row["emitter_pred"] = round(float(pmc.mean()), 3)
            row["emitter_gt"] = round(float(gmc.mean()), 3)
            row["emitter_ratio"] = round(float(pmc.mean() / gmc.mean()), 3)
            # Per-channel values: the beyond-knee criterion is channel
            # ORDER recovery above the saturation knee (~7.24), which the
            # mean alone cannot show.
            row["emitter_pred_rgb"] = [round(float(x), 3) for x in pmc]
            row["emitter_gt_rgb"] = [round(float(x), 3) for x in gmc]
        if step in psnrs:
            for k in ("psnr_hdr_vol", "psnr_ldr_vol", "ssim_ldr_vol"):
                if k in psnrs[step]:
                    row[k] = round(psnrs[step][k], 3)
        series.append(row)
    return {"variant": name, "overrides": VARIANTS[name], "steps": steps,
            "env_dirs": env_dirs, "wall_s": round(wall, 1),
            "series": series}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=44000)
    ap.add_argument("--env_dirs", type=int, default=10)
    ap.add_argument("--val_epochs", type=int, default=4,
                    help="validate every N*1000 steps")
    ap.add_argument("--variants", nargs="+", default=["strat10", "fixed"],
                    choices=sorted(VARIANTS))
    ap.add_argument("--out", default="/tmp/hdr_study")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--scene_variant", default="default",
                    help="SCENE_VARIANTS entry (data/synthetic.py) — e.g. "
                         "'wall' for the recipe-generality scene")
    args = ap.parse_args()

    scene = os.path.join(args.out, "scene")
    from pano_nerf_tpu.data.synthetic import SCENE_VARIANTS, generate_scene
    if not os.path.exists(os.path.join(scene, "transforms_all.json")):
        generate_scene(scene, n_views=6, height=args.height,
                       width=args.width, variant=args.scene_variant)
    spec = SCENE_VARIANTS.get(args.scene_variant)

    results = []
    for name in args.variants:
        res = run_variant(name, scene=scene, out_root=args.out,
                          steps=args.steps, val_epochs=args.val_epochs,
                          env_dirs=args.env_dirs, seed=args.seed,
                          spec=spec)
        results.append(res)
        print(json.dumps(res), flush=True)

    summary = {}
    for res in results:
        tail = [r for r in res["series"] if "emitter_ratio" in r][-3:]
        hdr = [r.get("psnr_hdr_vol") for r in res["series"]
               if r.get("psnr_hdr_vol") is not None]
        summary[res["variant"] + (f"-seed{args.seed}" if args.seed else "")] = {
            "final_emitter_ratio": tail[-1]["emitter_ratio"] if tail else None,
            "final_psnr_hdr": hdr[-1] if hdr else None,
            "hdr_psnr_last3": hdr[-3:],
            "wall_s": res["wall_s"],
        }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
