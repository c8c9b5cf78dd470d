"""Training losses for the mip-NeRF / Pano-NeRF systems.

Counterparts of the loss math inlined in the reference systems
(/root/reference/systems/panonerf_system.py:15-75,
mipnerf_system.py:22-53). All losses operate on tone-mapped LDR values;
ground truth is additionally quantized to 8 bits (reference :17).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from pano_nerf_tpu.ops.shading import compute_illumination, hdr_to_ldr

Array = jnp.ndarray

# Beyond-reference loss keys and their production defaults (values chosen by
# the round-2 HDR study, NOTES.md). Single source of truth: the systems fill
# these into hparams at construction (prepare_hparams); the in-code fallbacks
# below are the STRICT-PARITY values (0/False), so a key-less hparams dict
# passed directly to the loss functions reproduces the reference loss
# exactly. configs/panonerf.yaml documents the same defaults for users.
EXTENSION_DEFAULTS = {
    "loss.distortion_loss": 0.01,
    # Round 2's knee prior, repurposed in round 3 as a RUNAWAY GUARD via
    # saturation_margin 2.0: zero value/gradient until a saturated-GT
    # channel exceeds 2x the knee, so beyond-knee recovery (healthy runs
    # peak ~1.15x) is untouched while the measured wall-scene seed-1
    # divergence (emitter inflating to 1.6-2.5x) is bounded (HDR -6.5 ->
    # -0.75, ratio 1.16; box/wall healthy runs re-gated within noise —
    # NOTES.md guard study). margin 1.0 restores the round-2 knee cap
    # (strongest stabilizer, at the cost of capping recovery AT the knee).
    "loss.saturation_loss": 0.01,
    "loss.saturation_margin": 2.0,
    "loss.unclipped_pred_tonemap": True,
    # Round-3 HDR fix: view-consistency of predicted fine radiance across
    # view directions (log space) ties the view-dependent head so the
    # irradiance coupling lifts saturated sources ABOVE the tonemap knee:
    # 44k measured HDR ws-PSNR -1.8 -> +1.5, emitter ratio 0.89 with
    # per-channel radiance above the knee (NOTES.md round-3 HDR study).
    "loss.view_consistency": 0.1,
    # Tie LUMA only (chroma-preserving): the per-channel tie drags the
    # env view's spectrum toward the knee-flattened primary view —
    # suppressing channel-structure recovery AND amplifying the
    # divergence loop on hard scenes (measured: the diverging wall seed
    # becomes fully healthy, +1.49 / ratio 1.00; box +1.06 -> +1.49;
    # wall seed 0 +1.63 -> +2.42 — NOTES.md vc_luma study). False =
    # the per-channel round-3 tie.
    "loss.vc_luma": True,
    # Identifiability prior for the emissive-head decomposition
    # (BaseNeRF.emissive_head): dormant unless the head is enabled
    # (the loss term requires LevelOutput.emission).
    "loss.emission_sparsity": 0.01,
}


def prepare_hparams(hparams: dict) -> dict:
    """Return a copy of `hparams` with the beyond-reference loss defaults
    filled in (missing keys only — explicit values always win)."""
    out = dict(hparams)
    for key, val in EXTENSION_DEFAULTS.items():
        out.setdefault(key, val)
    return out


def masked_mse(pred: Array, target: Array, mask: Array) -> Array:
    """sum(mask * (pred-target)^2) / sum(mask)."""
    return jnp.sum(mask * (pred - target) ** 2) / jnp.sum(mask)


def _l2_normalize(x: Array, eps: float = 1e-12) -> Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def chromaticity_loss(ldr_gt: Array, albedo: Array,
                      weights: Optional[Array] = None) -> Array:
    """MSE between unit-normalized LDR color and unit-normalized albedo
    (reference panonerf_system.py:58-63). Optional per-pixel `weights`
    [B, 1] (beyond reference — the illuminant-chroma gate); None keeps the
    reference's plain mean."""
    err = (_l2_normalize(ldr_gt) - _l2_normalize(albedo)) ** 2
    if weights is None:
        return jnp.mean(err)
    # ABSOLUTE downweighting (mean over all pixels, not a weighted mean):
    # where the gate says the prior's premise fails, the term must lose
    # magnitude, not redistribute it — a uniformly-colored scene
    # (duo_cool) should approach the measured-healthy chrom_loss=0
    # behavior, which a self-normalizing weighted mean cannot do.
    return jnp.mean(weights * err)


def illuminant_chroma_gate(shading: Array, sigma: float) -> Array:
    """Per-pixel confidence [B, 1] that the local illuminant is NEUTRAL.

    gate = exp(-(s / sigma)^2) with s = || normalize(shading) - white ||,
    the chroma distance of the (stop-gradient) irradiance integral from
    the neutral direction. Where the illuminant is near-white the LDR
    image chroma IS the albedo chroma and the prior is trustworthy
    (gate ~ 1, box scene); where it is strongly colored the LDR chroma is
    the illuminant's and the prior would push source color into albedo —
    the measured duo_cool failure (gate -> 0 releases it). Zero shading
    (dark pixels, no chroma evidence either way) normalizes to the zero
    vector, s = 1, gate ~ 0. Stop-gradient is the caller's job."""
    white = jnp.full((3,), 1.0 / jnp.sqrt(3.0), dtype=shading.dtype)
    s = jnp.linalg.norm(_l2_normalize(shading) - white, axis=-1,
                        keepdims=True)
    return jnp.exp(-(s / sigma) ** 2)


# Radiance that ACES+gamma tonemaps to exactly 1.0: the root of
# x(2.51x+0.03) = x(2.43x+0.59) + 0.14 (ops/shading.py constants). A
# saturated 8-bit GT pixel says only "radiance >= knee".
SATURATION_KNEE = (0.56 + (0.3584) ** 0.5) / 0.16  # ~7.2417


def saturation_loss(pred_hdr: Array, ldr_gt: Array, mask: Array,
                    margin: float = 1.0) -> Array:
    """One-sided pull of saturated-GT channels toward `margin` x the knee.

    A clipped tonemap gives saturated pixels zero gradient, so their HDR
    radiance is unconstrained from above and random-walks upward (the
    emitter-divergence mechanism measured in NOTES.md; the reference
    shares it). This term restores the missing constraint as a MAP prior:
    among all radiances consistent with the observed saturated LDR, prefer
    the smallest — the irradiance (surface) loss, which couples true
    source intensity, can still pull above the knee because the penalty is
    L1 (constant bounded gradient), not quadratic.

    `margin > 1` turns the prior into a pure RUNAWAY GUARD: the term (and
    its gradient) is identically zero until a channel exceeds margin x
    knee, so any run that stays below the threshold is bitwise unaffected
    — it only engages in the measured divergence regime (emitter
    inflating past ~1.6x the knee, NOTES.md wall-scene study) while
    leaving beyond-knee recovery (healthy runs peak ~1.15x) untouched.
    No reference counterpart; deviation documented in PARITY.md.
    """
    sat = (ldr_gt >= 1.0).astype(pred_hdr.dtype) * mask
    excess = jax.nn.relu(pred_hdr - margin * SATURATION_KNEE)
    return jnp.sum(sat * excess) / jnp.maximum(jnp.sum(sat), 1.0)


def pano_losses(outputs, rgbs_gt: Array, mask: Array, hparams: Dict,
                enable_surf: bool, step: Optional[Array] = None
                ) -> Dict[str, Optional[Array]]:
    """Full Pano-NeRF training loss.

    Args:
      outputs: [coarse LevelOutput, fine LevelOutput] from PanoMipNeRF.
      rgbs_gt: [B, 3] HDR ground truth; mask: [B, 1] lossmult.
      step: optional traced scalar (TrainState.step) — enables the
        step-scheduled loss weights (currently loss.env_distill_start /
        _ramp); None keeps every weight constant, which is exact parity
        for all shipped defaults (no scheduled weight is on by default).
    Returns dict with 'loss' plus each component for logging.
    """
    coarse, fine = outputs[0], outputs[-1]
    # GT quantization (reference: 8-bit, panonerf_system.py:17) is a knob
    # for float-LDR captures / ablation. NOTE the 44k wall-scene probe
    # measured quantize=False NOT fixing quasi-saturated channel drift:
    # the ACES slope near the knee (~2e-3/unit radiance at radiance 5) —
    # not the quantizer — is what erases the restoring gradient
    # (NOTES.md round-3 generality study, noq variant).
    ldr_gt = hdr_to_ldr(rgbs_gt,
                        quantize=bool(hparams.get("loss.gt_quantize", True)))

    # Predictions are tonemapped WITHOUT the clip (the reference clamps,
    # surface_rendering.py:330-331): the clamp zeroes the gradient for any
    # prediction past the ACES knee, so radiance there is unbounded above
    # even when the GT channel is UNSATURATED and says otherwise — one of
    # the two measured HDR-divergence mechanisms (NOTES.md HDR study).
    # The unclipped curve is monotone (asymptote 2.51/2.43), so values and
    # ordering below the knee are identical and the saturated region keeps
    # a small, correctly-signed pull toward the GT level.
    clamp = not bool(hparams.get("loss.unclipped_pred_tonemap", False))
    vol_coarse = masked_mse(hdr_to_ldr(coarse.rgb, clamp=clamp), ldr_gt,
                            mask)
    vol_fine = masked_mse(hdr_to_ldr(fine.rgb, clamp=clamp), ldr_gt, mask)
    loss = hparams["loss.coarse_loss_mult"] * vol_coarse + vol_fine

    parts = dict(vol_coarse=vol_coarse, vol_fine=vol_fine, vol_surface=None,
                 chrom=None, ort=None)
    if enable_surf and fine.surf_rgb is not None:
        vol_surface = masked_mse(hdr_to_ldr(fine.surf_rgb, clamp=clamp),
                                 ldr_gt, mask)
        loss = loss + hparams["loss.surface_loss"] * vol_surface
        parts["vol_surface"] = vol_surface
        if hparams["loss.chrom_loss"] > 0:
            # Illuminant-chroma gate (beyond reference, loss.chrom_gate):
            # weight the prior per pixel by how NEUTRAL the local
            # irradiance is. The 44k scene matrix measured the plain prior
            # helpful under near-neutral illumination (box) and harmful
            # under colored illumination (duo_cool -0.55 vs +2.46 with it
            # off; on the two-source duo BOTH targets — plain and
            # compensated — flatten the spectra, and only the full
            # ablation orders both sources). The gate is the adaptive
            # middle: per-pixel, the prior stays where its premise
            # (illuminant ~ white) holds and releases where it breaks.
            gate = None
            if (bool(hparams.get("loss.chrom_gate", False))
                    and fine.shading is not None):
                gate = illuminant_chroma_gate(
                    jax.lax.stop_gradient(fine.shading),
                    sigma=float(hparams.get("loss.chrom_gate_sigma", 0.2)))
            if (bool(hparams.get("loss.chrom_illum_comp", False))
                    and fine.shading is not None):
                # Illuminant-compensated chromaticity (beyond reference):
                # the plain prior ties albedo chroma to the LDR image
                # chroma, which under a strongly COLORED illuminant is the
                # illuminant's chroma, not the surface's — measured to
                # inflate source intensity on the chromatic duo_cool scene
                # (HDR -0.55 vs +2.46 with the prior off; NOTES.md duo
                # attribution matrix). Physically, pixel radiance =
                # albedo/pi * irradiance for the Lambertian term, so the
                # albedo chroma target is GT radiance divided per-channel
                # by the (stop-gradient) irradiance integral the surface
                # path already computes (LevelOutput.shading). Identical
                # to the plain prior under neutral illumination; under
                # chromatic illumination the illuminant chroma no longer
                # leaks into albedo. Falls back to the plain prior when
                # the BRDF provides no separable irradiance (microfacet).
                #
                # The divisor floor must be RELATIVE to the brightest
                # shading channel, not absolute: chromaticity_loss
                # unit-normalizes its target, so a channel whose estimated
                # irradiance sits near an absolute floor turns GT noise
                # into a nearly-pure-that-channel chroma target — measured
                # runaway feedback on duo_cool seed 1 (the DARK R channel
                # inflates 6.5 -> 18.3, HDR -9.2). The relative floor caps
                # per-channel amplification at 1/rel of the bright
                # channel's gain.
                rel = float(hparams.get("loss.chrom_illum_floor", 0.1))
                shading = jax.lax.stop_gradient(fine.shading)
                floor = jnp.maximum(
                    rel * jnp.max(shading, axis=-1, keepdims=True), 1e-3)
                illum = jnp.maximum(shading, floor)
                chrom = chromaticity_loss(rgbs_gt / illum, fine.albedo,
                                          weights=gate)
            else:
                chrom = chromaticity_loss(ldr_gt, fine.albedo,
                                          weights=gate)
            loss = loss + hparams["loss.chrom_loss"] * chrom
            parts["chrom"] = chrom
    # env_distill schedule factor, computed up front because the ort
    # boost below rides the same trapezoid (the full schedule rationale
    # lives at the distill term further down).
    w_ed = float(hparams.get("loss.env_distill", 0.0))
    w_eda = float(hparams.get("loss.env_distill_acc", 0.0))
    w_edd = float(hparams.get("loss.env_distill_dist", 0.0))
    ed_sched = None   # traced [0,1] trapezoid; None = no schedule set
    if w_ed > 0 or w_eda > 0 or w_edd > 0:
        ed_start = float(hparams.get("loss.env_distill_start", 0.0))
        ed_ramp = float(hparams.get("loss.env_distill_ramp", 0.0))
        ed_end = float(hparams.get("loss.env_distill_end", 0.0))
        ed_fall = float(hparams.get("loss.env_distill_fall", 0.0))
        if ed_fall > 0 and ed_end == 0:
            # A fall window with no `end` would anchor the fall at step 0
            # (the tie would never be at full weight); reject loudly
            # rather than silently ignoring the knob (round-4 advisor).
            raise ValueError(
                "loss.env_distill_fall > 0 requires loss.env_distill_end"
                " > 0 (the fall window starts at `end`)")
        if ed_start > 0 or ed_ramp > 0 or ed_end > 0:
            if step is None:
                # Silently applying the FLAT full weight would quietly
                # undo the schedule (e.g. the anneal-off shadow recipe's
                # tie would never release). Both in-repo train paths pass
                # step; a caller that doesn't must not request a schedule.
                raise ValueError(
                    "step-scheduled loss.env_distill_{start,ramp,end} set"
                    " but no `step` was passed to pano_losses")
            max_steps = float(hparams["optimizer.max_steps"])
            s = step.astype(jnp.float32)
            if ed_start > 0 or ed_ramp > 0:
                s0 = ed_start * max_steps
                r = jnp.maximum(ed_ramp * max_steps, 1.0)
                ed_sched = jnp.clip((s - s0) / r, 0.0, 1.0)
            else:
                ed_sched = jnp.float32(1.0)  # pure anneal-off: on from 0
            if ed_end > 0:
                e0 = ed_end * max_steps
                f = jnp.maximum(ed_fall * max_steps, 1.0)
                ed_sched = ed_sched * (1.0 - jnp.clip((s - e0) / f,
                                                      0.0, 1.0))

    if fine.ort_loss is not None:
        w_ort = hparams["loss.ort_loss"]
        boost = float(hparams.get("loss.ort_tie_boost", 0.0))
        if boost > 0 and (w_ed > 0 or w_eda > 0):
            # Tie-window normals re-weighting (round-5 shadow study): the
            # env_distill tie measurably redistributes error into the
            # normals while it is on (shadow preset: normal ws-MAE 33.8
            # vs prod 22.9). Scale the orientation loss UP by `boost`
            # while the tie is at full weight, riding the SAME trapezoid
            # back to the flat weight as the tie anneals off — extra
            # orientation pressure exactly when the tie is pushing, none
            # once it releases. With an unscheduled (flat) tie the boost
            # is flat too. No-op when env_distill is off.
            tie = ed_sched if ed_sched is not None else 1.0
            w_ort = w_ort * (1.0 + (boost - 1.0) * tie)
        loss = loss + w_ort * fine.ort_loss
        parts["ort"] = fine.ort_loss

    # Beyond-reference stabilizers (production defaults are filled by
    # prepare_hparams — the in-code fallbacks here are strict parity).
    w_dist = float(hparams.get("loss.distortion_loss", 0.0))
    if w_dist > 0 and fine.dist_loss is not None:
        dist = fine.dist_loss + (coarse.dist_loss
                                 if coarse.dist_loss is not None else 0.0)
        loss = loss + w_dist * dist
        parts["dist"] = dist
    w_sat = float(hparams.get("loss.saturation_loss", 0.0))
    if w_sat > 0:
        sat = saturation_loss(fine.rgb, ldr_gt, mask,
                              margin=float(
                                  hparams.get("loss.saturation_margin",
                                              1.0)))
        loss = loss + w_sat * sat
        parts["sat"] = sat
    # View-consistency (round-3 HDR attack): symmetric log-space pull
    # between the fine level's composited radiance and the same samples
    # composited under a random view direction (LevelOutput.rgb_alt).
    # log1p keeps O(1) gradients above the tonemap knee — the whole point
    # is transmitting super-knee intensity between view directions, where
    # LDR-space losses have vanishing slope. The measured decoupling it
    # closes: emitter radiance 72 from the camera direction vs 2.8-4.3
    # from floor points (NOTES.md HDR study mechanism 2).
    w_vc = float(hparams.get("loss.view_consistency", 0.0))
    if w_vc > 0 and fine.rgb_alt is not None:
        if bool(hparams.get("loss.vc_luma", False)):
            # Chroma-preserving variant: tie only the Rec.709 luma across
            # views. The per-channel tie transmits intensity but ALSO
            # pulls the env view's spectrum toward the knee-flattened
            # primary view, suppressing channel-structure recovery
            # (measured: the B channel of a partially-saturating emitter
            # separates correctly only with the tie off — NOTES.md wall
            # study, vc0 probe). Luma keeps the intensity transmission
            # while chroma floats to the irradiance evidence.
            vc = masked_mse(
                jnp.log1p(compute_illumination(jax.nn.relu(fine.rgb_alt))),
                jnp.log1p(compute_illumination(jax.nn.relu(fine.rgb))),
                mask)
            if bool(hparams.get("loss.vc_sat_mask", False)):
                # Saturation-masked per-channel tie on top of the luma
                # tie: where a GT channel is UNSATURATED the primary
                # view's value for it is trustworthy (the vol loss pins
                # it), so tying that channel across views transmits REAL
                # chroma — while saturated channels stay luma-only (their
                # primary-view spectrum is knee-flattened, the signal the
                # plain per-channel tie wrongly propagated). Motivated by
                # the duo scenes: each opposite-chroma source keeps one
                # channel below the knee (warm B 6.5, cool R 6.5 < 7.24),
                # exactly the anchor this mask exposes per channel.
                unsat = (ldr_gt < 1.0).astype(fine.rgb.dtype) * mask
                diff = (jnp.log1p(jax.nn.relu(fine.rgb_alt))
                        - jnp.log1p(jax.nn.relu(fine.rgb)))
                vc_ch = jnp.sum(unsat * diff ** 2) / jnp.maximum(
                    jnp.sum(unsat), 1.0)
                vc = vc + vc_ch
        else:
            vc = masked_mse(jnp.log1p(jax.nn.relu(fine.rgb_alt)),
                            jnp.log1p(jax.nn.relu(fine.rgb)), mask)
        loss = loss + w_vc * vc
        parts["vc"] = vc
    # Chroma-only cross-view tie (round-3 duo attack, loss.vc_chroma):
    # the attribution probe (NOTES.md "duo cross-source assignment")
    # shows the view-dependent head collapses to ONE global illuminant
    # chroma along the unsupervised secondary directions — the
    # irradiance integral consumes that collapsed read, so with two
    # opposite-chroma sources whichever dominates wins both assignments.
    # Tie the LOG-CHROMA (log1p rgb minus its channel mean — intensity-
    # free, so it cannot ride the per-channel tie's intensity-divergence
    # loop, NOTES.md vc_luma study) between the primary and the
    # alternate-direction composite of the SAME samples: each spatial
    # point's spectrum becomes view-independent, exact for the
    # Lambertian emitters the formulation targets. Complements vc_luma
    # (intensity tie): together they span the per-channel tie WITHOUT
    # its knee-flattened-spectrum failure mode, because both sides here
    # are predictions (which the HDR machinery orders), not the LDR GT.
    w_vcc = float(hparams.get("loss.vc_chroma", 0.0))
    if w_vcc > 0 and fine.rgb_alt is not None:
        log_p = jnp.log1p(jax.nn.relu(fine.rgb))
        log_a = jnp.log1p(jax.nn.relu(fine.rgb_alt))
        chroma_p = log_p - jnp.mean(log_p, axis=-1, keepdims=True)
        if bool(hparams.get("loss.vc_chroma_sg", False)):
            # One-way tie (duo vcc gate, NOTES.md): the symmetric tie
            # measured NEGATIVE — the alt side is unsupervised, so the
            # collapsed global chroma flows INTO the primary read and
            # flips the cool source's spectrum. Stop-grad the primary
            # target so the alternate-direction read INHERITS each
            # point's primary spectrum without back-pressure.
            chroma_p = jax.lax.stop_gradient(chroma_p)
        vcc = masked_mse(
            log_a - jnp.mean(log_a, axis=-1, keepdims=True),
            chroma_p, mask)
        loss = loss + w_vcc * vcc
        parts["vcc"] = vcc
    # Cross-scale self-distillation (BaseNeRF.rgb_scale/dist_scale): the
    # primary ray re-marched at the secondary-ray IPE scale must composite
    # to the same radiance and expected distance as the fine march
    # (stop-gradient targets — the fine field teaches, the blurred field
    # learns). This anchors the ONLY scale the irradiance queries read to
    # the primary-supervised field; without it, that scale is free to
    # paint phantom radiance decoupled from the scene (round-3 env-scale
    # probe: the trained blurred-scale march puts ~0 weight at the true
    # emitter and bright mass where the fine field is empty). log1p keeps
    # O(1) gradients above the tonemap knee like the vc term.
    w_sd = float(hparams.get("loss.scale_distill", 0.0))
    w_sdd = float(hparams.get("loss.scale_distill_dist", 0.0))
    if (w_sd > 0 or w_sdd > 0) and fine.rgb_scale is not None:
        sd = masked_mse(
            jnp.log1p(jax.nn.relu(fine.rgb_scale)),
            jax.lax.stop_gradient(jnp.log1p(jax.nn.relu(fine.rgb))), mask)
        # The DISTANCE tie is a separate, default-OFF weight: measured to
        # collapse geometry (duo_cool 44k at weight 0.1: depth_delta1 0.0,
        # LDR 8.9 — train views memorized by a near-camera shell). Making
        # the blurred march reproduce the fine expected distance demands
        # env-scale-wide density AT the surface, which through the shared
        # MLP destroys the fine-scale geometry; the rgb tie alone anchors
        # the quantity the irradiance queries actually consume.
        if w_sdd > 0 and fine.dist_scale is not None:
            sd_dist = masked_mse(
                fine.dist_scale[..., None],
                jax.lax.stop_gradient(fine.distance)[..., None], mask)
            loss = loss + w_sdd * sd_dist
            parts["scale_distill_dist"] = sd_dist
        loss = loss + w_sd * sd
        parts["scale_distill"] = sd
    # Stochastic per-direction distillation of the secondary read
    # (BaseNeRF.env_distill_samples; round-3 occlusion study): the
    # irradiance loss constrains only the cosine-weighted SUM over the D
    # env directions, so the per-direction secondary read is free to be
    # a fog (measured: ~0.65 luma every direction vs GT 0.17 wall / 8.2
    # emitter — the mechanism behind both the albedo shadow-baking and
    # the emitter under-read). This ties the read along ONE random
    # direction per point to a finer re-march of the same ray
    # (stop-grad; the scale the primary views supervise). log1p keeps
    # O(1) gradients above the knee. Unlike scale_distill the target is
    # a SECONDARY ray — the exact quantity the integral consumes.
    if w_ed > 0 and fine.env_read is not None:
        ed = masked_mse(
            jnp.log1p(jax.nn.relu(fine.env_read)),
            jnp.log1p(jax.nn.relu(fine.env_fine)), mask)
        # Step schedule (round-4 occlusion-affordability study; the
        # trapezoid `ed_sched` is computed up front, before the ort
        # term): the flat w=0.1 tie buys shadow contrast 1.10 -> 1.92
        # but costs HDR endpoint and normal-MAE — its gradient pressure
        # lands hardest EARLY, while geometry is still settling (the
        # same reasoning as train.surface_start_step). `start` delays
        # the tie until that fraction of max_steps; `ramp` then raises
        # the weight linearly 0 -> w over a further fraction, avoiding a
        # weight discontinuity mid-run. Both 0 (default) = the flat
        # round-3 behavior, bitwise (no dependence on `step` is traced).
        # `end`/`fall` are the inverse schedule: tie ON from the start
        # (the fog forms early, and the round-4 delayed-onset gate
        # measured a mid-run introduction DESTABILIZING a settled field:
        # shadow ed01_s45r2 LDR 27.76 @20k -> 22.6 @40k), then anneal
        # linearly to ZERO over `fall` beginning at `end`, so the HDR
        # machinery gets the tail of the schedule to repair the
        # endpoint the flat tie measurably costs.
        if ed_sched is not None:
            loss = loss + (w_ed * ed_sched) * ed
        else:
            loss = loss + w_ed * ed
        parts["env_distill"] = ed
    # Transmittance half of the per-direction tie (round-5 occlusion
    # attack #13): the radiance tie calibrates what the blurred read
    # RETURNS but the re-formed wall fog after the anneal-off release
    # lives in the blurred march's TRANSMITTANCE (probe: wall-direction
    # composite 0.50 luma vs GT 0.17 at contrast 3.15 — the residual of
    # the sum-constrained irradiance loss). Tie the same selected
    # direction's blurred acc to the fine re-march's acc (stop-grad,
    # raw [0,1] space), riding the same trapezoid as the radiance tie.
    if w_eda > 0 and fine.env_read_acc is not None:
        eda = masked_mse(fine.env_read_acc[..., None],
                         fine.env_fine_acc[..., None], mask)
        if ed_sched is not None:
            loss = loss + (w_eda * ed_sched) * eda
        else:
            loss = loss + w_eda * eda
        parts["env_distill_acc"] = eda
    # Expected-distance tie (round-5 occlusion attack #14): the acc tie
    # (#13) measured VACUOUS — the blurred march's total opacity is
    # already ~1 along every probed direction, so the fog is not in how
    # much weight accumulates but WHERE it lands; the expected distance
    # reads exactly that. Fine re-march target (its density is
    # primary-supervised, so it terminates at real surfaces), stop-grad,
    # log-space (distances span [near, far] multiplicatively), same
    # trapezoid. Unlike scale_distill_dist (primary rays, collapsed
    # geometry at 0.1) the tie here is per secondary DIRECTION with a
    # finer-march target — the quantity the fog actually corrupts.
    if w_edd > 0 and fine.env_read_dist is not None:
        edd = masked_mse(
            jnp.log(jnp.maximum(fine.env_read_dist, 1e-3))[..., None],
            jnp.log(jnp.maximum(fine.env_fine_dist, 1e-3))[..., None],
            mask)
        if ed_sched is not None:
            loss = loss + (w_edd * ed_sched) * edd
        else:
            loss = loss + w_edd * edd
        parts["env_distill_dist"] = edd
    # Illuminant-field distillation (round-5 duo attack #8b): the
    # spatially-varying illuminant field learns each source's CORRECT
    # per-direction spectrum from receiver consensus (measured: the
    # round-5 probe reads illum_chroma 0.464/0.266/0.269 at the warm
    # source and 0.281/0.325/0.393 at the cool one — essentially GT —
    # on the very checkpoint whose radiance-field reads stay collapsed
    # to the scene mean). The re-tint alone fixes what the INTEGRAL
    # consumes but nothing moves the emitters' own radiance, so the
    # HDR image metric doesn't move. This term closes the loop: pull
    # the PRE-tint secondary read's chroma (the radiance-field side —
    # at etc that is the tight, primary-supervised scale) toward the
    # stop-grad field chroma, per (point, direction). One-way by
    # construction: the field keeps learning only from the integral.
    w_ild = float(hparams.get("loss.illum_distill", 0.0))
    if w_ild > 0 and fine.env_pre_illum is not None:
        pre = jax.nn.relu(fine.env_pre_illum)
        pre_chroma = pre / (jnp.sum(pre, axis=-1, keepdims=True) + 1e-4)
        tgt = jax.lax.stop_gradient(fine.illum_chroma)
        B = pre_chroma.shape[0]
        ild = masked_mse(pre_chroma.reshape(B, -1),
                         tgt.reshape(B, -1), mask)
        # Rise schedule (round-5 phase-2 recipe): delay the pull until
        # `start` (fraction of max_steps), ramp to full over `ramp` —
        # paired with train.illum_freeze at the same point, so the
        # field LEARNS first (from the still-collapsed radiance) and
        # TEACHES second (frozen, the distill cannot become
        # self-fulfilling — the measured always-on failure mode where
        # the field drifts once the radiance starts matching it).
        ild_start = float(hparams.get("loss.illum_distill_start", 0.0))
        ild_ramp = float(hparams.get("loss.illum_distill_ramp", 0.0))
        if ild_start > 0 or ild_ramp > 0:
            if step is None:
                raise ValueError(
                    "loss.illum_distill_start/_ramp set but no `step` "
                    "was passed to pano_losses")
            max_steps = float(hparams["optimizer.max_steps"])
            s0 = ild_start * max_steps
            r = jnp.maximum(ild_ramp * max_steps, 1.0)
            rise = jnp.clip((step.astype(jnp.float32) - s0) / r, 0.0, 1.0)
            loss = loss + (w_ild * rise) * ild
        else:
            loss = loss + w_ild * ild
        parts["illum_distill"] = ild
    # Emission sparsity (emissive-head decomposition, BaseNeRF.
    # emissive_head): L1 on the composited self-emission — emission is
    # non-negative by construction, so this is a masked mean — keeping it
    # at zero except where evidence (the surface loss at source pixels,
    # the irradiance coupling) demands it. Without the prior the
    # view-dependent and emission channels are unidentifiable.
    w_em = float(hparams.get("loss.emission_sparsity", 0.0))
    if w_em > 0 and fine.emission is not None:
        em = jnp.sum(mask * fine.emission) / (
            3.0 * jnp.maximum(jnp.sum(mask), 1.0))
        loss = loss + w_em * em
        parts["emission"] = em

    parts["loss"] = loss
    return parts


def mipnerf_losses(outputs, rgbs_gt: Array, mask: Array, hparams: Dict
                   ) -> Dict[str, Optional[Array]]:
    """Baseline mip-NeRF loss (reference mipnerf_system.py:22-53)."""
    coarse, fine = outputs[0], outputs[-1]
    ldr_gt = hdr_to_ldr(rgbs_gt, quantize=True)
    vol_coarse = masked_mse(hdr_to_ldr(coarse.rgb), ldr_gt, mask)
    vol_fine = masked_mse(hdr_to_ldr(fine.rgb), ldr_gt, mask)
    loss = hparams["loss.coarse_loss_mult"] * vol_coarse + vol_fine
    parts = dict(vol_coarse=vol_coarse, vol_fine=vol_fine, ort=None)
    if fine.ort_loss is not None and hparams["loss.ort_loss"] > 0:
        loss = loss + hparams["loss.ort_loss"] * fine.ort_loss
        parts["ort"] = fine.ort_loss
    parts["loss"] = loss
    return parts


def thin_surface(n, d, weight):
    """Weighted ReLU(N.D) thin-surface penalty.

    Ported for API parity: the reference defines it (models/loss.py:3-7) and
    star-imports it into both systems but never calls it.
    """
    NoD = jnp.maximum(jnp.sum(n.reshape(-1, 3) * d.reshape(-1, 3),
                              axis=-1, keepdims=True), 0.0)
    return weight.reshape(-1, 1) * NoD
