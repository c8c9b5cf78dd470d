"""Training-loss composition tests for both systems."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from pano_nerf_tpu.engine.losses import (mipnerf_losses, pano_losses,
                                         prepare_hparams)
from pano_nerf_tpu.models.base import LevelOutput
from pano_nerf_tpu.ops.shading import hdr_to_ldr

# Key-less dict = strict reference-loss parity (stabilizers off).
HP = {
    "loss.coarse_loss_mult": 0.1,
    "loss.surface_loss": 1.0,
    "loss.ort_loss": 0.1,
    "loss.chrom_loss": 0.1,
}
# Production defaults (what the systems train with).
HP_PROD = prepare_hparams(HP)


def level(rgb, **kw):
    B = rgb.shape[0]
    return LevelOutput(rgb=rgb, distance=jnp.ones((B,)), acc=jnp.ones((B,)),
                       **kw)


class TestPanoLosses:
    def test_perfect_prediction_zero_recon(self):
        B = 16
        gt = jnp.abs(jnp.sin(jnp.arange(B * 3.0))).reshape(B, 3) * 2
        # GT is quantized to 8 bits while predictions are continuous, so
        # "perfect" HDR prediction leaves only quantization residue.
        mask = jnp.ones((B, 1))
        outs = [level(gt), level(gt, normal=jnp.ones((B, 3)),
                                 albedo=jnp.full((B, 3), 0.5),
                                 surf_rgb=gt,
                                 ort_loss=jnp.asarray(0.0))]
        parts = pano_losses(outs, gt, mask, HP, enable_surf=True)
        q_err = float(jnp.mean((hdr_to_ldr(gt) - hdr_to_ldr(gt, quantize=True)) ** 2))
        assert float(parts["vol_fine"]) <= q_err * 4
        assert float(parts["vol_surface"]) <= q_err * 4

    def test_composition_weights(self):
        B = 4
        gt = jnp.ones((B, 3))
        pred = jnp.zeros((B, 3))
        mask = jnp.ones((B, 1))
        outs = [level(pred), level(pred, normal=jnp.ones((B, 3)),
                                   albedo=jnp.full((B, 3), 0.5),
                                   surf_rgb=pred,
                                   ort_loss=jnp.asarray(2.0))]
        parts = pano_losses(outs, gt, mask, HP, enable_surf=True)
        expect = (0.1 * parts["vol_coarse"] + parts["vol_fine"]
                  + 1.0 * parts["vol_surface"] + 0.1 * parts["chrom"]
                  + 0.1 * 2.0)
        np.testing.assert_allclose(float(parts["loss"]), float(expect),
                                   rtol=1e-6)

    def test_surface_disabled_drops_terms(self):
        B = 4
        gt = jnp.ones((B, 3))
        outs = [level(jnp.zeros((B, 3))),
                level(jnp.zeros((B, 3)), ort_loss=jnp.asarray(1.0))]
        parts = pano_losses(outs, gt, jnp.ones((B, 1)), HP, enable_surf=False)
        assert parts["vol_surface"] is None
        assert parts["chrom"] is None
        assert parts["ort"] is not None

    def test_mask_weighting(self):
        """Rays with lossmult 0 must not contribute."""
        gt = jnp.asarray([[1.0, 1, 1], [1, 1, 1]])
        pred = jnp.asarray([[1.0, 1, 1], [0, 0, 0]])
        mask = jnp.asarray([[1.0], [0.0]])
        outs = [level(pred), level(pred, ort_loss=None)]
        parts = pano_losses(outs, gt, mask, HP, enable_surf=False)
        q = float(jnp.mean((hdr_to_ldr(gt[0]) - hdr_to_ldr(gt[0], quantize=True)) ** 2))
        assert float(parts["vol_fine"]) <= q * 4 + 1e-6


class TestMipNerfLosses:
    def test_ort_only_when_weighted(self):
        B = 4
        gt = jnp.ones((B, 3))
        outs = [level(jnp.zeros((B, 3))),
                level(jnp.zeros((B, 3)), ort_loss=jnp.asarray(3.0))]
        hp0 = dict(HP, **{"loss.ort_loss": 0})
        p0 = mipnerf_losses(outs, gt, jnp.ones((B, 1)), hp0)
        p1 = mipnerf_losses(outs, gt, jnp.ones((B, 1)), HP)
        np.testing.assert_allclose(float(p1["loss"]) - float(p0["loss"]),
                                   0.1 * 3.0, rtol=1e-5)


class TestStabilizerLosses:
    """Round-2 beyond-reference terms: distortion + saturation knee prior
    (the HDR-divergence fix, NOTES.md HDR study)."""

    def test_distortion_zero_for_delta(self):
        """All weight in one narrow interval -> loss ~ its intra term only."""
        from pano_nerf_tpu.ops.mip import distortion_loss
        t = jnp.linspace(0.0, 1.0, 9)[None, :]  # 8 intervals of 1/8
        w = jnp.zeros((1, 8)).at[0, 3].set(1.0)
        val = float(distortion_loss(t, w))
        np.testing.assert_allclose(val, (1.0 / 8) / 3.0, rtol=1e-5)

    def test_distortion_penalizes_spread(self):
        from pano_nerf_tpu.ops.mip import distortion_loss
        t = jnp.linspace(0.0, 1.0, 9)[None, :]
        peaked = jnp.zeros((1, 8)).at[0, 3].set(1.0)
        spread = jnp.full((1, 8), 1.0 / 8)
        assert float(distortion_loss(t, spread)) > float(
            distortion_loss(t, peaked)) * 3

    def test_saturation_knee_value(self):
        """The knee tonemaps to exactly 1.0 (pre-gamma ACES = 1)."""
        from pano_nerf_tpu.engine.losses import SATURATION_KNEE
        x = SATURATION_KNEE
        aces = (x * (2.51 * x + 0.03)) / (x * (2.43 * x + 0.59) + 0.14)
        np.testing.assert_allclose(aces, 1.0, atol=1e-6)

    def test_saturation_one_sided_and_masked(self):
        from pano_nerf_tpu.engine.losses import (SATURATION_KNEE,
                                                 saturation_loss)
        ldr_gt = jnp.asarray([[1.0, 1.0, 0.9],   # R,G saturated
                              [0.5, 0.5, 0.5]])  # unsaturated
        mask = jnp.ones((2, 1))
        below = jnp.full((2, 3), SATURATION_KNEE - 1.0)
        assert float(saturation_loss(below, ldr_gt, mask)) == 0.0
        above = jnp.full((2, 3), SATURATION_KNEE + 2.0)
        # Only the 2 saturated channels of row 0 contribute: mean excess 2.
        np.testing.assert_allclose(
            float(saturation_loss(above, ldr_gt, mask)), 2.0, rtol=1e-6)
        # Masked-out rays contribute nothing.
        mask0 = jnp.asarray([[0.0], [1.0]])
        assert float(saturation_loss(above, ldr_gt, mask0)) == 0.0

    def test_wired_into_pano_losses(self):
        B = 4
        gt = jnp.ones((B, 3)) * 20.0  # saturated
        outs = [level(jnp.ones((B, 3)) * 20.0),
                level(jnp.ones((B, 3)) * 20.0, ort_loss=jnp.asarray(0.0))]
        p_off = pano_losses(outs, gt, jnp.ones((B, 1)), HP,
                            enable_surf=False)  # key-less = parity = off
        # Production default is 0.01 with margin 2.0 (the runaway guard);
        # the wiring is exercised with an explicit weight and the 20.0
        # predictions (2.76x knee) engage it through the margin too.
        hp_sat = dict(HP_PROD, **{"loss.saturation_loss": 0.01})
        p_on = pano_losses(outs, gt, jnp.ones((B, 1)), hp_sat,
                           enable_surf=False)
        assert "sat" in p_on and float(p_on["sat"]) > 0
        assert float(p_on["loss"]) > float(p_off["loss"])
        # prepare_hparams never overrides explicit values.
        hp_explicit = prepare_hparams(
            dict(HP, **{"loss.saturation_loss": 0.02}))
        assert hp_explicit["loss.saturation_loss"] == 0.02

    def test_view_consistency_wired(self):
        """vc (production default 0.1) pulls rgb_alt toward rgb in log
        space; absent rgb_alt or weight 0 leaves the loss untouched."""
        B = 4
        gt = jnp.ones((B, 3))
        rgb = jnp.full((B, 3), 2.0)
        outs_alt = [level(rgb),
                    level(rgb, ort_loss=None,
                          rgb_alt=jnp.full((B, 3), 6.0))]
        # Production default ties LUMA (vc_luma True); grey composites
        # have luma equal to their value, so expect one squared log1p gap.
        p = pano_losses(outs_alt, gt, jnp.ones((B, 1)), HP_PROD,
                        enable_surf=False)
        assert "vc" in p and float(p["vc"]) > 0
        gap = float(
            (jnp.log1p(jnp.asarray(6.0)) - jnp.log1p(jnp.asarray(2.0)))
            ** 2)
        np.testing.assert_allclose(float(p["vc"]), gap, rtol=1e-6)
        # Per-channel variant: masked_mse sums the 3 channels per ray.
        hp_pc = dict(HP_PROD, **{"loss.vc_luma": False})
        p_pc = pano_losses(outs_alt, gt, jnp.ones((B, 1)), hp_pc,
                           enable_surf=False)
        np.testing.assert_allclose(float(p_pc["vc"]), 3 * gap, rtol=1e-6)
        outs_none = [level(rgb), level(rgb, ort_loss=None)]
        p0 = pano_losses(outs_none, gt, jnp.ones((B, 1)), HP_PROD,
                         enable_surf=False)
        assert "vc" not in p0
        np.testing.assert_allclose(
            float(p["loss"]) - float(p0["loss"]), 0.1 * gap,
            rtol=1e-5)

    def test_vc_chroma_intensity_free_tie(self):
        """loss.vc_chroma ties log-chroma only: a pure intensity gap
        across views contributes exactly zero, a pure chroma gap is
        penalized, and the key defaults off (strict parity)."""
        B = 4
        gt = jnp.ones((B, 3))
        mask = jnp.ones((B, 1))
        rgb = jnp.full((B, 3), 2.0)
        hp_on = dict(HP_PROD, **{"loss.vc_chroma": 0.1})

        # Grey-to-grey with a 3x intensity gap: chroma identical -> 0.
        outs_grey = [level(rgb),
                     level(rgb, ort_loss=None,
                           rgb_alt=jnp.full((B, 3), 6.0))]
        p_grey = pano_losses(outs_grey, gt, mask, hp_on, enable_surf=False)
        assert "vcc" in p_grey
        np.testing.assert_allclose(float(p_grey["vcc"]), 0.0, atol=1e-7)

        # Chroma gap at matched luma-scale: penalized by the log-chroma
        # residual summed over channels (masked_mse convention).
        alt = jnp.tile(jnp.asarray([[2.0, 2.0, 8.0]]), (B, 1))
        outs_chroma = [level(rgb), level(rgb, ort_loss=None, rgb_alt=alt)]
        p_c = pano_losses(outs_chroma, gt, mask, hp_on, enable_surf=False)
        la = np.log1p(np.asarray([2.0, 2.0, 8.0]))
        expect = float(np.sum((la - la.mean()) ** 2))
        np.testing.assert_allclose(float(p_c["vcc"]), expect, rtol=1e-5)
        # The weighted term lands in the total.
        p_off = pano_losses(outs_chroma, gt, mask, HP_PROD,
                            enable_surf=False)
        assert "vcc" not in p_off
        np.testing.assert_allclose(
            float(p_c["loss"]) - float(p_off["loss"]), 0.1 * expect,
            rtol=1e-5)

    def test_vc_chroma_sg_one_way_gradient(self):
        """loss.vc_chroma_sg stops gradient into the primary-side chroma:
        the vcc value is identical, but d(vcc)/d(rgb) vanishes while
        d(vcc)/d(rgb_alt) survives."""
        B = 4
        gt = jnp.ones((B, 3))
        mask = jnp.ones((B, 1))
        hp_sym = dict(HP_PROD, **{"loss.vc_chroma": 0.1})
        hp_sg = dict(hp_sym, **{"loss.vc_chroma_sg": True})

        def vcc(hp, rgb, alt):
            outs = [level(rgb), level(rgb, ort_loss=None, rgb_alt=alt)]
            return pano_losses(outs, gt, mask, hp, enable_surf=False)["vcc"]

        rgb = jnp.full((B, 3), 2.0)
        alt = jnp.tile(jnp.asarray([[2.0, 2.0, 8.0]]), (B, 1))
        np.testing.assert_allclose(float(vcc(hp_sg, rgb, alt)),
                                   float(vcc(hp_sym, rgb, alt)), rtol=1e-6)
        g_p_sym = jax.grad(lambda r: vcc(hp_sym, r, alt))(rgb)
        g_p_sg = jax.grad(lambda r: vcc(hp_sg, r, alt))(rgb)
        g_a_sg = jax.grad(lambda a: vcc(hp_sg, rgb, a))(alt)
        assert float(jnp.sum(jnp.abs(g_p_sym))) > 0
        np.testing.assert_allclose(np.asarray(g_p_sg), 0.0, atol=1e-9)
        assert float(jnp.sum(jnp.abs(g_a_sg))) > 0

    def test_vc_sat_mask_per_channel_tie(self):
        """loss.vc_sat_mask adds a per-channel log1p tie ONLY on channels
        whose GT is unsaturated; fully saturated GT reduces it bitwise to
        the plain luma tie, and the key off is bitwise-shipped behavior."""
        from pano_nerf_tpu.engine.losses import SATURATION_KNEE
        B = 4
        rgb = jnp.full((B, 3), 2.0)
        outs = [level(rgb),
                level(rgb, ort_loss=None, rgb_alt=jnp.full((B, 3), 6.0))]
        mask = jnp.ones((B, 1))
        gap = float(
            (jnp.log1p(jnp.asarray(6.0)) - jnp.log1p(jnp.asarray(2.0)))
            ** 2)
        hp_on = dict(HP_PROD, **{"loss.vc_sat_mask": True})

        # All GT channels unsaturated: luma tie + full 3-channel mean tie
        # (per-channel normalizer counts channel entries, so the extra
        # term equals one gap, not three).
        gt_unsat = jnp.ones((B, 3))
        p = pano_losses(outs, gt_unsat, mask, hp_on, enable_surf=False)
        np.testing.assert_allclose(float(p["vc"]), 2 * gap, rtol=1e-6)

        # All GT channels saturated: bitwise the plain luma tie.
        gt_sat = jnp.full((B, 3), 2 * SATURATION_KNEE)
        p_sat = pano_losses(outs, gt_sat, mask, hp_on, enable_surf=False)
        p_luma = pano_losses(outs, gt_sat, mask, HP_PROD, enable_surf=False)
        assert float(p_sat["vc"]) == float(p_luma["vc"])

        # Mixed: one unsaturated channel out of three contributes with a
        # per-entry normalizer over the unsaturated count only.
        gt_mix = jnp.stack([jnp.full((B,), 2 * SATURATION_KNEE),
                            jnp.full((B,), 2 * SATURATION_KNEE),
                            jnp.ones((B,))], axis=-1)
        p_mix = pano_losses(outs, gt_mix, mask, hp_on, enable_surf=False)
        np.testing.assert_allclose(float(p_mix["vc"]), 2 * gap, rtol=1e-6)

        # Key absent = shipped behavior, bitwise.
        p_off = pano_losses(outs, gt_unsat, mask, HP_PROD,
                            enable_surf=False)
        np.testing.assert_allclose(float(p_off["vc"]), gap, rtol=1e-6)

    def test_unclipped_pred_tonemap_restores_gradient(self):
        """Past-knee predictions keep a restoring gradient toward an
        unsaturated GT channel (the clamp would zero it)."""
        import jax
        from pano_nerf_tpu.engine.losses import SATURATION_KNEE
        gt = jnp.full((2, 3), 7.0)  # just below the knee: unsaturated GT

        def loss_of(pred_val, hp):
            pred = jnp.full((2, 3), pred_val)
            outs = [level(pred), level(pred, ort_loss=None)]
            return pano_losses(outs, gt, jnp.ones((2, 1)), hp,
                               enable_surf=False)["loss"]

        hp_on = dict(HP_PROD, **{"loss.saturation_loss": 0,
                                 "loss.distortion_loss": 0})
        g_on = float(jax.grad(loss_of)(SATURATION_KNEE + 3.0, hp_on))
        assert g_on > 0  # pulls the overshoot down
        hp_off = dict(hp_on, **{"loss.unclipped_pred_tonemap": False})
        g_off = float(jax.grad(loss_of)(SATURATION_KNEE + 3.0, hp_off))
        assert g_off == 0.0  # the reference clamp: no gradient
        # Below the knee both paths are bitwise identical.
        np.testing.assert_allclose(float(loss_of(3.0, hp_on)),
                                   float(loss_of(3.0, hp_off)), rtol=0)

    def test_gt_quantize_knob(self):
        """loss.gt_quantize=False keeps float LDR GT: a quasi-saturated
        channel (radiance 5 tonemaps within one LSB of white) regains its
        sub-LSB restoring gradient — the measured channel-drift mechanism
        on partially-saturating emitters (NOTES.md round-3 generality
        study). Default True = reference's 8-bit quantization."""
        gt = jnp.full((2, 3), 5.0)   # quasi-saturated: LDR 253/255
        hp = dict(HP_PROD, **{"loss.saturation_loss": 0,
                              "loss.distortion_loss": 0})

        def loss_of(pred_val, hp):
            pred = jnp.full((2, 3), pred_val)
            outs = [level(pred), level(pred, ort_loss=None)]
            return pano_losses(outs, gt, jnp.ones((2, 1)), hp,
                               enable_surf=False)["loss"]

        # exact GT radiance: float-LDR loss is ~0, quantized is biased
        l_q = float(loss_of(5.0, hp))
        l_f = float(loss_of(5.0, dict(hp, **{"loss.gt_quantize": False})))
        assert l_f < l_q
        assert l_f < 1e-10
        # far from saturation the two are one quantization step apart and
        # both keep a healthy gradient
        import jax
        g_f = float(jax.grad(loss_of)(
            7.0, dict(hp, **{"loss.gt_quantize": False})))
        assert g_f > 0


class TestSaturationMargin:
    def test_margin_semantics(self):
        """margin M: the pull is zero (value and gradient) below M*knee,
        L1 toward M*knee above; margin=1 reproduces the round-2 prior
        bitwise — so margin 2 is a pure runaway guard that cannot touch a
        healthy run."""
        import jax

        from pano_nerf_tpu.engine.losses import (SATURATION_KNEE,
                                                 saturation_loss)
        ldr_gt = jnp.ones((2, 3))
        mask = jnp.ones((2, 1))

        # Beyond-knee but under the guard threshold: identically zero
        # with exactly-zero gradient (the healthy regime, ~1.15x knee).
        healthy = jnp.full((2, 3), 1.2 * SATURATION_KNEE)
        val, grad = jax.value_and_grad(
            lambda p: saturation_loss(p, ldr_gt, mask, margin=2.0))(healthy)
        assert float(val) == 0.0
        assert float(jnp.abs(grad).max()) == 0.0

        # Runaway regime (the measured 2.5x divergence): bounded pull.
        runaway = jnp.full((2, 3), 2.5 * SATURATION_KNEE)
        np.testing.assert_allclose(
            float(saturation_loss(runaway, ldr_gt, mask, margin=2.0)),
            0.5 * SATURATION_KNEE, rtol=1e-6)

        # margin=1 == the original prior, bitwise.
        above = jnp.full((2, 3), SATURATION_KNEE + 2.0)
        np.testing.assert_allclose(
            float(saturation_loss(above, ldr_gt, mask, margin=1.0)),
            float(saturation_loss(above, ldr_gt, mask)), rtol=0)

    def test_margin_key_wired(self):
        """loss.saturation_margin reaches pano_losses."""
        gt = jnp.full((2, 3), 20.0)    # saturated GT
        pred = jnp.full((2, 3), 12.0)  # ~1.66x knee
        outs = [level(pred), level(pred, ort_loss=None)]
        hp = dict(HP_PROD, **{"loss.saturation_loss": 0.01,
                              "loss.saturation_margin": 1.0,
                              "loss.distortion_loss": 0})
        p1 = pano_losses(outs, gt, jnp.ones((2, 1)), hp, enable_surf=False)
        assert float(p1["sat"]) > 0    # margin 1 (knee cap): engaged
        hp2 = dict(hp, **{"loss.saturation_margin": 2.0})
        p2 = pano_losses(outs, gt, jnp.ones((2, 1)), hp2, enable_surf=False)
        assert float(p2["sat"]) == 0.0  # guard at 2x knee: not engaged
        # The SHIPPED defaults (sat 0.01, margin 2.0 via prepare_hparams)
        # leave a 1.66x-knee prediction untouched — the guard never binds
        # in the healthy regime.
        p3 = pano_losses(outs, gt, jnp.ones((2, 1)),
                         dict(HP_PROD, **{"loss.distortion_loss": 0}),
                         enable_surf=False)
        assert float(p3["sat"]) == 0.0


class TestEnvDistillLoss:
    def test_wired_and_keyless_off(self):
        """loss.env_distill ties env_read to env_fine in log1p space;
        absent the key (or the model outputs) the loss is untouched."""
        B = 4
        gt = jnp.ones((B, 3))
        outs = [level(jnp.ones((B, 3))),
                level(jnp.ones((B, 3)),
                      env_read=jnp.ones((B, 3)) * 2.0,
                      env_fine=jnp.ones((B, 3)) * 5.0)]
        mask = jnp.ones((B, 1))
        p_off = pano_losses(outs, gt, mask, HP_PROD, enable_surf=False)
        assert "env_distill" not in p_off
        hp_on = dict(HP_PROD, **{"loss.env_distill": 0.3})
        p_on = pano_losses(outs, gt, mask, hp_on, enable_surf=False)
        # masked_mse normalizes by the mask sum, so the 3 channels SUM.
        want = 3.0 * float((jnp.log1p(2.0) - jnp.log1p(5.0)) ** 2)
        assert abs(float(p_on["env_distill"]) - want) < 1e-6
        assert abs(float(p_on["loss"]) - float(p_off["loss"])
                   - 0.3 * want) < 1e-6
        # Weight set but the model didn't produce the pair (eval path,
        # or env_distill_samples 0): no term, no crash.
        outs_none = [level(jnp.ones((B, 3))), level(jnp.ones((B, 3)))]
        p_none = pano_losses(outs_none, gt, mask, hp_on,
                             enable_surf=False)
        assert "env_distill" not in p_none

    def test_step_schedule(self):
        """loss.env_distill_start/_ramp gate the tie's weight on the
        traced step: zero before start, linear over the ramp, the flat
        round-3 weight after — and with both at 0 (the defaults) the
        schedule keys change nothing even when `step` is passed."""
        B = 4
        gt = jnp.ones((B, 3))
        outs = [level(jnp.ones((B, 3))),
                level(jnp.ones((B, 3)),
                      env_read=jnp.ones((B, 3)) * 2.0,
                      env_fine=jnp.ones((B, 3)) * 5.0)]
        mask = jnp.ones((B, 1))
        base = pano_losses(outs, gt, mask, HP_PROD, enable_surf=False)
        hp = dict(HP_PROD, **{"loss.env_distill": 0.1,
                              "loss.env_distill_start": 0.5,
                              "loss.env_distill_ramp": 0.25,
                              "optimizer.max_steps": 1000})
        want = 3.0 * float((jnp.log1p(2.0) - jnp.log1p(5.0)) ** 2)

        def contrib(step):
            p = pano_losses(outs, gt, mask, hp, enable_surf=False,
                            step=jnp.asarray(step))
            return float(p["loss"]) - float(base["loss"])

        assert abs(contrib(0)) < 1e-7                       # before start
        assert abs(contrib(500)) < 1e-7                     # at start
        assert abs(contrib(625) - 0.05 * want) < 1e-6       # mid-ramp
        assert abs(contrib(750) - 0.1 * want) < 1e-6        # ramp done
        assert abs(contrib(999) - 0.1 * want) < 1e-6        # holds
        # step jump (ramp 0): full weight immediately past start.
        hp_j = dict(hp, **{"loss.env_distill_ramp": 0.0})
        p_j = pano_losses(outs, gt, mask, hp_j, enable_surf=False,
                          step=jnp.asarray(501))
        assert abs(float(p_j["loss"]) - float(base["loss"])
                   - 0.1 * want) < 1e-6
        # Inverse (anneal-off) schedule: full weight from 0, falling to
        # zero over [end, end+fall].
        hp_f = dict(HP_PROD, **{"loss.env_distill": 0.1,
                                "loss.env_distill_end": 0.5,
                                "loss.env_distill_fall": 0.25,
                                "optimizer.max_steps": 1000})

        def contrib_f(step):
            p = pano_losses(outs, gt, mask, hp_f, enable_surf=False,
                            step=jnp.asarray(step))
            return float(p["loss"]) - float(base["loss"])

        assert abs(contrib_f(0) - 0.1 * want) < 1e-6     # on from step 0
        assert abs(contrib_f(500) - 0.1 * want) < 1e-6   # until end
        assert abs(contrib_f(625) - 0.05 * want) < 1e-6  # mid-fall
        assert abs(contrib_f(750)) < 1e-7                # off
        assert abs(contrib_f(999)) < 1e-7
        # Defaults (start 0, ramp 0) + step passed == flat tie exactly.
        hp_flat = dict(HP_PROD, **{"loss.env_distill": 0.1})
        p_flat = pano_losses(outs, gt, mask, hp_flat, enable_surf=False)
        p_flat_step = pano_losses(outs, gt, mask, hp_flat,
                                  enable_surf=False, step=jnp.asarray(7))
        assert float(p_flat["loss"]) == float(p_flat_step["loss"])

    def test_acc_tie(self):
        """loss.env_distill_acc ties the selected direction's blurred acc
        to the fine re-march's acc in raw space, riding the same
        trapezoid as the radiance tie; absent the model outputs it is a
        no-op."""
        B = 4
        gt = jnp.ones((B, 3))
        outs = [level(jnp.ones((B, 3))),
                level(jnp.ones((B, 3)),
                      env_read=jnp.ones((B, 3)) * 2.0,
                      env_fine=jnp.ones((B, 3)) * 5.0,
                      env_read_acc=jnp.full((B,), 0.9),
                      env_fine_acc=jnp.full((B,), 0.2))]
        mask = jnp.ones((B, 1))
        hp_off = dict(HP_PROD, **{"loss.env_distill": 0.1})
        p_off = pano_losses(outs, gt, mask, hp_off, enable_surf=False)
        assert "env_distill_acc" not in p_off
        hp_on = dict(hp_off, **{"loss.env_distill_acc": 0.5})
        p_on = pano_losses(outs, gt, mask, hp_on, enable_surf=False)
        want = float((0.9 - 0.2) ** 2)
        assert abs(float(p_on["env_distill_acc"]) - want) < 1e-6
        assert abs(float(p_on["loss"]) - float(p_off["loss"])
                   - 0.5 * want) < 1e-6
        # Rides the anneal-off trapezoid (same keys as the radiance tie).
        hp_s = dict(hp_on, **{"loss.env_distill_end": 0.5,
                              "loss.env_distill_fall": 0.25,
                              "optimizer.max_steps": 1000})
        p_mid = pano_losses(outs, gt, mask, hp_s, enable_surf=False,
                            step=jnp.asarray(625))
        p_end = pano_losses(outs, gt, mask, hp_s, enable_surf=False,
                            step=jnp.asarray(999))
        p_0 = pano_losses(outs, gt, mask, hp_s, enable_surf=False,
                          step=jnp.asarray(0))
        assert abs((float(p_0["loss"]) - float(p_end["loss"]))
                   - (0.1 * float(p_0["env_distill"])
                      + 0.5 * want)
                   + 0.0) < 1e-5
        # mid-fall is halfway between full-on and released
        assert abs(float(p_mid["loss"])
                   - 0.5 * (float(p_0["loss"]) + float(p_end["loss"]))
                   ) < 1e-5
        # Acc-only tie (env_distill 0) still works, flat.
        hp_acc = dict(HP_PROD, **{"loss.env_distill_acc": 0.5})
        p_acc = pano_losses(outs, gt, mask, hp_acc, enable_surf=False)
        assert "env_distill" not in p_acc
        assert abs(float(p_acc["env_distill_acc"]) - want) < 1e-6
        # No model outputs -> no term.
        outs_none = [level(jnp.ones((B, 3))), level(jnp.ones((B, 3)))]
        assert "env_distill_acc" not in pano_losses(
            outs_none, gt, mask, hp_on, enable_surf=False)

    def test_illum_distill(self):
        """loss.illum_distill pulls the pre-tint secondary chroma toward
        the stop-grad field chroma; absent the model pair it is a
        no-op."""
        B, D = 4, 3
        gt = jnp.ones((B, 3))
        pre = jnp.abs(jax.random.normal(jax.random.PRNGKey(0),
                                        (B, D, 3))) + 0.1
        tgt = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1),
                                               (B, D, 3)), axis=-1)
        outs = [level(jnp.ones((B, 3))),
                level(jnp.ones((B, 3)), env_pre_illum=pre,
                      illum_chroma=tgt)]
        mask = jnp.ones((B, 1))
        p_off = pano_losses(outs, gt, mask, HP_PROD, enable_surf=False)
        assert "illum_distill" not in p_off
        hp_on = dict(HP_PROD, **{"loss.illum_distill": 0.2})
        p_on = pano_losses(outs, gt, mask, hp_on, enable_surf=False)
        pc = np.asarray(pre) / (np.asarray(pre).sum(-1, keepdims=True)
                                + 1e-4)
        want = float(((pc - np.asarray(tgt)) ** 2).reshape(B, -1)
                     .sum(-1).mean())
        assert abs(float(p_on["illum_distill"]) - want) < 1e-5
        assert abs(float(p_on["loss"]) - float(p_off["loss"])
                   - 0.2 * want) < 1e-5
        outs_none = [level(jnp.ones((B, 3))), level(jnp.ones((B, 3)))]
        assert "illum_distill" not in pano_losses(
            outs_none, gt, mask, hp_on, enable_surf=False)
        # Rise schedule (learn-then-teach phase split): zero before
        # start, linear over the ramp, full after; step required.
        hp_s = dict(hp_on, **{"loss.illum_distill_start": 0.5,
                              "loss.illum_distill_ramp": 0.25,
                              "optimizer.max_steps": 1000})

        def contrib(stepv):
            p = pano_losses(outs, gt, mask, hp_s, enable_surf=False,
                            step=jnp.asarray(stepv))
            p0 = pano_losses(outs, gt, mask, HP_PROD, enable_surf=False,
                             step=jnp.asarray(stepv))
            return float(p["loss"]) - float(p0["loss"])

        assert abs(contrib(0)) < 1e-7
        assert abs(contrib(500)) < 1e-7
        assert abs(contrib(625) - 0.1 * want) < 1e-5
        assert abs(contrib(999) - 0.2 * want) < 1e-5
        with pytest.raises(ValueError, match="illum_distill_start"):
            pano_losses(outs, gt, mask, hp_s, enable_surf=False)

    def test_dist_tie(self):
        """loss.env_distill_dist ties the selected direction's blurred
        expected distance to the fine re-march's, in log space, riding
        the shared trapezoid; no-op without the model pair."""
        B = 4
        gt = jnp.ones((B, 3))
        outs = [level(jnp.ones((B, 3))),
                level(jnp.ones((B, 3)),
                      env_read_dist=jnp.full((B,), 4.0),
                      env_fine_dist=jnp.full((B,), 2.0))]
        mask = jnp.ones((B, 1))
        p_off = pano_losses(outs, gt, mask, HP_PROD, enable_surf=False)
        assert "env_distill_dist" not in p_off
        hp_on = dict(HP_PROD, **{"loss.env_distill_dist": 0.5})
        p_on = pano_losses(outs, gt, mask, hp_on, enable_surf=False)
        want = float((np.log(4.0) - np.log(2.0)) ** 2)
        assert abs(float(p_on["env_distill_dist"]) - want) < 1e-6
        assert abs(float(p_on["loss"]) - float(p_off["loss"])
                   - 0.5 * want) < 1e-6
        # Shares the anneal-off trapezoid.
        hp_s = dict(hp_on, **{"loss.env_distill_end": 0.5,
                              "loss.env_distill_fall": 0.25,
                              "optimizer.max_steps": 1000})
        p_end = pano_losses(outs, gt, mask, hp_s, enable_surf=False,
                            step=jnp.asarray(999))
        assert abs(float(p_end["loss"]) - float(p_off["loss"])) < 1e-6

    def test_ort_tie_boost(self):
        """loss.ort_tie_boost (round-5 shadow normals study): the ort
        weight scales by `boost` while the env_distill tie is at full
        weight, riding the same trapezoid back to flat as the tie
        anneals off; flat boost under a flat tie; no-op without the
        tie."""
        B = 4
        gt = jnp.ones((B, 3))
        ortv = 2.0
        outs = [level(jnp.ones((B, 3))),
                level(jnp.ones((B, 3)), ort_loss=jnp.asarray(ortv),
                      env_read=jnp.ones((B, 3)) * 2.0,
                      env_fine=jnp.ones((B, 3)) * 5.0)]
        mask = jnp.ones((B, 1))
        hp = dict(HP_PROD, **{"loss.ort_loss": 0.1,
                              "loss.env_distill": 0.1,
                              "loss.env_distill_end": 0.5,
                              "loss.env_distill_fall": 0.25,
                              "loss.ort_tie_boost": 3.0,
                              "optimizer.max_steps": 1000})
        hp_nb = dict(hp, **{"loss.ort_tie_boost": 0.0})

        def ort_contrib(hp_, step):
            p = pano_losses(outs, gt, mask, hp_, enable_surf=False,
                            step=jnp.asarray(step))
            p0 = pano_losses(
                [outs[0], outs[1]._replace(ort_loss=jnp.asarray(0.0))],
                gt, mask, hp_, enable_surf=False, step=jnp.asarray(step))
            return float(p["loss"]) - float(p0["loss"])

        base = 0.1 * ortv
        assert abs(ort_contrib(hp_nb, 0) - base) < 1e-6       # no boost
        assert abs(ort_contrib(hp, 0) - 3 * base) < 1e-6      # tie on
        assert abs(ort_contrib(hp, 625) - 2 * base) < 1e-6    # mid-fall
        assert abs(ort_contrib(hp, 900) - base) < 1e-6        # released
        # Flat tie: flat boost.
        hp_flat = dict(HP_PROD, **{"loss.ort_loss": 0.1,
                                   "loss.env_distill": 0.1,
                                   "loss.ort_tie_boost": 3.0})
        assert abs(ort_contrib(hp_flat, 0) - 3 * base) < 1e-6
        # Without the tie the boost is a no-op.
        hp_off = dict(HP_PROD, **{"loss.ort_loss": 0.1,
                                  "loss.ort_tie_boost": 3.0})
        assert abs(ort_contrib(hp_off, 0) - base) < 1e-6

    def test_schedule_misuse_rejected(self):
        """Misconfigured schedules fail loudly (round-4 advisor): a fall
        window without an end would anchor the fall at step 0, and a
        schedule without a traced step would silently apply the FLAT
        full weight (the anneal-off tie would never release)."""
        B = 4
        gt = jnp.ones((B, 3))
        outs = [level(jnp.ones((B, 3))),
                level(jnp.ones((B, 3)),
                      env_read=jnp.ones((B, 3)) * 2.0,
                      env_fine=jnp.ones((B, 3)) * 5.0)]
        mask = jnp.ones((B, 1))
        hp_lone_fall = dict(HP_PROD, **{"loss.env_distill": 0.1,
                                        "loss.env_distill_fall": 0.15})
        with pytest.raises(ValueError, match="env_distill_end"):
            pano_losses(outs, gt, mask, hp_lone_fall, enable_surf=False,
                        step=jnp.asarray(0))
        hp_sched = dict(HP_PROD, **{"loss.env_distill": 0.1,
                                    "loss.env_distill_end": 0.5,
                                    "loss.env_distill_fall": 0.15,
                                    "optimizer.max_steps": 1000})
        with pytest.raises(ValueError, match="step"):
            pano_losses(outs, gt, mask, hp_sched, enable_surf=False)


class TestVcLuma:
    def test_luma_tie_is_chroma_free(self):
        """loss.vc_luma ties only Rec.709 luma: two alt composites with
        equal luma but different chroma give identical vc, while the
        per-channel default distinguishes them."""
        B = 4
        gt = jnp.ones((B, 3))
        rgb = jnp.full((B, 3), 2.0)
        # Same Rec.709 luma (=4.0), different chroma.
        alt_a = jnp.tile(jnp.asarray([[4.0, 4.0, 4.0]]), (B, 1))
        alt_b = jnp.tile(jnp.asarray(
            [[1.0, 4.0 + 3.0 * 0.2126 / 0.7152, 4.0]]), (B, 1))
        hp = dict(HP_PROD, **{"loss.vc_luma": True})  # = shipped default
        hp_pc = dict(HP_PROD, **{"loss.vc_luma": False})

        def vc_of(alt, hp):
            outs = [level(rgb), level(rgb, ort_loss=None, rgb_alt=alt)]
            return float(pano_losses(outs, gt, jnp.ones((B, 1)), hp,
                                     enable_surf=False)["vc"])

        np.testing.assert_allclose(vc_of(alt_a, hp), vc_of(alt_b, hp),
                                   rtol=1e-6)
        assert abs(vc_of(alt_a, hp_pc) - vc_of(alt_b, hp_pc)) > 1e-4
        # Equal-luma alt vs rgb: luma tie is positive when lumas differ.
        assert vc_of(alt_a, hp) > 0


class TestChromIllumComp:
    """Illuminant-compensated chromaticity (loss.chrom_illum_comp)."""

    def _outs(self, gt, albedo, shading=None):
        B = gt.shape[0]
        return [level(gt), level(gt, normal=jnp.ones((B, 3)),
                                 albedo=albedo, surf_rgb=gt,
                                 shading=shading,
                                 ort_loss=jnp.asarray(0.0))]

    def test_default_off_is_parity(self):
        B = 6
        gt = jnp.abs(jnp.sin(jnp.arange(B * 3.0))).reshape(B, 3) + 0.1
        albedo = jnp.full((B, 3), 0.5)
        shading = jnp.full((B, 3), 2.0)
        mask = jnp.ones((B, 1))
        base = pano_losses(self._outs(gt, albedo, shading), gt, mask, HP,
                           enable_surf=True)
        hp_off = dict(HP, **{"loss.chrom_illum_comp": False})
        off = pano_losses(self._outs(gt, albedo, shading), gt, mask, hp_off,
                          enable_surf=True)
        np.testing.assert_array_equal(np.asarray(base["chrom"]),
                                      np.asarray(off["chrom"]))

    def test_compensates_colored_illuminant(self):
        """A neutral (gray) surface under a blue illuminant: the plain
        prior penalizes the correct gray albedo (the pixel is blue), the
        compensated prior does not."""
        B = 8
        illum = jnp.broadcast_to(jnp.asarray([0.5, 1.0, 2.0]), (B, 3))
        albedo_true = jnp.full((B, 3), 0.6)       # gray surface
        gt = albedo_true * illum                  # observed radiance
        mask = jnp.ones((B, 1))
        hp_ic = dict(HP, **{"loss.chrom_illum_comp": True})
        ic = pano_losses(self._outs(gt, albedo_true, illum), gt, mask,
                         hp_ic, enable_surf=True)
        plain = pano_losses(self._outs(gt, albedo_true, illum), gt, mask,
                            HP, enable_surf=True)
        assert float(ic["chrom"]) < 1e-10          # correct albedo: no pull
        assert float(plain["chrom"]) > 1e-3        # plain prior penalizes it

    def test_neutral_light_reduces_to_linear_gt_chroma(self):
        B = 5
        gt = jnp.abs(jnp.cos(jnp.arange(B * 3.0))).reshape(B, 3) + 0.2
        shading = jnp.full((B, 3), 1.7)            # neutral illuminant
        albedo = gt / shading
        mask = jnp.ones((B, 1))
        hp_ic = dict(HP, **{"loss.chrom_illum_comp": True})
        ic = pano_losses(self._outs(gt, albedo, shading), gt, mask, hp_ic,
                         enable_surf=True)
        assert float(ic["chrom"]) < 1e-10

    def test_falls_back_without_shading(self):
        """Microfacet BRDF exposes no separable irradiance: the flag must
        fall back to the plain prior instead of crashing."""
        B = 4
        gt = jnp.ones((B, 3))
        albedo = jnp.full((B, 3), 0.5)
        mask = jnp.ones((B, 1))
        hp_ic = dict(HP, **{"loss.chrom_illum_comp": True})
        ic = pano_losses(self._outs(gt, albedo, None), gt, mask, hp_ic,
                         enable_surf=True)
        plain = pano_losses(self._outs(gt, albedo, None), gt, mask, HP,
                            enable_surf=True)
        np.testing.assert_array_equal(np.asarray(ic["chrom"]),
                                      np.asarray(plain["chrom"]))

    def test_stop_gradient_on_illuminant(self):
        """The irradiance divisor is stop-grad: the chrom term's gradient
        w.r.t. shading must be zero."""
        import jax

        B = 4
        gt = jnp.ones((B, 3)) * 1.5
        albedo = jnp.full((B, 3), 0.4)
        mask = jnp.ones((B, 1))
        hp_ic = dict(HP, **{"loss.chrom_illum_comp": True})

        def chrom_of_shading(s):
            parts = pano_losses(self._outs(gt, albedo, s), gt, mask, hp_ic,
                                enable_surf=True)
            return parts["chrom"]

        g = jax.grad(chrom_of_shading)(jnp.full((B, 3), 2.0))
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_relative_floor_bounds_dark_channel_amplification(self):
        """A shading channel near zero (dark channel of a chromatic
        illuminant) must NOT turn GT noise into a dominant chroma target:
        the divisor floor is relative to the brightest channel (measured
        runaway on duo_cool seed 1 with an absolute floor)."""
        B = 6
        # Cool illuminant: R essentially unlit; GT's R is tiny noise.
        shading = jnp.broadcast_to(jnp.asarray([1e-4, 1.0, 2.0]), (B, 3))
        gt = jnp.broadcast_to(jnp.asarray([0.02, 0.6, 1.2]), (B, 3))
        mask = jnp.ones((B, 1))
        hp_ic = dict(HP, **{"loss.chrom_illum_comp": True})
        # The correct gray albedo for the lit channels; with the relative
        # floor the noisy R target stays small, so gray-ish albedo is
        # near-optimal. With an absolute 1e-3 floor the R target would be
        # 0.02/1e-3 = 20 -> a nearly pure-R normalized target.
        albedo = jnp.full((B, 3), 0.6)
        ic = pano_losses(self._outs(gt, albedo, shading), gt, mask, hp_ic,
                         enable_surf=True)
        # Target with relative floor: [0.02/0.2, 0.6, 0.6] -> unit norm has
        # tiny R; loss vs gray albedo stays moderate (< the pure-R case).
        assert float(ic["chrom"]) < 0.2
        # And the floor is configurable.
        hp_lo = dict(hp_ic, **{"loss.chrom_illum_floor": 1e-6})
        lo = pano_losses(self._outs(gt, albedo, shading), gt, mask, hp_lo,
                         enable_surf=True)
        assert float(lo["chrom"]) > float(ic["chrom"]) * 2


class TestChromGate:
    """Illuminant-chroma gate on the albedo prior (loss.chrom_gate)."""

    def _outs(self, gt, albedo, shading=None):
        B = gt.shape[0]
        return [level(gt), level(gt, normal=jnp.ones((B, 3)),
                                 albedo=albedo, surf_rgb=gt,
                                 shading=shading,
                                 ort_loss=jnp.asarray(0.0))]

    def test_default_off_is_parity(self):
        B = 6
        gt = jnp.abs(jnp.sin(jnp.arange(B * 3.0))).reshape(B, 3) + 0.1
        albedo = jnp.full((B, 3), 0.5)
        shading = jnp.full((B, 3), 2.0)
        mask = jnp.ones((B, 1))
        base = pano_losses(self._outs(gt, albedo, shading), gt, mask, HP,
                           enable_surf=True)
        hp_off = dict(HP, **{"loss.chrom_gate": False})
        off = pano_losses(self._outs(gt, albedo, shading), gt, mask,
                          hp_off, enable_surf=True)
        np.testing.assert_array_equal(np.asarray(base["chrom"]),
                                      np.asarray(off["chrom"]))

    def test_neutral_illuminant_keeps_prior(self):
        """Under exactly-white shading the gate is 1 everywhere and the
        gated prior equals the plain mean."""
        B = 5
        gt = jnp.abs(jnp.cos(jnp.arange(B * 3.0))).reshape(B, 3) + 0.2
        albedo = jnp.full((B, 3), 0.5)
        shading = jnp.full((B, 3), 1.7)
        mask = jnp.ones((B, 1))
        hp_g = dict(HP, **{"loss.chrom_gate": True})
        gated = pano_losses(self._outs(gt, albedo, shading), gt, mask,
                            hp_g, enable_surf=True)
        plain = pano_losses(self._outs(gt, albedo, shading), gt, mask, HP,
                            enable_surf=True)
        np.testing.assert_allclose(np.asarray(gated["chrom"]),
                                   np.asarray(plain["chrom"]), rtol=1e-6)

    def test_colored_illuminant_releases_prior(self):
        """A gray surface under a strongly blue illuminant: the plain
        prior penalizes the correct gray albedo; the gate suppresses that
        penalty by orders of magnitude."""
        B = 8
        illum = jnp.broadcast_to(jnp.asarray([0.2, 0.5, 3.0]), (B, 3))
        albedo_true = jnp.full((B, 3), 0.6)
        gt = albedo_true * illum
        mask = jnp.ones((B, 1))
        hp_g = dict(HP, **{"loss.chrom_gate": True})
        gated = pano_losses(self._outs(gt, albedo_true, illum), gt, mask,
                            hp_g, enable_surf=True)
        plain = pano_losses(self._outs(gt, albedo_true, illum), gt, mask,
                            HP, enable_surf=True)
        assert float(plain["chrom"]) > 1e-3
        assert float(gated["chrom"]) < float(plain["chrom"]) * 1e-2

    def test_mixed_pixels_weight_only_neutral_ones(self):
        """Half the batch neutrally lit (prior premise holds), half under
        a colored source with a WRONG albedo: the gate keeps the loss at
        ~the neutral half's value instead of averaging in the colored
        half's spurious error."""
        B = 4
        neutral = jnp.full((2, 3), 1.5)
        colored = jnp.broadcast_to(jnp.asarray([0.2, 0.4, 3.0]), (2, 3))
        shading = jnp.concatenate([neutral, colored])
        albedo = jnp.concatenate([
            jnp.full((2, 3), 0.5),                       # matches gt chroma
            jnp.full((2, 3), 0.5)])                      # gray under blue
        gt = jnp.concatenate([jnp.full((2, 3), 0.75),    # neutral * gray
                              0.5 * colored])            # blue pixels
        mask = jnp.ones((B, 1))
        hp_g = dict(HP, **{"loss.chrom_gate": True})
        gated = pano_losses(self._outs(gt, albedo, shading), gt, mask,
                            hp_g, enable_surf=True)
        plain = pano_losses(self._outs(gt, albedo, shading), gt, mask, HP,
                            enable_surf=True)
        # Neutral half is a perfect chroma match -> gated loss ~ 0; the
        # plain mean carries the colored half's spurious penalty.
        assert float(gated["chrom"]) < float(plain["chrom"]) * 1e-2

    def test_sigma_widens_the_gate(self):
        B = 4
        illum = jnp.broadcast_to(jnp.asarray([0.8, 1.0, 1.4]), (B, 3))
        albedo = jnp.full((B, 3), 0.5)
        gt = albedo * illum
        mask = jnp.ones((B, 1))
        hp_n = dict(HP, **{"loss.chrom_gate": True})
        hp_w = dict(hp_n, **{"loss.chrom_gate_sigma": 10.0})
        narrow = pano_losses(self._outs(gt, albedo, illum), gt, mask,
                             hp_n, enable_surf=True)
        wide = pano_losses(self._outs(gt, albedo, illum), gt, mask, hp_w,
                           enable_surf=True)
        plain = pano_losses(self._outs(gt, albedo, illum), gt, mask, HP,
                            enable_surf=True)
        # A huge sigma recovers the plain prior; the default gates down.
        np.testing.assert_allclose(np.asarray(wide["chrom"]),
                                   np.asarray(plain["chrom"]), rtol=1e-3)
        assert float(narrow["chrom"]) <= float(wide["chrom"]) + 1e-9

    def test_falls_back_without_shading(self):
        B = 4
        gt = jnp.ones((B, 3))
        albedo = jnp.full((B, 3), 0.5)
        mask = jnp.ones((B, 1))
        hp_g = dict(HP, **{"loss.chrom_gate": True})
        gated = pano_losses(self._outs(gt, albedo, None), gt, mask, hp_g,
                            enable_surf=True)
        plain = pano_losses(self._outs(gt, albedo, None), gt, mask, HP,
                            enable_surf=True)
        np.testing.assert_array_equal(np.asarray(gated["chrom"]),
                                      np.asarray(plain["chrom"]))

    def test_gate_is_stop_grad_through_shading(self):
        import jax

        B = 4
        gt = jnp.ones((B, 3)) * 1.5
        albedo = jnp.full((B, 3), 0.4)
        mask = jnp.ones((B, 1))
        hp_g = dict(HP, **{"loss.chrom_gate": True})

        def chrom_of_shading(s):
            parts = pano_losses(self._outs(gt, albedo, s), gt, mask, hp_g,
                                enable_surf=True)
            return parts["chrom"]

        g = jax.grad(chrom_of_shading)(jnp.full((B, 3), 2.0))
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    def test_composes_with_illum_comp(self):
        """Gate + compensated target: runs and weights the compensated
        residual (colored-pixel residuals are downweighted)."""
        B = 4
        illum = jnp.broadcast_to(jnp.asarray([0.3, 1.0, 2.5]), (B, 3))
        albedo = jnp.full((B, 3), 0.6)
        gt = albedo * illum
        mask = jnp.ones((B, 1))
        hp = dict(HP, **{"loss.chrom_gate": True,
                         "loss.chrom_illum_comp": True})
        out = pano_losses(self._outs(gt, albedo, illum), gt, mask, hp,
                          enable_surf=True)
        assert np.isfinite(float(out["chrom"]))


class TestScaleDistill:
    """Cross-scale distillation split: rgb tie (loss.scale_distill) vs the
    separate, measured-collapsing distance tie (loss.scale_distill_dist)."""

    def _outs(self, gt, rgb_scale=None, dist_scale=None):
        B = gt.shape[0]
        return [level(gt), level(gt, rgb_scale=rgb_scale,
                                 dist_scale=dist_scale)]

    def test_rgb_tie_only_by_default_key(self):
        """scale_distill alone must add ONLY the rgb term (the distance
        tie collapses geometry and lives behind its own key)."""
        B = 4
        gt = jnp.ones((B, 3))
        mask = jnp.ones((B, 1))
        rgb_scale = jnp.full((B, 3), 0.5)
        dist_scale = jnp.full((B,), 9.0)   # wildly wrong distance
        hp = dict(HP, **{"loss.scale_distill": 0.1})
        parts = pano_losses(self._outs(gt, rgb_scale, dist_scale), gt,
                            mask, hp, enable_surf=False)
        assert "scale_distill" in parts
        assert "scale_distill_dist" not in parts
        base = pano_losses(self._outs(gt), gt, mask, HP, enable_surf=False)
        expect = float(base["loss"]) + 0.1 * float(parts["scale_distill"])
        np.testing.assert_allclose(float(parts["loss"]), expect, rtol=1e-6)
        # The rgb tie is the log1p-space masked MSE of the two composites
        # (masked_mse normalizes by the mask count, so x3 over the mean).
        sd = 3 * float(jnp.mean((jnp.log1p(rgb_scale) - jnp.log1p(gt)) ** 2))
        np.testing.assert_allclose(float(parts["scale_distill"]), sd,
                                   rtol=1e-5)

    def test_distance_tie_behind_own_key(self):
        B = 4
        gt = jnp.ones((B, 3))
        mask = jnp.ones((B, 1))
        rgb_scale = jnp.full((B, 3), 1.0)
        dist_scale = jnp.full((B,), 3.0)   # level() sets distance = 1
        hp = dict(HP, **{"loss.scale_distill": 0.1,
                         "loss.scale_distill_dist": 0.2})
        parts = pano_losses(self._outs(gt, rgb_scale, dist_scale), gt,
                            mask, hp, enable_surf=False)
        assert "scale_distill_dist" in parts
        np.testing.assert_allclose(float(parts["scale_distill_dist"]),
                                   4.0, rtol=1e-6)   # (3-1)^2
        base = pano_losses(self._outs(gt), gt, mask, HP, enable_surf=False)
        expect = (float(base["loss"]) + 0.1 * float(parts["scale_distill"])
                  + 0.2 * 4.0)
        np.testing.assert_allclose(float(parts["loss"]), expect, rtol=1e-6)

    def test_dist_key_alone_still_computes(self):
        """scale_distill_dist > 0 with scale_distill == 0 must still run
        (the systems' use_sd gate covers either key)."""
        B = 4
        gt = jnp.ones((B, 3))
        mask = jnp.ones((B, 1))
        hp = dict(HP, **{"loss.scale_distill_dist": 0.2})
        parts = pano_losses(self._outs(gt, jnp.ones((B, 3)),
                                       jnp.full((B,), 2.0)), gt, mask, hp,
                            enable_surf=False)
        assert "scale_distill_dist" in parts
        np.testing.assert_allclose(float(parts["scale_distill_dist"]), 1.0,
                                   rtol=1e-6)

    def test_absent_products_no_term(self):
        B = 4
        gt = jnp.ones((B, 3))
        mask = jnp.ones((B, 1))
        hp = dict(HP, **{"loss.scale_distill": 0.1})
        parts = pano_losses(self._outs(gt), gt, mask, hp, enable_surf=False)
        assert "scale_distill" not in parts
