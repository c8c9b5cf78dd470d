"""Shared machinery for the coarse/fine mip-NeRF model family.

Holds the static hyperparameter bundle (a frozen dataclass — hashable, so
model methods close over it inside `jax.jit` without retracing churn), the
encode->MLP->activations "compute graph", and the density-gradient normal
estimator.

Normals: the reference differentiates density w.r.t. the sample mean with a
per-sample `vmap(jacrev(...))` (/root/reference/models/pano_mip_nerf.py:
298-306). Since each sample's density depends only on its own mean, the full
[B, N, 3] Jacobian equals the gradient of `sum(density)` — one `jax.vjp`
backward pass with a ones-cotangent on the density output, sharing the
forward evaluation with the rendering path. That's O(forward+backward)
instead of O(N) jacobian rows, and it remains differentiable for the
second-order gradients the orientation/surface losses need.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pano_nerf_tpu.models.mlp import NerfMLP
from pano_nerf_tpu.ops import mip

Array = jax.Array


class LevelOutput(NamedTuple):
    """Per-level render products. Optional fields are None when not computed.

    Mirrors the reference 9-tuple (/root/reference/models/pano_mip_nerf.py:361)
    plus `acc`.
    """
    rgb: Array                       # [B, 3] composited HDR radiance
    distance: Array                  # [B] expected termination distance
    acc: Array                       # [B] opacity
    ort_loss: Optional[Array] = None  # scalar orientation loss
    normal: Optional[Array] = None    # [B, 3] expected surface normal
    albedo: Optional[Array] = None    # [B, 3] expected albedo
    roughness: Optional[Array] = None  # [B] expected roughness
    surf_rgb: Optional[Array] = None  # [B, 3] surface-rendered HDR radiance
    diffuse: Optional[Array] = None   # [B, 3] diffuse term
    shading: Optional[Array] = None   # [B, 3] irradiance (shading) term
    dist_loss: Optional[Array] = None  # scalar mip-NeRF-360 distortion loss
    rgb_alt: Optional[Array] = None   # [B, 3] same samples, random viewdir
    #   (view-consistency supervision, round-3 HDR attack — see
    #   engine/losses.py::pano_losses view_consistency term)
    emission: Optional[Array] = None  # [B, 3] composited self-emission
    #   (emissive-head decomposition, round-3 HDR attack — see
    #   BaseNeRF.emissive_head)
    rgb_scale: Optional[Array] = None  # [B, 3] primary ray re-rendered at
    dist_scale: Optional[Array] = None  # [B] ... the secondary-march IPE
    #   scale (num_env_samples uniform Gaussians): cross-scale
    #   self-distillation targets (engine/losses.py scale_distill term) —
    #   anchors the blurred-scale field the irradiance queries read to the
    #   primary-supervised fine-scale field (round-3 env-scale probe).
    env_read: Optional[Array] = None   # [B, 3] secondary read along ONE
    env_fine: Optional[Array] = None   # [B, 3] random direction + its
    #   fine-march target (stop-grad): stochastic per-direction
    #   distillation of the secondary scale (loss.env_distill — round-3
    #   occlusion study, BaseNeRF.env_distill_samples).
    env_read_acc: Optional[Array] = None  # [B] blurred-march opacity along
    env_fine_acc: Optional[Array] = None  # [B] the SAME direction + its
    #   fine-march target (stop-grad): the transmittance half of the
    #   per-direction distillation (loss.env_distill_acc — round-5
    #   occlusion attack #13: the radiance tie alone leaves the re-formed
    #   wall fog in the TRANSMITTANCE, 0.50 vs GT 0.17 post-release).
    env_pre_illum: Optional[Array] = None  # [B, D, 3] the secondary read
    illum_chroma: Optional[Array] = None   # [B, D, 3] BEFORE the field's
    #   re-tint + the field's chroma simplex at the same (point, dir)
    #   pairs (loss.illum_distill — round-5 duo attack #8b: the probe
    #   measured the FIELD learning each source's correct spectrum from
    #   receiver consensus while the radiance field stays collapsed;
    #   this pair lets the loss pull the radiance field's secondary
    #   chroma toward the stop-grad field).


@dataclasses.dataclass(frozen=True)
class BaseNeRF:
    """Static config + functional forward for a 2-level mip-NeRF.

    Field semantics follow the reference ctor
    (/root/reference/models/pano_mip_nerf.py:117-195). `compute_dtype`
    selects the MLP matmul precision (bf16 by default on TPU).
    """
    num_samples: int = 64
    # Coarse-level sample count override (0 = num_samples, the reference's
    # symmetric default). The coarse level only guides the fine resampler's
    # CDF and carries a 0.1-weight loss, so it tolerates a shorter march
    # than the fine level that carries the metrics. NOTE: the round-3
    # FLOP-diet frontier (NOTES.md) was measured with JOINT cuts (shrink
    # num_samples itself — both levels); this coarse-only knob's quality
    # is not gated by those runs.
    num_coarse_samples: int = 0
    num_levels: int = 2
    resample_padding: float = 0.01
    stop_resample_grad: bool = True
    use_viewdirs: bool = True
    disparity: bool = False
    ray_shape: str = "cone"
    min_deg_point: int = 0
    max_deg_point: int = 16
    deg_view: int = 4
    density_noise: float = 0.0
    density_bias: float = -1.0
    rgb_padding: float = 0.0
    disable_integration: bool = False
    append_identity: bool = True
    mlp_net_depth: int = 8
    mlp_net_width: int = 256
    mlp_net_depth_condition: int = 1
    mlp_net_width_condition: int = 128
    mlp_skip_index: int = 4
    mlp_num_rgb_channels: int = 3
    mlp_num_density_channels: int = 1
    num_env_samples: int = 10
    # Two-level secondary (irradiance) march — beyond the reference's
    # single uniform env march (/root/reference/models/mip.py:154-194).
    # The uniform S-sample march over [near, far] produces HUGE per-sample
    # Gaussians (spacing (far-near)/S ~ 2 units), and the radiance field
    # at that IPE scale is supervised ONLY by the irradiance loss — the
    # optimizer freely paints phantom radiance there, decoupled from the
    # fine-scale field the primary views (and the HDR metric) see
    # (measured on a trained checkpoint: the blurred-scale march puts ~0
    # weight at the true emitter and composites bright mass where the
    # fine-scale field is empty — NOTES.md round-3 env-scale probe).
    # With env_resample, the blurred march only PLACES samples (blurpool
    # CDF, stop-gradient — exactly the primary coarse->fine scheme) and a
    # second march of num_env_fine_samples tight Gaussians carries the
    # radiance, at the scale the primary views actually supervise.
    env_resample: bool = False
    num_env_fine_samples: int = 5
    # Tight-scale radiance re-read on the secondary (irradiance) march —
    # the round-3 attribution probe's blur-dilution fix. The probe showed
    # the blurred march PLACES weight correctly (83% reaches the true
    # source depth) but the radiance it reads there is diluted ~20x: the
    # env-scale IPE Gaussian averages a small emitter with its
    # surrounding wall, smearing per-channel evidence across directions
    # (NOTES.md round-3 attribution probe). With env_tight_rgb = s > 0,
    # occlusion/weights keep the robust blurred march, but the composited
    # radiance is re-read at the SAME sample means with covariances
    # scaled by s — s ~ 0.01 matches the fine primary scale, coupling the
    # color evidence to the field the primary views actually supervise
    # (per-channel anchors below the knee) without the CDF feedback loop
    # that broke env_resample. 0 disables (bitwise reference parity).
    env_tight_rgb: float = 0.0
    # Hybrid combine for the tight re-read (requires env_tight_rgb > 0).
    # The 44k scale ladder measured a clean decomposition: the blurred
    # read carries the right INTENSITY but a knee-flattened/warm-flipped
    # spectrum, while the tight read carries the right CHANNEL ORDER but
    # under-reads small emitters (tight Gaussians miss the sub-cell
    # source) and costs ~3 dB LDR when it carries the full radiance.
    # With env_tight_chroma, the irradiance integral keeps the blurred
    # read's luma and takes only the CHROMA from the tight read:
    #   env_rgb = luma(blur) * (tight + c) / (luma(tight) + c),
    # c = env_tight_chroma_eps, so a tight-scale miss (tight -> 0)
    # degrades to the neutral blurred read instead of amplifying noise.
    env_tight_chroma: bool = False
    env_tight_chroma_eps: float = 0.01
    # Occlusion fix (requires env_tight_rgb > 0, full-S): composite the
    # secondary march ENTIRELY at the tight scale — radiance AND weights
    # from the tight re-read, sample placement unchanged (the blurred
    # march). The shadow-scene probe measured the blurred-scale
    # composite as a near-uniform fog along every secondary direction
    # (pred lit/shadow irradiance contrast 1.10 vs GT 4.91): at the
    # blurred IPE scale nothing pins per-direction structure, so neither
    # an occluder's darkness nor the emitter's brightness survives to
    # the integral. The tight-scale density IS primary-supervised — a
    # real occluder terminates the tight march — and unlike env_resample
    # there is no CDF feedback loop (placement stays the blurred
    # march's). Zero extra MLP rows when the tight re-read is already
    # paid for; subsumes the chroma combine (the tight composite carries
    # tight chroma by construction), so env_tight_chroma must stay off.
    env_tight_weights: bool = False
    # Stochastic per-direction distillation of the secondary scale
    # (round-3 occlusion study): every training step, ONE random env
    # direction per surface point is re-marched with this many finer
    # Gaussians and the secondary read along it is tied to that
    # stop-grad composite (loss.env_distill, log1p space). Attacks the
    # measured per-direction FOG directly — the irradiance loss only
    # constrains the D-direction sum, so per-direction structure
    # (occluder darkness, emitter brightness) is otherwise
    # unconstrained. 0 disables (bitwise parity).
    env_distill_samples: int = 0
    # Cost reduction for the tight re-read (requires env_tight_chroma):
    # evaluate the tight-scale radiance ONLY at the argmax-weight sample
    # of the blurred march (the dominant surface hit) instead of at all
    # S samples — 1/S the extra MLP rows. The luma-ratio combine already
    # strips magnitude from the tight read, so the chroma of the
    # dominant hit is the whole signal; a weight-averaged chroma only
    # differs when one secondary ray straddles two differently-colored
    # surfaces inside its march. Static shapes (argmax + gather).
    env_tight_top1: bool = False
    # Generalized cost dial between env_tight_top1 (K=1-like) and the
    # full-S tight re-read: evaluate the tight-scale radiance at the K
    # highest-weight samples of the blurred march and combine them with
    # their (raw) march weights — K/S the extra MLP rows. K = S
    # reproduces the full-S read exactly; small K recovers most of the
    # chroma signal (the weights concentrate at the dominant hit) while
    # keeping the re-read cheap. 0 = off (full-S or top1 as configured).
    # Requires env_tight_chroma; mutually exclusive with env_tight_top1.
    # Static shapes (lax.top_k + gather).
    env_tight_topk: int = 0
    compute_dtype: Any = jnp.bfloat16
    # Force the fused Pallas MLP kernels on for ALL subgraphs (including
    # training). Default off for training: XLA compiles the train step to
    # its bandwidth roofline at the production batch and the kernels lose
    # ~11% there (NOTES.md fused-kernel decision); they win at batch >=
    # 1024 and at eval — eval enables them automatically via
    # use_fused_kernel_eval below. Auto-disabled off-TPU at call time.
    use_fused_kernel: bool = False
    # Auto-enable the fused kernels for first-order (eval/render) calls
    # even when use_fused_kernel is off for training: with the explicit
    # normals chain the whole eval pass rides v2/v3 (in-kernel IPE deletes
    # the f32->bf16 encoding traffic XLA materializes), measured +11%
    # eval throughput (199.9k vs 180.5k rays/s at chunk 4096; NOTES.md).
    # Training keeps XLA (it wins there — NOTES.md fused-kernel decision).
    use_fused_kernel_eval: bool = True
    # Which subgraphs ride the kernels when use_fused_kernel is on:
    # "all" | "fine" (v3 normals kernel only) | "aux" (coarse+env v1/v2 only).
    fused_scope: str = "all"
    # Rematerialize the encode->MLP->activations graph in the backward pass
    # (jax.checkpoint): trades ~1 extra forward for not storing per-layer
    # activations, which un-spills large ray batches.
    remat: bool = False
    # Normals implementation for the training-time fine level:
    #  "explicit" — d(density)/d(means) built from the forward ReLU masks as
    #    ordinary first-order code (models/normals.py); the whole train step
    #    is then first-order and ~20% of step time in grad-of-grad passes
    #    disappears (NOTES.md round-1 profile).
    #  "vjp" — the round-1 path: jax.vjp over the compute graph, whose
    #    differentiation generates second-order passes.
    normals_impl: str = "explicit"
    # Point-normals mode (training-time fine level, explicit impl only):
    # evaluate the density-gradient chain ONCE per ray at the expected
    # Gaussian (weights-averaged means/covs) instead of at every sample,
    # then use -grad(sigma)(E[x]) as the surface normal. The per-sample
    # chain costs ~8 trunk-width dots forward plus their backward — ~40%
    # of the train step at batch 512 — while its output is only ever
    # consumed as the per-ray weighted average (reference
    # /root/reference/models/pano_mip_nerf.py:296-313); the point query
    # is the same computation at 1/num_samples the rows. Semantics change
    # (-grad at E[x] vs E[-grad]); quality gated by the 44k study
    # (NOTES.md round-3) before any default flip.
    point_normals: bool = False
    # Randomly rotate the env-direction set per ray per step (training only).
    # Haar rotation of the rigid lattice is the best-variance UNBIASED
    # estimator (the reference's fixed set is biased for emitters smaller
    # than 4pi/D) — but the 44k study measured that its per-step noise
    # still destabilizes HDR recovery even with the stabilizer losses,
    # while the deterministic fixed set + stabilizers is both stable and
    # best-LDR (NOTES.md HDR study). Default off = reference estimator.
    env_rotation: bool = False
    # Importance-sample the env directions (training only): a cheap probe
    # pass (env_probe_dirs directions x env_probe_samples samples,
    # stop-gradient) estimates incident radiance per cell, then the
    # num_ray_samples main directions are drawn from a defensive mixture
    # concentrated on bright cells, with exact 1/(D*pdf) Monte-Carlo
    # weights (ops/mip.py::importance_env_directions). Unbiased, but the
    # 44k study measured NO variance or HDR benefit over plain rotation
    # for emitters smaller than a proposal cell, at +25% step cost
    # (NOTES.md HDR study) — default off; the HDR fix is the stabilizer
    # losses (engine/losses.py: distortion + saturation knee prior).
    env_importance: bool = False
    env_probe_dirs: int = 16
    env_probe_samples: int = 4
    # Use the whole-level render kernel (kernels/fused_render.py: MLP +
    # in-kernel compositing, per-ray boundary) for first-order calls when
    # the kernels are enabled; False falls back to the per-subgraph
    # v1/v2/v3 kernels with XLA compositing.
    use_render_kernel: bool = True
    # Training megakernel path (round 3): route the coarse level and the
    # secondary env radiance queries through the custom_vjp whole-level
    # train render (kernels/fused_render_train.py — fwd and bwd are each
    # one pallas call with per-RAY boundaries; XLA keeps the per-ray loss
    # math). Independent of use_fused_kernel.
    use_train_render_kernel: bool = False
    # Spill bf16 trunk activations for the train-kernel backward instead of
    # recomputing them in VMEM (bytes vs FLOPs tradeoff; measured on
    # hardware, NOTES.md round-3).
    train_kernel_save_acts: bool = False
    # Which training subgraphs ride fused_render_train: "all" | "coarse" |
    # "env" (A/B isolation knob; "all" in production).
    train_kernel_scope: str = "all"
    # Target rows per train-kernel block (block = RPB rays x S samples).
    train_kernel_rows: int = 512
    # Batch-aware training-kernel policy: training calls (first_order=False)
    # with at least this many rays dispatch through the fused fine-level
    # kernel automatically. Measured crossover (NOTES.md fused-kernel
    # decision): XLA wins at batch 512 (fusion windows hold), the v3 kernel
    # wins at >= 1024 (75.4k vs 72.9k rays/s; 66.5k vs 63.2k at 2048).
    # 0 disables the auto-policy. Batches below the threshold trace exactly
    # as before (static shape check, resolved at trace time).
    fused_batch_threshold: int = 1024
    # Explicit env-direction sampling mode; "auto" resolves from the legacy
    # booleans (importance > rotated > fixed). "stratified" jitters each
    # direction within its own cell with overlap-exact weights
    # (ops/mip.py::stratified_env_directions) — unbiased like "rotated" but
    # with per-stratum variance only.
    env_sampling: str = "auto"
    # Emissive-surface decomposition (PanoMipNeRF only, round-3 HDR
    # attack #2): grow the density head 5 -> 8 channels with a
    # view-INDEPENDENT self-emission RGB (softplus, HDR-unbounded) added
    # to the radiance at every sample. Two structural effects: (1) the
    # surface loss can explain emitter pixels as emission instead of
    # failing to explain them as reflection (the reference's surf_rgb is
    # reflection-only, so saturated source pixels push albedo/irradiance
    # up spuriously — both formulations share this); (2) secondary
    # (irradiance) rays that hit the source see a radiance channel that
    # CANNOT decouple across view directions, so the irradiance evidence
    # supervises source intensity directly — an architectural version of
    # the view-consistency tie. loss.emission_sparsity keeps emission at
    # zero except where evidence demands it. Default off = strict
    # reference parity (5-channel head, bitwise-identical params).
    # Requires normals_impl="explicit"; Pallas kernels fall back to XLA
    # (the kernels are specialized to the 5-channel head).
    emissive_head: bool = False
    # Softplus bias of the emission activation: a fresh head emits
    # softplus(bias) everywhere (-3 -> 0.049, -6 -> 0.0025). The floor is
    # visible through the tonemap on dark pixels until the sparsity prior
    # works it off, so scenes with large dark regions may prefer a more
    # negative bias.
    emission_bias: float = -3.0
    # View-independent chroma factorization (PanoMipNeRF only, round-3
    # duo attack #4): rgb(x, d) = 3 * softplus(mean(raw_rgb)) *
    # softmax(raw_chroma), with raw_chroma 3 extra channels on the
    # DENSITY head (trunk features only — no view conditioning). The
    # attribution probe isolated the two-source chroma failure to the
    # view-dependent head answering per-source spectra along the
    # supervised primary directions but collapsing to ONE global
    # illuminant chroma along the unsupervised secondary directions the
    # irradiance integral reads; both loss-side ties (symmetric and
    # stop-grad vc_chroma) measured NEGATIVE because they feed the
    # dominant spectrum back through the shared weights. This knob makes
    # the collapse impossible by construction: a point's spectrum is ONE
    # softmax vector supervised by every primary ray that sees it, and
    # every secondary read consumes that same vector. Exact for the
    # Lambertian emitters the formulation targets (spectrum is
    # view-independent; intensity keeps full view dependence). Default
    # off = strict reference parity; Pallas kernels fall back to XLA.
    chroma_head: bool = False
    # Spatially-varying illuminant field (PanoMipNeRF only, round-5 duo
    # attack #8). The round-4 duo_swap closure measured the remaining
    # two-source failure mechanism exactly: along SECONDARY (primary-
    # unsupervised) directions the radiance field's chroma collapses to
    # the scene's mean reflected chroma, so both emitters inherit ONE
    # spectrum and opposite-chroma recovery is impossible — per-point
    # spectra cannot survive where no primary ray anchors them
    # (NOTES.md duo_swap position control; every tie- and head-shaped
    # attack measured negative). This knob adds the named missing
    # STRUCTURE: a tiny fp32 MLP on the (stop-grad) surface point emits
    # per-channel coefficients of a low-order real-SH directional basis;
    # evaluated at the D env directions and softmaxed over channels it
    # yields a per-(point, direction) chroma that multiplicatively
    # re-tints the secondary read under a luma-preserving combine (the
    # blurred luma the irradiance loss calibrates is untouched; zero-init
    # output layer = identity modulation = exact parity forward). The
    # field is supervised ONLY through the irradiance integral: every
    # surface point that sees a source from its own direction pushes
    # gradient into the shared smooth field, so the consensus of
    # receivers — not the collapsed radiance chroma — determines each
    # source's spectrum. Default off; kernels unaffected (the modulation
    # runs outside every Pallas kernel).
    illum_field: bool = False
    # Maximum SH degree of the directional basis (0..3; (L+1)^2 bases).
    # Low order IS the regularizer: the field can separate a ceiling
    # source from a wall source but cannot paint per-direction noise.
    illum_sh_deg: int = 2
    # Width of the 2-hidden-layer fp32 illuminant MLP.
    illum_net_width: int = 64
    # Positional-encoding degree of the surface-point input (the
    # illuminant mix varies smoothly in space; low degree keeps it so).
    illum_posenc_deg: int = 4
    # Eval-time FLOP cut (first-order calls only; 0 = same as training).
    # The fine level is the one that carries the metrics, and the coarse
    # CDF already concentrates its resampled positions where density
    # lives (/root/reference/models/mip.py:304-352) — so eval can march
    # fewer coarse samples (CDF quality degrades gracefully) and resample
    # fewer fine samples at near-identical image quality. Quality deltas
    # measured per scene (scripts/bench_eval.py --eval_samples).
    eval_coarse_samples: int = 0
    eval_fine_samples: int = 0
    # Samples per secondary (irradiance) env ray at eval. The env subgraph
    # is ~44% of eval MLP rows (10 dirs x 10 samples per pixel) and feeds
    # ONLY the surface products (surf_rgb/shading) — the volumetric
    # metrics are bitwise unaffected by this knob.
    eval_env_samples: int = 0

    def __post_init__(self):
        if self.env_tight_chroma and self.env_tight_rgb <= 0:
            raise ValueError(
                "env_tight_chroma combines the blurred and tight-scale "
                "secondary reads, so it requires env_tight_rgb > 0 "
                "(the tight covariance scale).")
        if self.env_tight_top1 and not self.env_tight_chroma:
            raise ValueError(
                "env_tight_top1 reads only the dominant hit's CHROMA, so "
                "it requires env_tight_chroma (the luma-ratio combine "
                "strips the magnitude the single sample cannot carry).")
        if self.env_tight_topk > 0:
            if not self.env_tight_chroma:
                raise ValueError(
                    "env_tight_topk reads only the top-K hits' CHROMA, so "
                    "it requires env_tight_chroma.")
            if self.env_tight_top1:
                raise ValueError(
                    "env_tight_topk and env_tight_top1 are mutually "
                    "exclusive (top1 is the K=1 dominant-hit special "
                    "case).")
        if self.env_tight_weights:
            if self.env_tight_rgb <= 0:
                raise ValueError(
                    "env_tight_weights composites the tight re-read, so "
                    "it requires env_tight_rgb > 0.")
            if self.env_tight_chroma or self.env_tight_top1 \
                    or self.env_tight_topk > 0:
                raise ValueError(
                    "env_tight_weights needs the full-S tight re-read "
                    "and already carries tight chroma by construction — "
                    "leave env_tight_chroma/top1/topk off.")
            if self.env_resample:
                raise ValueError(
                    "env_tight_weights and env_resample are alternative "
                    "second-scale march formulations — pick one.")

    def _auto_fused_train(self, batch: int):
        """Batch-aware training-kernel policy (NOTES.md crossover): returns
        a fused copy of self when a training call at this batch size should
        ride the v3 fine-level kernel, else None. Static — resolved at
        trace time from the (static) ray count."""
        if (self.use_fused_kernel or self.fused_batch_threshold <= 0
                or batch < self.fused_batch_threshold
                # the v3 kernel computes per-sample normals — point mode
                # must keep the explicit path (its own chain is 1/S the
                # kernel's work anyway)
                or self.point_normals):
            return None
        cand = dataclasses.replace(self, use_fused_kernel=True,
                                   fused_scope="fine")
        return cand if cand._fused_ok("fine") else None

    def _env_mode(self) -> str:
        if self.env_sampling != "auto":
            return self.env_sampling
        if self.env_importance:
            return "importance"
        return "rotated" if self.env_rotation else "fixed"

    # ----- construction -------------------------------------------------

    @classmethod
    def from_hparams(cls, hparams: dict, **overrides):
        """Build from a flat dot-key config (reference systems/base_system.py:26-55)."""
        dtype = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
                 "f32": jnp.float32, "float32": jnp.float32}[
                     str(hparams.get("train.precision", "bf16"))]
        kw = dict(
            num_samples=hparams["nerf.num_samples"],
            num_levels=hparams["nerf.num_levels"],
            resample_padding=hparams["nerf.resample_padding"],
            stop_resample_grad=bool(hparams["nerf.stop_resample_grad"]),
            use_viewdirs=bool(hparams["nerf.use_viewdirs"]),
            disparity=bool(hparams["nerf.disparity"]),
            ray_shape=hparams["nerf.ray_shape"],
            min_deg_point=hparams["nerf.min_deg_point"],
            max_deg_point=hparams["nerf.max_deg_point"],
            deg_view=hparams["nerf.deg_view"],
            density_noise=hparams["nerf.density_noise"],
            density_bias=hparams["nerf.density_bias"],
            rgb_padding=hparams["nerf.rgb_padding"],
            disable_integration=bool(hparams["nerf.disable_integration"]),
            # 'Ture' (config typo preserved from the reference) is truthy.
            append_identity=bool(hparams["nerf.append_identity"]),
            mlp_net_depth=hparams["nerf.mlp.net_depth"],
            mlp_net_width=hparams["nerf.mlp.net_width"],
            mlp_net_depth_condition=hparams["nerf.mlp.net_depth_condition"],
            mlp_net_width_condition=hparams["nerf.mlp.net_width_condition"],
            mlp_skip_index=hparams["nerf.mlp.skip_index"],
            mlp_num_rgb_channels=hparams["nerf.mlp.num_rgb_channels"],
            num_env_samples=hparams["nerf.num_env_samples"],
            env_resample=bool(hparams.get("nerf.env_resample", False)),
            num_env_fine_samples=int(
                hparams.get("nerf.num_env_fine_samples", 5)),
            env_tight_rgb=float(hparams.get("nerf.env_tight_rgb", 0.0)),
            env_tight_chroma=bool(hparams.get("nerf.env_tight_chroma",
                                              False)),
            env_tight_chroma_eps=float(
                hparams.get("nerf.env_tight_chroma_eps", 0.01)),
            env_tight_top1=bool(hparams.get("nerf.env_tight_top1", False)),
            env_tight_topk=int(hparams.get("nerf.env_tight_topk", 0)),
            env_tight_weights=bool(
                hparams.get("nerf.env_tight_weights", False)),
            env_distill_samples=int(
                hparams.get("nerf.env_distill_samples", 0)),
            num_coarse_samples=int(
                hparams.get("nerf.num_coarse_samples", 0)),
            compute_dtype=dtype,
            env_rotation=bool(hparams.get("nerf.env_rotation", False)),
            env_importance=bool(hparams.get("nerf.env_importance", False)),
            env_probe_dirs=int(hparams.get("nerf.env_probe_dirs", 16)),
            env_probe_samples=int(hparams.get("nerf.env_probe_samples", 4)),
            env_sampling=str(hparams.get("nerf.env_sampling", "auto")),
            use_fused_kernel_eval=bool(
                hparams.get("nerf.use_fused_kernel_eval", True)),
            fused_batch_threshold=int(
                hparams.get("nerf.fused_batch_threshold", 1024)),
            use_train_render_kernel=bool(
                hparams.get("nerf.use_train_render_kernel", False)),
            train_kernel_save_acts=bool(
                hparams.get("nerf.train_kernel_save_acts", False)),
            eval_coarse_samples=int(hparams.get("val.coarse_samples", 0)),
            eval_fine_samples=int(hparams.get("val.fine_samples", 0)),
            eval_env_samples=int(hparams.get("val.env_samples", 0)),
            point_normals=bool(hparams.get("nerf.point_normals", False)),
            emissive_head=bool(hparams.get("nerf.emissive_head", False)),
            emission_bias=float(hparams.get("nerf.emission_bias", -3.0)),
            chroma_head=bool(hparams.get("nerf.chroma_head", False)),
            illum_field=bool(hparams.get("nerf.illum_field", False)),
            illum_sh_deg=int(hparams.get("nerf.illum_sh_deg", 2)),
            illum_net_width=int(hparams.get("nerf.illum_net_width", 64)),
            illum_posenc_deg=int(hparams.get("nerf.illum_posenc_deg", 4)),
        )
        kw.update(overrides)
        return cls(**kw)

    @property
    def mlp(self) -> NerfMLP:
        return NerfMLP(
            net_depth=self.mlp_net_depth,
            net_width=self.mlp_net_width,
            net_depth_condition=self.mlp_net_depth_condition,
            net_width_condition=self.mlp_net_width_condition,
            skip_index=self.mlp_skip_index,
            num_rgb_channels=self.mlp_num_rgb_channels,
            num_density_channels=self.mlp_num_density_channels,
            dtype=self.compute_dtype,
        )

    @property
    def xyz_dim(self) -> int:
        return (self.max_deg_point - self.min_deg_point) * 3 * 2

    @property
    def view_dim(self) -> int:
        d = self.deg_view * 3 * 2
        return d + 3 if self.append_identity else d

    def init(self, key: jax.Array):
        """Initialize MLP parameters (fp32); plus the illuminant-field
        subtree under params['params']['illum'] when `illum_field`."""
        x = jnp.zeros((1, 2, self.xyz_dim), jnp.float32)
        v = jnp.zeros((1, 1, self.view_dim), jnp.float32)
        params = self.mlp.init(key, x, v if self.use_viewdirs else None)
        if self.illum_field:
            k0, k1 = jax.random.split(jax.random.fold_in(key, 0x111))
            w = self.illum_net_width
            n_sh = (self.illum_sh_deg + 1) ** 2
            in_dim = self.illum_posenc_deg * 3 * 2 + 3
            xavier = jax.nn.initializers.xavier_uniform()
            params["params"]["illum"] = {
                "w0": xavier(k0, (in_dim, w), jnp.float32),
                "b0": jnp.zeros((w,), jnp.float32),
                "w1": xavier(k1, (w, w), jnp.float32),
                "b1": jnp.zeros((w,), jnp.float32),
                # Zero-init output: softmax of zeros = uniform chroma =
                # identity modulation — the field starts exactly neutral.
                "w_out": jnp.zeros((w, 3 * n_sh), jnp.float32),
                "b_out": jnp.zeros((3 * n_sh,), jnp.float32),
            }
        return params

    def _illum_chroma(self, params, surf_origins: Array, dirs: Array
                      ) -> Array:
        """Illuminant-field chroma simplex at (surface point, direction).

        surf_origins: [B, 3]; dirs: [B, D, 3] unit env directions.
        Returns [B, D, 3] softmax chroma (rows sum to 1; uniform at the
        zero-init). fp32 throughout — the field is tiny (~2 small
        matmuls per surface point) and chroma is precision-sensitive.
        The query point is a stop-gradient: the field reads geometry,
        it must not steer it.
        """
        from pano_nerf_tpu.utils.spherical import sh_basis
        p = params["params"]["illum"]
        x = jax.lax.stop_gradient(surf_origins).astype(jnp.float32)
        enc = mip.pos_enc(x, 0, self.illum_posenc_deg, True)
        h = jax.nn.relu(enc @ p["w0"] + p["b0"])
        h = jax.nn.relu(h @ p["w1"] + p["b1"])
        n_sh = (self.illum_sh_deg + 1) ** 2
        coeffs = (h @ p["w_out"] + p["b_out"]).reshape(
            x.shape[:-1] + (3, n_sh))                       # [B, 3, K]
        basis = sh_basis(dirs.astype(jnp.float32),
                         self.illum_sh_deg)                 # [B, D, K]
        raw = jnp.einsum("...ck,...dk->...dc", coeffs, basis)
        return jax.nn.softmax(raw, axis=-1)

    # ----- encode + MLP + activations ------------------------------------

    def _kernel_topology_ok(self) -> bool:
        """TPU backend + the standard topology every Pallas kernel in
        kernels/ is specialized to (8-deep skip-4 trunk, bf16 matmuls)."""
        import os
        if os.environ.get("PANO_NERF_PALLAS_INTERPRET", "0") != "1":
            try:
                if jax.default_backend() not in ("tpu", "axon"):
                    return False
            except RuntimeError:
                return False
        return (self.use_viewdirs and self.mlp_net_depth == 8
                and self.mlp_skip_index == 4
                and self.mlp_net_depth_condition == 1
                and self.compute_dtype == jnp.bfloat16
                # every kernel is specialized to the 5-channel head and
                # the per-channel softplus radiance activation
                and not self.emissive_head
                and not self.chroma_head)

    def _fused_ok(self, scope: str = "aux") -> bool:
        """Fused kernel is available: TPU backend + standard topology.

        `scope` names the requesting subgraph ("fine" or "aux") and is
        matched against the `fused_scope` config.
        """
        if not self.use_fused_kernel:
            return False
        if self.fused_scope != "all" and self.fused_scope != scope:
            return False
        return self._kernel_topology_ok()

    def _raw_outputs(self, params, means: Array, covs: Array, viewdirs: Array,
                     fused: bool = False) -> Tuple[Array, Array]:
        """IPE-encode samples, PE-encode viewdirs, run the MLP.

        means/covs: [..., N, 3]; viewdirs: [..., 3] (no sample dim).
        Returns raw_rgb [..., N, 3], raw_density [..., N, C] (fp32).

        `fused=True` routes through the Pallas fused-MLP kernel
        (pano_nerf_tpu/kernels/fused_mlp.py). Only valid on subgraphs that
        are differentiated at most once — custom_vjp is not
        twice-differentiable.
        """
        if self.disable_integration:
            covs = jnp.zeros_like(covs)
        if fused and self._fused_ok():
            # v2 kernel: IPE computed in-kernel from raw Gaussian moments.
            from pano_nerf_tpu.kernels.fused_mlp_ipe import fused_mlp_ipe_apply
            viewdirs_enc = mip.pos_enc(
                viewdirs, 0, self.deg_view,
                self.append_identity)[..., None, :]
            return fused_mlp_ipe_apply(
                params, means, covs, viewdirs_enc,
                self.mlp_num_density_channels, self.min_deg_point,
                self.max_deg_point)
        # Cast encodings to the compute dtype at the producer: the cast then
        # fuses into the IPE elementwise graph and the fp32 feature tensor
        # (the largest activation in the model) never reaches HBM. The MLP
        # would cast anyway; values are identical.
        samples_enc = mip.integrated_pos_enc(
            means, covs, self.min_deg_point,
            self.max_deg_point).astype(self.compute_dtype)
        if not self.use_viewdirs:
            return self.mlp.apply(params, samples_enc)
        viewdirs_enc = mip.pos_enc(
            viewdirs, 0, self.deg_view,
            self.append_identity)[..., None, :].astype(self.compute_dtype)
        return self.mlp.apply(params, samples_enc, viewdirs_enc)

    def _density_noise(self, raw_density_1ch: Array,
                       noise_key: Optional[jax.Array], randomized: bool
                       ) -> Array:
        if randomized and self.density_noise > 0 and noise_key is not None:
            raw_density_1ch = raw_density_1ch + self.density_noise * jax.random.normal(
                noise_key, raw_density_1ch.shape, raw_density_1ch.dtype)
        return raw_density_1ch

    def _rgb_from_raw(self, raw_rgb: Array,
                      chroma: Optional[Array] = None) -> Array:
        """Radiance activation incl. the reference rgb_padding affine.

        chroma=None: per-channel softplus (reference
        models/pano_mip_nerf.py:268-278). With a chroma simplex vector
        (BaseNeRF.chroma_head): rgb = 3 * softplus(mean(raw_rgb)) *
        chroma — the view branch contributes one scalar intensity and
        the spectrum is the view-independent simplex. The channel-mean
        keeps the view branch's parameter tree identical to the
        standard head; at init (raw ~ 0, chroma ~ 1/3) both forms give
        softplus(0) per channel."""
        if chroma is None:
            rgb = jax.nn.softplus(raw_rgb)
        else:
            intensity = jax.nn.softplus(
                jnp.mean(raw_rgb, axis=-1, keepdims=True))
            rgb = 3.0 * intensity * chroma
        return rgb * (1.0 + 2.0 * self.rgb_padding) - self.rgb_padding

    def _activate_rgb_density(self, raw_rgb: Array, raw_density_1ch: Array,
                              noise_key: Optional[jax.Array], randomized: bool,
                              chroma: Optional[Array] = None
                              ) -> Tuple[Array, Array]:
        """softplus radiance + biased softplus density (reference
        models/pano_mip_nerf.py:268-278); optional chroma-head combine
        (see `_rgb_from_raw`)."""
        raw_density_1ch = self._density_noise(raw_density_1ch, noise_key,
                                              randomized)
        rgb = self._rgb_from_raw(raw_rgb, chroma)
        density = jax.nn.softplus(raw_density_1ch + self.density_bias)
        return rgb, density

    def _raw_outputs_density_grad(self, params, means: Array, covs: Array,
                                  viewdirs: Array,
                                  want_bottleneck: bool = False,
                                  want_grad: bool = True):
        """Like `_raw_outputs`, plus d(raw_density[..., 0])/d(means).

        The gradient is built explicitly from the forward ReLU masks and the
        closed-form IPE Jacobian (models/normals.py) — first-order code that
        replaces the jax.vjp in the training fine level, eliminating all
        second-order autodiff from the train step.

        With `want_bottleneck=True` a 4th element is returned: the trunk's
        view-independent bottleneck features (for `_view_branch` re-queries,
        e.g. the view-consistency loss), or None when the fused kernel path
        handles the level (the kernel does not expose the bottleneck — the
        caller must fall back to a full `_raw_outputs` re-eval).
        """
        from pano_nerf_tpu.models import normals as normals_lib
        if self.disable_integration:
            covs = jnp.zeros_like(covs)
        if self._fused_ok(scope="fine") and want_grad:
            # v3 kernel: IPE + MLP + gradient chain fused in VMEM, with a
            # hand-written backward (kernels/fused_mlp_normals.py). The
            # whole fine level trains through custom_vjp — legal because
            # the explicit-normals restructure made the step first-order.
            from pano_nerf_tpu.kernels.fused_mlp_normals import (
                fused_mlp_normals_apply)
            venc = mip.pos_enc(
                viewdirs, 0, self.deg_view,
                self.append_identity)[..., None, :]
            out = fused_mlp_normals_apply(
                params, means, covs, venc, self.mlp_num_density_channels,
                self.min_deg_point, self.max_deg_point)
            return out + (None,) if want_bottleneck else out
        enc_f32 = mip.integrated_pos_enc(means, covs, self.min_deg_point,
                                         self.max_deg_point)
        enc = enc_f32.astype(self.compute_dtype)
        venc = None
        if self.use_viewdirs:
            venc = mip.pos_enc(
                viewdirs, 0, self.deg_view,
                self.append_identity)[..., None, :].astype(self.compute_dtype)
        out = normals_lib.mlp_with_density_grad(
            params, enc, venc, self.mlp_skip_index, self.compute_dtype,
            want_bottleneck=want_bottleneck, want_grad=want_grad)
        raw_rgb, raw_density, g_enc = out[:3]
        d_raw_sigma = (normals_lib.density_means_grad(
            g_enc, enc_f32, self.min_deg_point, self.max_deg_point)
            if want_grad else None)
        if want_bottleneck:
            return raw_rgb, raw_density, d_raw_sigma, out[3]
        return raw_rgb, raw_density, d_raw_sigma

    def _point_normal(self, params, means: Array, covs: Array,
                      viewdirs: Array, weights: Array, directions: Array,
                      use_ort_loss: bool):
        """Surface normal from ONE density-gradient query at the per-ray
        expected Gaussian (point-normals mode, see `point_normals`).

        The expected moments are the compositing-weight averages of the
        fine-level sample Gaussians; the chain runs on [B, 1, 3] rows —
        1/num_samples the cost of the per-sample walk. The softplus
        activation chain is a positive per-ray scalar and cannot change
        the direction of the gradient, so the normal is -g_raw normalized
        directly. Gradients flow through both the chain (first-order
        explicit code) and the weights (as in the reference's E[-grad]).
        """
        from pano_nerf_tpu.models import normals as normals_lib
        # The query location is a stop-gradient: the normal supervises the
        # FIELD at the current surface estimate, not the estimate itself.
        # Without this the weights->query-point->normal->surface-loss
        # feedback destabilizes early training (measured: SSIM collapse by
        # 4k steps, NaN by 6k, reproducible across re-rolled streams).
        w = jax.lax.stop_gradient(weights / jnp.maximum(
            jnp.sum(weights, axis=-1, keepdims=True), 1e-8))
        mean_pt = jnp.sum(w[..., None] * means, axis=-2, keepdims=True)
        cov_pt = jnp.sum(w[..., None] * covs, axis=-2, keepdims=True)
        mean_pt = jax.lax.stop_gradient(mean_pt)
        cov_pt = jax.lax.stop_gradient(cov_pt)
        if self.disable_integration:
            cov_pt = jnp.zeros_like(cov_pt)
        enc_f32 = mip.integrated_pos_enc(mean_pt, cov_pt,
                                         self.min_deg_point,
                                         self.max_deg_point)
        enc = enc_f32.astype(self.compute_dtype)
        venc = None
        if self.use_viewdirs:
            venc = mip.pos_enc(
                viewdirs, 0, self.deg_view,
                self.append_identity)[..., None, :].astype(
                    self.compute_dtype)
        _, _, g_enc = normals_lib.mlp_with_density_grad(
            params, enc, venc, self.mlp_skip_index, self.compute_dtype)
        d_raw = normals_lib.density_means_grad(
            g_enc, enc_f32, self.min_deg_point, self.max_deg_point)
        normal = mip.safe_normalize(-d_raw[..., 0, :])
        ort_loss = None
        if use_ort_loss:
            dot = jnp.sum(normal * directions, axis=-1)
            ort_loss = jnp.mean(jax.nn.relu(dot) ** 2)
        return normal, ort_loss

    def _view_branch(self, params, bottleneck: Array, viewdirs: Array
                     ) -> Array:
        """Raw rgb from saved bottleneck features under a new view direction
        (PE-encode + condition stack only — no trunk)."""
        from pano_nerf_tpu.models import normals as normals_lib
        venc = mip.pos_enc(
            viewdirs, 0, self.deg_view,
            self.append_identity)[..., None, :].astype(self.compute_dtype)
        return normals_lib.view_branch_apply(params, bottleneck, venc,
                                             self.compute_dtype)

    # ----- sampling ------------------------------------------------------

    def _sample_level(self, key: jax.Array, rays, i_level: int,
                      t_samples: Optional[Array], weights: Optional[Array],
                      randomized: bool, eval_counts: bool = False
                      ) -> Tuple[Array, Tuple[Array, Array]]:
        """`eval_counts=True` (first-order/eval calls) applies the
        eval_coarse_samples / eval_fine_samples FLOP-cut overrides."""
        if i_level == 0:
            n = (self.eval_coarse_samples
                 if eval_counts and self.eval_coarse_samples
                 else (self.num_coarse_samples or self.num_samples))
            # The coarse override is a CUT: never march more coarse samples
            # than the fine level (configs that shrink num_samples for
            # tests/benches keep working with the production yaml default).
            n = min(n, self.num_samples)
            return mip.sample_along_rays(
                key, rays.origins, rays.directions, rays.radii,
                n, rays.near, rays.far, randomized,
                self.disparity)
        # Fine count is ALWAYS num_samples (the documented coarse-only-cut
        # semantics) unless the eval override asks for fewer: passing it
        # explicitly decouples the resampled count from the coarse edge
        # count (resample_along_rays' None default follows
        # t_samples.shape[-1], which would silently propagate a
        # num_coarse_samples cut into the fine march). Bitwise identical
        # when the coarse count equals num_samples.
        return mip.resample_along_rays(
            key, rays.origins, rays.directions, rays.radii, t_samples,
            weights, randomized, self.stop_resample_grad,
            self.resample_padding,
            num_samples=(self.eval_fine_samples
                         if eval_counts and self.eval_fine_samples
                         else self.num_samples))

    def _env_samples(self, eval_counts: bool) -> int:
        """Samples per secondary (irradiance) env ray; `eval_counts=True`
        (first-order/eval calls) applies the eval_env_samples FLOP-cut
        override. Env rays feed only the surface products, so volumetric
        eval metrics are bitwise unaffected by the override."""
        return (self.eval_env_samples
                if eval_counts and self.eval_env_samples
                else self.num_env_samples)

    # ----- normals -------------------------------------------------------

    @staticmethod
    def _expected_normals(weights: Array, normals: Array, directions: Array,
                          use_ort_loss: bool):
        """Weight-average per-sample normals; optional orientation loss.

        Reference: /root/reference/models/pano_mip_nerf.py:296-313.
        """
        w_norm = weights[..., None] / jnp.sum(weights, axis=-1)[..., None, None]
        # safe_normalize, NOT x/max(norm,eps): a sample with an exactly-zero
        # density gradient otherwise NaNs the whole step's gradients
        # (NOTES.md round-3 spike forensics — this line was the root cause).
        normals = mip.safe_normalize(normals)
        normal = jnp.sum(w_norm * normals, axis=-2)
        normal = mip.safe_normalize(normal)
        ort_loss = None
        if use_ort_loss:
            dot = jnp.sum(normals * directions[..., None, :], axis=-1,
                          keepdims=True)
            ort_loss = jnp.mean(
                jnp.sum(w_norm * jax.nn.relu(dot) ** 2, axis=-2))
        return normal, ort_loss, w_norm
