"""Training systems: model + optimizer + jitted train/render steps.

Functional counterpart of the reference Lightning systems
(/root/reference/systems/{base,mipnerf,panonerf}_system.py). A System owns
the static pieces (model config, loss weights, optimizer, mesh) and builds
pure jitted functions; all mutable state lives in an explicit `TrainState`.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pano_nerf_tpu.core.rays import Rays, rays_map
from pano_nerf_tpu.engine import losses as losses_lib
from pano_nerf_tpu.engine.schedule import mip_lr_decay
from pano_nerf_tpu.models import build_model
from pano_nerf_tpu.parallel import mesh as mesh_lib


class TrainState(NamedTuple):
    step: jax.Array          # int32 scalar
    params: Any
    opt_state: Any


def clip_by_global_norm(max_norm: float) -> optax.GradientTransformation:
    """Global-norm clip with one scalar and one multiply per leaf.

    optax.clip_by_global_norm evaluates BOTH select branches per leaf
    (divide + multiply + select = 3 elementwise passes over the gradient
    tree every step) — measured 3.4% of the train step on v5e. This
    computes `scale = max_norm / maximum(g_norm, max_norm)` once; scale is
    EXACTLY 1.0f when the norm is under the bound, so the healthy-step
    update is bit-identical to no clipping, and the clipped-step update
    matches optax up to multiplication-order rounding.
    """

    def update_fn(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        scale = max_norm / jnp.maximum(g_norm, max_norm)
        return jax.tree.map(
            lambda t: t * scale.astype(t.dtype), updates), state

    return optax.GradientTransformation(
        lambda params: optax.EmptyState(), update_fn)


class BaseSystem:
    def __init__(self, hparams: Dict, mesh=None):
        # Fill the beyond-reference loss defaults here (single source:
        # losses_lib.EXTENSION_DEFAULTS) so a reference-era config that
        # predates the keys trains with the documented production loss,
        # while direct pano_losses() calls with a key-less dict keep
        # strict reference parity.
        self.hparams = hparams = losses_lib.prepare_hparams(hparams)
        self.model = build_model(hparams)
        self.train_randomized = bool(hparams["train.randomized"])
        self.val_randomized = bool(hparams["val.randomized"])
        self.white_bkgd = bool(hparams["train.white_bkgd"])
        self.val_chunk_size = int(hparams["val.chunk_size"])
        adam = optax.adam(mip_lr_decay(
            hparams["optimizer.lr_init"], hparams["optimizer.lr_final"],
            hparams["optimizer.max_steps"], hparams["optimizer.lr_delay_steps"],
            hparams["optimizer.lr_delay_mult"]))
        # Global-norm gradient clip (beyond the reference, which inherits
        # Lightning's default of none). A single outlier batch can blow up
        # the unbounded-above HDR head late in training — measured: the
        # view-consistency recipe at 88k steps hit NaN at step 54k from one
        # spike while at its best quality ever (HDR ws-PSNR +2.5 at 52k,
        # NOTES.md round-3). 0 disables (strict parity).
        clip = float(hparams.get("optimizer.grad_clip", 0.0))
        self.tx = (optax.chain(clip_by_global_norm(clip), adam)
                   if clip > 0 else adam)
        self.mesh = mesh if mesh is not None else mesh_lib.get_mesh(1)
        self.env_rays: Optional[Rays] = None
        # Per-executable XLA override for the TRAIN step only: the step is
        # fusion-window-bound at batch 512 (NOTES.md round-3 FLOP diet), and
        # raising the scoped-VMEM budget from the ~16 MB default widens
        # XLA's fusion windows — measured sweep on v5e (production step,
        # scan 8): 24 MB = best (+5.5% rays/s), 32 MB +2.7%, >=48 MB
        # regresses (starves double-buffering). 0 = compiler default.
        self.scoped_vmem_kib = int(
            float(hparams.get("train.scoped_vmem_kib", 0)))

    def _jit_train(self, fn):
        """jit with donation; applies `train.scoped_vmem_kib` via AOT
        lower/compile on the first call (TPU backends only — the flag does
        not exist in CPU XLA builds, and tests run on CPU)."""
        jitted = jax.jit(fn, donate_argnums=(0,))
        if self.scoped_vmem_kib <= 0 or jax.default_backend() == "cpu":
            return jitted
        opts = {"xla_tpu_scoped_vmem_limit_kib": str(self.scoped_vmem_kib)}
        cache = {}

        def wrapper(*args):
            if "exe" not in cache:
                cache["exe"] = jitted.lower(*args).compile(
                    compiler_options=opts)
            return cache["exe"](*args)

        return wrapper

    def _jit_steps(self, one_step, steps_per_call: int = 1):
        """jit `one_step`, or a `lax.scan` over `steps_per_call` of it
        (the multi-step dispatch both systems share). `train.scan_unroll`
        copies the body inside the while loop: xprof showed ~534 us/step
        of while-op self-time (inter-iteration scheduling gaps) at
        unroll=1; unrolling trades compile time (body duplicated) for
        removing those gaps — measured -2% at the production point, so
        the default stays 1 (NOTES.md round-3 benchmark deltas)."""
        if steps_per_call == 1:
            return self._jit_train(one_step)
        unroll = int(self.hparams.get("train.scan_unroll", 1))

        def multi_step(state: TrainState, key: jax.Array):
            def body(st, _):
                return one_step(st, key)
            state, parts = jax.lax.scan(body, state, None,
                                        length=steps_per_call,
                                        unroll=min(unroll, steps_per_call))
            return state, jax.tree.map(lambda x: x[-1], parts)

        return self._jit_train(multi_step)

    # ----- state ---------------------------------------------------------

    def create_state(self, key: jax.Array) -> TrainState:
        params = self.model.init(key)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=self.tx.init(params))
        return mesh_lib.replicate(self.mesh, state)

    def set_env_rays(self, env_rays: Rays) -> None:
        self.env_rays = mesh_lib.replicate(
            self.mesh, rays_map(jnp.asarray, env_rays))

    def shard_batch(self, batch):
        return mesh_lib.shard_batch(self.mesh, batch)

    @staticmethod
    def render_normal(normal_img, w2c: np.ndarray):
        """World->camera normal transform for display, [H, W, 3] @ w2c^T.

        Reference: systems/base_system.py:108-110 (CHW there, HWC here).
        """
        return normal_img @ np.asarray(w2c).T

    def clamp_depth(self, depth):
        """Clamp depth into the scene's [near, far] range
        (reference systems/base_system.py:112-115)."""
        near, far = self.hparams["range"]
        return jnp.clip(depth, near, far)

    def _freeze_illum_grads(self, grads, step):
        """Zero the illuminant-field subtree's gradients once
        step >= train.illum_freeze * max_steps (traced comparison).

        Round-5 ilfd study: with the one-way distill always on, the
        field's identification signal collapses as the radiance field
        starts matching it (the integral's residual that TAUGHT the
        field becomes self-fulfilling) and the field itself drifts off
        the correct spectra the probe measured in the distill-free run.
        Phase the training instead: let the field learn from the
        still-collapsed radiance, then freeze it exactly when the
        distill begins pulling (loss.illum_distill_start). Grad masking
        under Adam leaves ~beta1^k momentum drift for a few dozen steps
        — negligible at 44k scale. No-op when the knob or subtree is
        absent.
        """
        freeze = float(self.hparams.get("train.illum_freeze", 0.0))
        if freeze <= 0 or "illum" not in grads.get("params", {}):
            return grads
        fstep = freeze * float(self.hparams["optimizer.max_steps"])
        scale = (step < fstep).astype(jnp.float32)
        g = dict(grads)
        gp = dict(g["params"])
        gp["illum"] = jax.tree.map(lambda x: x * scale, gp["illum"])
        g["params"] = gp
        return g

    def _apply_updates(self, state: TrainState, grads) -> TrainState:
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state)

    # ----- rendering helpers --------------------------------------------

    def _chunked(self, render_chunk, rays: Rays, num_rays: int):
        """Pad to a chunk multiple and lax.map the chunk renderer.

        On a multi-device mesh each chunk is additionally split over the
        `data` axis with shard_map — rays are per-ray independent, so the
        per-device programs run collective-free and rendering scales like
        training does (the reference has no multi-device eval at all).
        lax.map stays the outer loop either way: it bounds peak memory to
        one chunk of activations per device.
        """
        chunk = self.val_chunk_size
        n_dev = int(self.mesh.devices.size)
        if n_dev > 1 and chunk % n_dev == 0:
            from jax.sharding import PartitionSpec as P
            render_chunk = jax.shard_map(
                render_chunk, mesh=self.mesh,
                in_specs=P(mesh_lib.DATA_AXIS),
                out_specs=P(mesh_lib.DATA_AXIS),
                check_vma=False)
        n = num_rays
        pad = (-n) % chunk
        padded = rays_map(
            lambda x: jnp.concatenate(
                [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0) if pad else x,
            rays)
        chunked = rays_map(
            lambda x: x.reshape(-1, chunk, x.shape[-1]), padded)
        out = jax.lax.map(render_chunk, chunked)
        return jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:])[:n], out)


class PanoNeRFSystem(BaseSystem):
    """HDR pano training with the surface/irradiance path
    (reference systems/panonerf_system.py)."""

    def make_train_step(self, enable_surf: bool):
        hp = self.hparams
        use_ort = hp["loss.ort_loss"] > 0
        use_vc = float(hp.get("loss.view_consistency", 0.0)) > 0
        use_sd = (float(hp.get("loss.scale_distill", 0.0)) > 0
                  or float(hp.get("loss.scale_distill_dist", 0.0)) > 0)
        env_rays = self.env_rays
        assert env_rays is not None, "call set_env_rays() first"

        def step_fn(state: TrainState, batch, key: jax.Array):
            rays, rgbs = batch[0], batch[1]
            step_key = jax.random.fold_in(key, state.step)
            mask = rays.lossmult

            def loss_fn(params):
                outs = self.model(
                    params, step_key, rays, env_rays,
                    randomized=self.train_randomized,
                    white_bkgd=self.white_bkgd, enable_surf=enable_surf,
                    use_ort_loss=use_ort, use_vc_loss=use_vc,
                    use_scale_distill=use_sd)
                parts = losses_lib.pano_losses(outs, rgbs[..., :3], mask, hp,
                                               enable_surf, step=state.step)
                return parts["loss"], parts

            (_, parts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads = self._freeze_illum_grads(grads, state.step)
            return self._apply_updates(state, grads), parts

        return self._jit_train(step_fn)

    def make_train_step_device_data(self, dataset, enable_surf: bool,
                                    batch_size: int,
                                    steps_per_call: int = 1):
        """Train step with a device-resident dataset: the ray batch is
        sampled ON DEVICE each step (uniform with replacement) — no host
        gather, no per-step host->device transfer. `dataset` is a
        (Rays, rgbs) tuple of full flattened device arrays.

        TPU-native replacement for the reference's 28-worker DataLoader:
        at panoramic scales the whole flattened ray set (~100 MB) fits in
        HBM, so "data loading" reduces to a fused device gather inside the
        jitted step. (Sampling with replacement instead of epoch
        permutations — statistically equivalent for SGD at these sizes.)

        `steps_per_call > 1` wraps that many steps in one `lax.scan` —
        one dispatch over the device tunnel instead of K, amortizing the
        per-step launch gap (measured +0.6% single-chip through the axon
        tunnel; matters more on real multi-host pods). The RNG stream is
        identical to K single-step calls with the same key (each inner
        step folds it with its own `state.step`); numerics agree to
        compilation-level fp scheduling (~1e-6). Returned loss parts are
        from the LAST inner step.
        """
        hp = self.hparams
        use_ort = hp["loss.ort_loss"] > 0
        use_vc = float(hp.get("loss.view_consistency", 0.0)) > 0
        use_sd = (float(hp.get("loss.scale_distill", 0.0)) > 0
                  or float(hp.get("loss.scale_distill_dist", 0.0)) > 0)
        env_rays = self.env_rays
        assert env_rays is not None, "call set_env_rays() first"
        rays_all, rgbs_all = dataset
        n = rgbs_all.shape[0]
        sharding = mesh_lib.batch_sharding(self.mesh)

        def one_step(state: TrainState, key: jax.Array):
            step_key = jax.random.fold_in(key, state.step)
            k_idx, k_model = jax.random.split(step_key)
            idx = jax.random.randint(k_idx, (batch_size,), 0, n)
            idx = jax.lax.with_sharding_constraint(idx, sharding)
            rays = jax.tree.map(lambda x: x[idx], rays_all)
            rgbs = rgbs_all[idx]
            mask = rays.lossmult

            def loss_fn(params):
                outs = self.model(
                    params, k_model, rays, env_rays,
                    randomized=self.train_randomized,
                    white_bkgd=self.white_bkgd, enable_surf=enable_surf,
                    use_ort_loss=use_ort, use_vc_loss=use_vc,
                    use_scale_distill=use_sd)
                parts = losses_lib.pano_losses(outs, rgbs[..., :3], mask, hp,
                                               enable_surf, step=state.step)
                return parts["loss"], parts

            (_, parts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads = self._freeze_illum_grads(grads, state.step)
            return self._apply_updates(state, grads), parts

        return self._jit_steps(one_step, steps_per_call)

    def put_dataset_on_device(self, rays, images):
        """Upload the flattened training set once, replicated over the mesh."""
        import numpy as np

        from pano_nerf_tpu.core.rays import rays_map
        rep = mesh_lib.replicated_sharding(self.mesh)
        rays_dev = rays_map(
            lambda x: jax.device_put(np.asarray(x, np.float32), rep), rays)
        rgbs_dev = jax.device_put(np.asarray(images, np.float32), rep)
        return rays_dev, rgbs_dev

    def make_render_image(self, enable_surf: bool = True):
        """Returns jitted fn(params, rays_flat, num_rays) -> dict of [N, C]."""
        env_rays = self.env_rays

        def render_fn(params, rays: Rays):
            def render_chunk(chunk_rays: Rays):
                outs = self.model(
                    params, jax.random.PRNGKey(0), chunk_rays, env_rays,
                    randomized=self.val_randomized,
                    white_bkgd=self.white_bkgd, enable_surf=enable_surf,
                    use_ort_loss=False, first_order=True)
                c, f = outs[0], outs[-1]
                out = dict(
                    rgb_coarse=c.rgb, dep_coarse=c.distance[..., None],
                    rgb_fine=f.rgb, dep_fine=f.distance[..., None],
                    normal=f.normal)
                if enable_surf:
                    out.update(albedo=f.albedo,
                               roughness=f.roughness[..., None],
                               surf_rgb=f.surf_rgb, shading=f.shading)
                    if f.emission is not None:
                        out["emission"] = f.emission
                return out

            n = rays.origins.shape[0]
            return self._chunked(render_chunk, rays, n)

        return jax.jit(render_fn)


class MipNeRFSystem(BaseSystem):
    """LDR-supervised baseline (reference systems/mipnerf_system.py)."""

    def make_train_step(self, enable_surf: bool = False):
        hp = self.hparams
        use_ort = hp["loss.ort_loss"] > 0

        def step_fn(state: TrainState, batch, key: jax.Array):
            rays, rgbs = batch[0], batch[1]
            step_key = jax.random.fold_in(key, state.step)
            mask = rays.lossmult

            def loss_fn(params):
                outs = self.model(
                    params, step_key, rays, randomized=self.train_randomized,
                    white_bkgd=self.white_bkgd, use_ort_loss=use_ort)
                parts = losses_lib.mipnerf_losses(outs, rgbs[..., :3], mask, hp)
                return parts["loss"], parts

            (_, parts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            return self._apply_updates(state, grads), parts

        return self._jit_train(step_fn)

    def make_train_step_device_data(self, dataset, enable_surf: bool,
                                    batch_size: int,
                                    steps_per_call: int = 1):
        """Device-resident-data train step (see PanoNeRFSystem variant)."""
        hp = self.hparams
        use_ort = hp["loss.ort_loss"] > 0
        rays_all, rgbs_all = dataset
        n = rgbs_all.shape[0]
        sharding = mesh_lib.batch_sharding(self.mesh)

        def one_step(state: TrainState, key: jax.Array):
            step_key = jax.random.fold_in(key, state.step)
            k_idx, k_model = jax.random.split(step_key)
            idx = jax.random.randint(k_idx, (batch_size,), 0, n)
            idx = jax.lax.with_sharding_constraint(idx, sharding)
            rays = jax.tree.map(lambda x: x[idx], rays_all)
            rgbs = rgbs_all[idx]
            mask = rays.lossmult

            def loss_fn(params):
                outs = self.model(
                    params, k_model, rays, randomized=self.train_randomized,
                    white_bkgd=self.white_bkgd, use_ort_loss=use_ort)
                parts = losses_lib.mipnerf_losses(outs, rgbs[..., :3], mask,
                                                  hp)
                return parts["loss"], parts

            (_, parts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            return self._apply_updates(state, grads), parts

        return self._jit_steps(one_step, steps_per_call)

    put_dataset_on_device = PanoNeRFSystem.put_dataset_on_device

    def make_render_image(self, enable_surf: bool = False):
        def render_fn(params, rays: Rays):
            def render_chunk(chunk_rays: Rays):
                outs = self.model(
                    params, jax.random.PRNGKey(0), chunk_rays,
                    randomized=self.val_randomized,
                    white_bkgd=self.white_bkgd, use_ort_loss=True,
                    first_order=True)
                c, f = outs[0], outs[-1]
                return dict(
                    rgb_coarse=c.rgb, dep_coarse=c.distance[..., None],
                    rgb_fine=f.rgb, dep_fine=f.distance[..., None],
                    normal=f.normal)

            n = rays.origins.shape[0]
            return self._chunked(render_chunk, rays, n)

        return jax.jit(render_fn)


def build_system(hparams: Dict, mesh=None) -> BaseSystem:
    name = hparams["nerf.mlp_name"]
    if name == "panonerf":
        return PanoNeRFSystem(hparams, mesh)
    if name == "mipnerf":
        return MipNeRFSystem(hparams, mesh)
    raise ValueError(f"Unknown system {name!r}")
