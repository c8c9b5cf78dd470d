"""The training loop: data feeding, jitted steps, validation, checkpoints.

Replaces the Lightning Trainer orchestration (/root/reference/train.py:79-99)
with a plain step loop around jit-compiled functions:

* surface gating (`train.surface_start_step`) switches between two compiled
  train-step variants (reference gates per-step in python,
  systems/panonerf_system.py:24-27);
* validation cadence follows the reference's epoch fiction (1 epoch = 1000
  steps, datasets/pano_datasets.py:277-281) via `val.check_every_n_epoch`;
* a sanity validation runs before training (num_sanity_val_steps=1,
  train.py:89);
* scalars go to stdout + a JSONL metrics log — including the HDR ws-PSNR the
  reference's checkpoint callback monitors but never receives.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


from pano_nerf_tpu.data.pano_dataset import PanoDataset
from pano_nerf_tpu.engine import validation as val_lib
from pano_nerf_tpu.engine.checkpoint import Checkpointer
from pano_nerf_tpu.engine.system import PanoNeRFSystem, build_system
from pano_nerf_tpu.parallel import mesh as mesh_lib


@jax.jit
def _tree_finite_dev(tree):
    """All-leaves-finite as a single on-device reduction (one readback)."""
    return jnp.all(jnp.array([jnp.all(jnp.isfinite(x))
                              for x in jax.tree.leaves(tree)]))


def _tree_finite(tree) -> bool:
    return bool(jax.device_get(_tree_finite_dev(tree)))


class Trainer:
    def __init__(self, hparams: Dict):
        self.hparams = hparams
        self.max_steps = int(hparams["optimizer.max_steps"])
        self.log_every = int(hparams.get("log_every_n_step", 100))
        # Fractional epochs are an extension (reference: int only) — e.g.
        # 0.002 validates/checkpoints every 2 steps, used by the failure-
        # recovery tests.
        self.val_every = max(1, int(
            float(hparams["val.check_every_n_epoch"]) * 1000))
        self.save_dir = hparams["save_dir"]
        self.surface_start_step = int(hparams.get("train.surface_start_step", 0))
        self.use_surface = bool(hparams.get("train.surface", True))

        num_dev = hparams.get("parallel.num_devices")
        self.mesh = mesh_lib.get_mesh(num_dev)
        self.system = build_system(hparams, self.mesh)

        # --- datasets -----------------------------------------------------
        data_path = hparams["data_path"]
        self.train_dataset = PanoDataset(
            data_path, split="train", white_bkgd=hparams["train.white_bkgd"],
            factor=hparams["train.factor"], num=hparams["train.sample_num"],
            range=hparams["range"], meta_file=hparams.get("meta_file",
                                                          "transforms_all"),
            reform_cam=bool(hparams.get("reform_cam", 0)))
        self.val_dataset = PanoDataset(
            data_path, split="val", white_bkgd=hparams["val.white_bkgd"],
            factor=hparams["val.factor"], num=hparams["train.sample_num"],
            range=hparams["range"], meta_file=hparams.get("meta_file",
                                                          "transforms_all"),
            reform_cam=bool(hparams.get("reform_cam", 0)))

        if isinstance(self.system, PanoNeRFSystem):
            env = self.train_dataset.generate_lit_rays(
                num=hparams["nerf.num_ray_samples"],
                near=0.0, far=float(hparams["range"][1]))
            self.system.set_env_rays(env)

        self.ckpt = Checkpointer(
            os.path.join(self.save_dir, "checkpoints"),
            keep_every_n_steps=hparams.get("checkpoint.keep_every_n_steps", 0)
            or None)
        self.metrics_path = os.path.join(self.save_dir, "metrics.jsonl")
        self._render_fn = None  # built+jitted once, reused across validations

        # TensorBoard mirror of every logged record (the reference gets TB
        # curves for free from Lightning's default logger; configs enable
        # this to match — the in-code default stays off so bare Trainer
        # constructions in tests never pay the writer). The JSONL log stays
        # the source of truth either way.
        self._tb = None
        if bool(hparams.get("log.tensorboard", False)):
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(os.path.join(self.save_dir, "tb"))
            except Exception as e:  # missing wheel: JSONL-only, say so once
                print(f"[log] tensorboard disabled ({type(e).__name__}: {e})")

    # ------------------------------------------------------------------

    def _log(self, record: Dict) -> None:
        with open(self.metrics_path, "a") as fp:
            fp.write(json.dumps(record) + "\n")
        if self._tb is not None:
            step = int(record.get("step", 0))
            kind = str(record.get("kind", "train"))
            for key, val in record.items():
                if key in ("step", "kind") or isinstance(val, (str, bool)):
                    continue
                if isinstance(val, (int, float)) and np.isfinite(val):
                    self._tb.add_scalar(f"{kind}/{key}", val, step)
            if kind != "train":  # val/eval/abort boundaries flush to disk
                self._tb.flush()

    def validate(self, state, step: int, max_images: Optional[int] = None,
                 tag: str = "val") -> Dict[str, float]:
        """Render every val pano, save products, return mean metrics.

        `tag` names the product directory (`<tag>_<step>/`) and the metrics
        `kind` — the standalone scripts/eval.py passes "eval" so offline
        re-evaluations never collide with the training run's own val trees.
        """
        if self._render_fn is None:
            self._render_fn = self.system.make_render_image(
                enable_surf=isinstance(self.system, PanoNeRFSystem))
        render_fn = self._render_fn
        near, far = self.hparams["range"]
        save_dir = os.path.join(self.save_dir, f"{tag}_{step:06d}")
        agg: Dict[str, list] = {}
        n = len(self.val_dataset)
        if max_images is not None:
            n = min(n, max_images)
        for i in range(n):
            rays, gt_rgb, gt_depth, gt_normal, gt_albedo = self.val_dataset[i]
            products = val_lib.render_full_pano(
                render_fn, state.params, rays, self.val_dataset.h,
                self.val_dataset.w)
            m = val_lib.validation_metrics(
                products, gt_rgb, gt_depth, gt_normal, gt_albedo, near, far)
            val_lib.save_validation_products(
                products, gt_rgb, gt_depth, gt_normal, save_dir, i, near, far)
            for k, v in m.items():
                agg.setdefault(k, []).append(v)
        means = {k: float(np.mean(v)) for k, v in agg.items()}
        means.update(step=step, kind=tag)
        self._log(means)
        keys = ("psnr_hdr_vol", "psnr_ldr_vol", "ssim_ldr_vol")
        shown = ", ".join(f"{k}={means[k]:.3f}" for k in keys if k in means)
        print(f"[{tag} @ {step}] {shown}")
        return means

    # ------------------------------------------------------------------

    def fit(self, resume_path: Optional[str] = None,
            sanity_val: bool = True) -> None:
        hp = self.hparams
        system = self.system
        state = system.create_state(jax.random.PRNGKey(hp["seed"]))
        start_step = 0
        if resume_path:
            state = Checkpointer(resume_path).restore(state)
            start_step = int(jax.device_get(state.step))
            print(f"[resume] restored step {start_step} from {resume_path}")
        elif self.ckpt.latest_step() is not None:
            state = self.ckpt.restore(state)
            start_step = int(jax.device_get(state.step))
            print(f"[resume] restored step {start_step}")

        data_key = jax.random.PRNGKey(hp["seed"] + 1)
        steps_with_surface = (self.use_surface
                              and isinstance(system, PanoNeRFSystem))

        # Device-resident data path (default): upload the whole flattened
        # ray set to HBM once and sample batches on device inside the jitted
        # step — no host gather or per-step transfer. Falls back to the host
        # iterator for datasets that don't comfortably fit.
        ds = self.train_dataset
        ds_bytes = ds.num_rays * (14 + ds.images.shape[-1]) * 4
        device_data = (bool(hp.get("train.device_data", True))
                       and ds_bytes < 4e9)
        batch_iter = None
        # Multi-step lax.scan (device-resident only): K steps per dispatch
        # amortizes the per-step launch gap over the device tunnel —
        # measured +5.7% train throughput at K=8, batch 512 (NOTES.md
        # round-3). RNG stream and loss parts are identical to K
        # single-step calls (tests/test_trainer_integration.py); the loop
        # below falls back to single steps around log/val/profile/surface
        # boundaries so cadences behave exactly as before.
        spc = int(hp.get("train.steps_per_call", 8)) if device_data else 1
        spc = max(1, spc)
        dataset = None
        step_fn_surf = step_fn_plain = None
        scan_fn_surf = scan_fn_plain = None

        def build_device_fns():
            """(Re)upload the dataset to HBM and (re)build the jitted step
            functions over the fresh buffers. Called once at startup and
            again by the failure recovery: replay forensics (NOTES.md
            round-3 spike study) point at corruption of long-lived device
            buffers, so recovery re-creates every device-side input, not
            just the TrainState."""
            nonlocal dataset, step_fn_surf, step_fn_plain
            nonlocal scan_fn_surf, scan_fn_plain
            dataset = system.put_dataset_on_device(ds.rays, ds.images)
            batch = int(hp["train.batch_size"])
            step_fn_surf = (system.make_train_step_device_data(
                dataset, True, batch) if steps_with_surface else None)
            step_fn_plain = system.make_train_step_device_data(
                dataset, False, batch)
            if spc > 1:
                scan_fn_surf = (system.make_train_step_device_data(
                    dataset, True, batch, steps_per_call=spc)
                    if steps_with_surface else None)
                scan_fn_plain = system.make_train_step_device_data(
                    dataset, False, batch, steps_per_call=spc)

        if device_data:
            build_device_fns()
            print(f"[data] device-resident ({ds_bytes / 1e6:.0f} MB, "
                  f"{ds.num_rays:,} rays"
                  + (f", {spc} steps/dispatch" if spc > 1 else "") + ")")
        else:
            batch_iter = ds.iter_batches(hp["train.batch_size"],
                                         seed=hp["seed"])
            step_fn_surf = (system.make_train_step(True)
                            if steps_with_surface else None)
            step_fn_plain = system.make_train_step(False)

        if sanity_val and start_step == 0:
            self.validate(state, step=0, max_images=1)

        # Optional profiler capture of a step window
        # (config: profile_dir + profile_steps).
        profile_dir = hp.get("profile_dir")
        profile_at = int(hp.get("profile_start_step", 10))
        profile_n = int(hp.get("profile_steps", 5))

        def _group_ok(step: int) -> bool:
            """True when [step, step+spc) crosses no cadence boundary, the
            surface flag is constant over it, and no profiler edge falls
            inside — the K-step scan is then byte-equivalent in observable
            behavior to K single steps."""
            if spc <= 1 or step + spc > self.max_steps:
                return False
            for cad in (self.log_every, self.val_every):
                if (step // cad) != ((step + spc - 1) // cad):
                    return False
            if steps_with_surface and (
                    step < self.surface_start_step <= step + spc - 1):
                return False
            if profile_dir and (
                    step <= profile_at < step + spc
                    or step <= profile_at + profile_n < step + spc):
                return False
            return True

        # Failure recovery (train.nan_recovery, default 2): on a non-finite
        # loss, restore the last checkpoint and continue with a PERTURBED
        # batch stream instead of aborting. The round-3 spike study
        # (NOTES.md) showed these are knife-edge numeric events — a
        # deterministic replay through a different executable does not
        # reproduce them — so re-rolling the sample sequence from the last
        # good state converts a dead 12-hour run into a logged hiccup.
        # After the retry budget the abort (with checkpoint pointer)
        # behaves exactly as before. 0 disables.
        nan_retries_left = int(hp.get("train.nan_recovery", 2))
        nan_retry = 0
        # After a recovery: (a) the retry budget refills once the run has
        # made real progress past the failure (two val periods), so an
        # 88k run can absorb several isolated hiccups while a truly-stuck
        # loop still aborts; (b) dispatch falls back to SINGLE-step
        # executables through the failure window — replay probes showed
        # the blow-ups do not reproduce under a different executable mix
        # (NOTES.md round-3 spike study), so changing the mix is itself
        # part of the recovery.
        nan_failed_step = -1
        nan_cooldown_until = -1

        t0 = time.perf_counter()
        rays_done = 0
        step = start_step
        # Profiler window as a one-shot state machine: a NaN rewind can
        # send `step` back across profile_at while a trace is open —
        # re-entering start_trace then raises and kills the run recovery
        # was saving. "pending" -> "active" -> "done", never backwards;
        # `>=` on the close edge tolerates step jumps. A resume already
        # past the window never opens it.
        trace_state = "pending" if start_step <= profile_at else "done"
        while step < self.max_steps:
            if (profile_dir and trace_state == "pending"
                    and step >= profile_at):
                jax.profiler.start_trace(profile_dir)
                trace_state = "active"
            if (profile_dir and trace_state == "active"
                    and step >= profile_at + profile_n):
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                trace_state = "done"
                print(f"[profile] trace written to {profile_dir}")
            surf = steps_with_surface and step >= self.surface_start_step
            if device_data:
                if _group_ok(step) and step >= nan_cooldown_until:
                    fn = scan_fn_surf if surf else scan_fn_plain
                    k_steps = spc
                else:
                    fn = step_fn_surf if surf else step_fn_plain
                    k_steps = 1
                state, parts = fn(state, data_key)
            else:
                fn = step_fn_surf if surf else step_fn_plain
                k_steps = 1
                batch = system.shard_batch(next(batch_iter))
                state, parts = fn(state, batch, data_key)
            step += k_steps
            rays_done += hp["train.batch_size"] * k_steps

            if step % self.log_every == 0:
                parts = jax.device_get(parts)
                dt = time.perf_counter() - t0
                rps = rays_done / dt
                scalars = {k: float(v) for k, v in parts.items()
                           if v is not None}
                # Failure detection: a non-finite loss poisons the params —
                # recover from the last checkpoint with a perturbed batch
                # stream (see nan_retries_left above), or abort with a
                # checkpoint-preserving message once retries are exhausted.
                if not np.isfinite(scalars["loss"]):
                    # Triage before recovering: a non-finite READING does
                    # not always mean a poisoned state (a readback can be
                    # corrupt while the device state is healthy). Params
                    # finiteness is computed ON DEVICE: if the state is
                    # healthy, log the event and keep training; rewind
                    # only when the params are actually non-finite.
                    # (The dominant genuinely-poisoned class — NaN grads
                    # from sqrt'(0) in the normalize backward at a
                    # zero-density-gradient sample — is fixed at the root
                    # by ops/mip.safe_normalize; see NOTES.md forensics.)
                    if _tree_finite(state.params):
                        self._log({"step": step, "kind": "nan_false_alarm",
                                   **scalars})
                        print(f"[recover] non-finite loss READING at step "
                              f"{step} but params are finite on device — "
                              f"false alarm, continuing")
                        t0 = time.perf_counter()
                        rays_done = 0
                        # NO `continue`: fall through to the checkpoint/
                        # validation block below — a false alarm landing on
                        # a val boundary must not skip the scheduled
                        # checkpoint (otherwise a later real failure rewinds
                        # a full val period further than it should).
                    else:
                        if (nan_failed_step >= 0 and
                                step >= nan_failed_step + 2 * self.val_every):
                            nan_retry = 0   # real progress past the failure
                        restored = (self.ckpt.latest_step()
                                    if nan_retry < nan_retries_left else None)
                        if restored is None:
                            self._log({"step": step, "kind": "abort",
                                       "reason": "non-finite loss",
                                       **scalars})
                            raise FloatingPointError(
                                f"non-finite loss at step {step}: {scalars}"
                                f" — last good checkpoint: "
                                f"{self.ckpt.latest_step()} in "
                                f"{self.ckpt.directory}")
                        nan_retry += 1
                        nan_failed_step = step
                        nan_cooldown_until = step + self.log_every
                        # Diagnose the long-lived device buffers before
                        # rebuilding them: records whether the HBM-resident
                        # dataset itself was corrupted (the leading
                        # hypothesis from the replay forensics).
                        data_finite = None
                        if device_data and dataset is not None:
                            data_finite = _tree_finite(dataset)
                        self._log({"step": step, "kind": "nan_recovery",
                                   "retry": nan_retry,
                                   "restored_step": restored,
                                   "device_data_finite": data_finite,
                                   **scalars})
                        print(f"[recover] non-finite loss at step {step}; "
                              f"restored step {restored} "
                              f"(retry {nan_retry}/{nan_retries_left}, "
                              f"re-rolled batch stream, single-step "
                              f"cooldown to {nan_cooldown_until}, "
                              f"device data finite: {data_finite})")
                        if device_data:
                            # Rebuild every device-side input over fresh
                            # buffers, not just the TrainState.
                            build_device_fns()
                        state = self.ckpt.restore(state)
                        step = int(jax.device_get(state.step))
                        data_key = jax.random.fold_in(
                            jax.random.PRNGKey(hp["seed"] + 1), nan_retry)
                        t0 = time.perf_counter()
                        rays_done = 0
                        continue
                else:
                    self._log({"step": step, "kind": "train",
                               "rays_per_sec": rps, **scalars})
                    print(f"[{step}/{self.max_steps}] "
                          f"loss={scalars['loss']:.5f} rays/s={rps:,.0f}")
                    t0 = time.perf_counter()
                    rays_done = 0

            if step % self.val_every == 0 or step == self.max_steps:
                self.ckpt.save(step, jax.device_get(state), wait=False)
                self.validate(state, step=step)

        self.ckpt.save(self.max_steps, jax.device_get(state), wait=True)
        print("[done] training complete")
