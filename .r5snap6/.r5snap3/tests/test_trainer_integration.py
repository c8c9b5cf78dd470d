"""End-to-end trainer integration on CPU: tiny scene, few steps, full loop.

Covers what the reference leaves to Lightning's sanity validation
(train.py:89): data loading -> sharded batches -> jitted steps -> validation
products -> checkpoint -> resume, all through the public Trainer/CLI layer.
"""

import json
import os

import numpy as np
import pytest

from pano_nerf_tpu.data.synthetic import generate_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scene"))
    generate_scene(d, n_views=4, height=16, width=32)
    return d


def small_hparams(scene, out_dir, model="panonerf", steps=4):
    from pano_nerf_tpu.core.config import load_config

    hp = load_config(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", f"{model}.yaml"))
    hp.update({
        "data_path": scene,
        "save_dir": out_dir,
        "range": (0, 10),
        "train.factor": 1,
        "val.factor": 1,
        "train.sample_num": [0, 1, 2],
        "train.batch_size": 32,
        "train.precision": "f32",
        "nerf.num_samples": 4,
        "nerf.num_env_samples": 2,
        "nerf.num_ray_samples": 2,
        "optimizer.max_steps": steps,
        "val.check_every_n_epoch": 10**6,
        "val.chunk_size": 128,
        "log_every_n_step": 2,
        "parallel.num_devices": 2,
    })
    return hp


class TestTrainerLoop:
    def test_full_fit_and_resume(self, scene, tmp_path):
        from pano_nerf_tpu.engine.trainer import Trainer

        out = str(tmp_path / "exp")
        os.makedirs(out, exist_ok=True)
        hp = small_hparams(scene, out, steps=4)
        trainer = Trainer(hp)
        trainer.fit(sanity_val=False)

        # Checkpoint written at final step.
        assert trainer.ckpt.latest_step() == 4
        # Metrics log contains train records and the final validation.
        with open(os.path.join(out, "metrics.jsonl")) as fp:
            records = [json.loads(l) for l in fp]
        kinds = {r["kind"] for r in records}
        assert {"train", "val"} <= kinds
        val = [r for r in records if r["kind"] == "val"][-1]
        assert np.isfinite(val["psnr_hdr_vol"])
        assert "psnr_hdr_surf" in val

        # Validation product tree (11 products incl. surface/albedo).
        vdir = os.path.join(out, "val_000004")
        for product in ("gt_hdr", "pred_hdr", "gt_ldr", "pred_ldr",
                        "gt_normal", "pred_normal", "gt_depth", "pred_depth",
                        "pred_hdr_surf", "pred_ldr_surf", "pred_albedo"):
            assert os.path.exists(os.path.join(vdir, product, "000.exr")) or \
                os.path.exists(os.path.join(vdir, product, "000.png")), product

        # Resume: a fresh Trainer restores step 4 and runs to 6.
        hp2 = small_hparams(scene, out, steps=6)
        trainer2 = Trainer(hp2)
        trainer2.fit(sanity_val=False)
        assert trainer2.ckpt.latest_step() == 6

    def test_emissive_head_fit(self, scene, tmp_path):
        """nerf.emissive_head trains end-to-end and the validation tree
        gains the pred_emission EXR product."""
        from pano_nerf_tpu.engine.trainer import Trainer

        out = str(tmp_path / "em")
        os.makedirs(out, exist_ok=True)
        hp = small_hparams(scene, out, steps=2)
        hp["nerf.emissive_head"] = True
        trainer = Trainer(hp)
        trainer.fit(sanity_val=False)
        em_f = os.path.join(out, "val_000002", "pred_emission", "000.exr")
        assert os.path.exists(em_f)
        from pano_nerf_tpu.data.io_exr import read_exr
        em = read_exr(em_f)
        assert np.isfinite(em).all() and (em >= 0).all()
        with open(os.path.join(out, "metrics.jsonl")) as fp:
            records = [json.loads(l) for l in fp]
        train = [r for r in records if r["kind"] == "train"]
        assert np.isfinite(train[-1]["loss"])
        assert train[-1].get("emission") is not None

    def test_mipnerf_system_fit(self, scene, tmp_path):
        from pano_nerf_tpu.engine.trainer import Trainer

        out = str(tmp_path / "mip")
        os.makedirs(out, exist_ok=True)
        hp = small_hparams(scene, out, model="mipnerf", steps=2)
        trainer = Trainer(hp)
        trainer.fit(sanity_val=False)
        with open(os.path.join(out, "metrics.jsonl")) as fp:
            records = [json.loads(l) for l in fp]
        val = [r for r in records if r["kind"] == "val"][-1]
        assert np.isfinite(val["psnr_hdr_vol"])

    def test_scan_groups_in_fit_loop(self, scene, tmp_path):
        """train.steps_per_call engages the lax.scan multi-step dispatch in
        the fit loop when cadences align, with log records at the same
        steps as the single-step loop (round-3 throughput path)."""
        from pano_nerf_tpu.engine.trainer import Trainer

        out = str(tmp_path / "scan")
        os.makedirs(out, exist_ok=True)
        hp = small_hparams(scene, out, steps=8)
        hp["train.steps_per_call"] = 4
        hp["log_every_n_step"] = 4
        trainer = Trainer(hp)
        trainer.fit(sanity_val=False)
        assert trainer.ckpt.latest_step() == 8
        with open(os.path.join(out, "metrics.jsonl")) as fp:
            records = [json.loads(l) for l in fp]
        train_steps = [r["step"] for r in records if r["kind"] == "train"]
        assert train_steps == [4, 8]
        assert all(np.isfinite(r["loss"]) for r in records
                   if r["kind"] == "train")

    def test_scan_unroll_matches_rolled(self, scene, tmp_path):
        """train.scan_unroll duplicates the scan body (deleting while-op
        scheduling gaps); the trained result must match the rolled loop —
        same RNG stream, same updates (fp-scheduling tolerance)."""
        from pano_nerf_tpu.engine.trainer import Trainer

        losses = {}
        for unroll in (1, 4):
            out = str(tmp_path / f"unroll{unroll}")
            os.makedirs(out, exist_ok=True)
            hp = small_hparams(scene, out, steps=8)
            hp["train.steps_per_call"] = 4
            hp["train.scan_unroll"] = unroll
            hp["log_every_n_step"] = 4
            Trainer(hp).fit(sanity_val=False)
            with open(os.path.join(out, "metrics.jsonl")) as fp:
                records = [json.loads(l) for l in fp]
            losses[unroll] = [r["loss"] for r in records
                              if r["kind"] == "train"]
        np.testing.assert_allclose(losses[1], losses[4], rtol=1e-5)

    def test_scan_groups_respect_surface_boundary(self, scene, tmp_path):
        """A surface_start_step falling inside a scan group forces the
        single-step fallback so the surface loss engages at exactly the
        configured step; log cadence is preserved across the mix of
        grouped and single dispatches."""
        from pano_nerf_tpu.engine.trainer import Trainer

        out = str(tmp_path / "scan_surf")
        os.makedirs(out, exist_ok=True)
        hp = small_hparams(scene, out, steps=8)
        hp["train.steps_per_call"] = 4
        hp["train.surface_start_step"] = 6
        hp["log_every_n_step"] = 2
        trainer = Trainer(hp)
        trainer.fit(sanity_val=False)
        assert trainer.ckpt.latest_step() == 8
        with open(os.path.join(out, "metrics.jsonl")) as fp:
            records = [json.loads(l) for l in fp]
        train_recs = {r["step"]: r for r in records if r["kind"] == "train"}
        assert sorted(train_recs) == [2, 4, 6, 8]
        # Surface loss must be absent before the boundary and present after.
        assert train_recs[2].get("vol_surface") is None
        assert np.isfinite(train_recs[8]["vol_surface"])

    def test_surface_gating(self, scene, tmp_path):
        """surface_start_step > 0 trains without the surface loss first."""
        from pano_nerf_tpu.engine.trainer import Trainer

        out = str(tmp_path / "gate")
        os.makedirs(out, exist_ok=True)
        hp = small_hparams(scene, out, steps=4)
        hp["train.surface_start_step"] = 2
        trainer = Trainer(hp)
        trainer.fit(sanity_val=False)
        with open(os.path.join(out, "metrics.jsonl")) as fp:
            records = [json.loads(l) for l in fp]
        train = [r for r in records if r["kind"] == "train"]
        # Step 2 window: no surface loss yet; step 4 window: present.
        assert "vol_surface" not in train[0] or train[0].get("vol_surface") is None
        assert train[-1].get("vol_surface") is not None


class TestTensorboardMirror:
    def test_tb_events_written(self, scene, tmp_path):
        """log.tensorboard mirrors every _log record as kind/key scalars
        under save_dir/tb (the configs default it on — reference parity
        with Lightning's TB logger); the JSONL log is unchanged."""
        from pano_nerf_tpu.engine.trainer import Trainer

        out = str(tmp_path / "exp_tb")
        os.makedirs(out, exist_ok=True)
        hp = small_hparams(scene, out, steps=4)
        assert hp["log.tensorboard"] is True  # shipped config default
        trainer = Trainer(hp)
        trainer.fit(sanity_val=False)
        tb_dir = os.path.join(out, "tb")
        events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
        assert events, f"no event files in {tb_dir}"
        assert os.path.getsize(os.path.join(tb_dir, events[0])) > 0
        assert os.path.exists(os.path.join(out, "metrics.jsonl"))

    def test_off_by_default_in_code(self, scene, tmp_path):
        """A key-less hparams dict (bare Trainer construction) must not
        create a writer or a tb/ directory."""
        from pano_nerf_tpu.engine.trainer import Trainer

        out = str(tmp_path / "exp_notb")
        os.makedirs(out, exist_ok=True)
        hp = small_hparams(scene, out, steps=2)
        del hp["log.tensorboard"]
        trainer = Trainer(hp)
        assert trainer._tb is None
        assert not os.path.exists(os.path.join(out, "tb"))


class TestNanRecovery:
    """Failure recovery: a non-finite loss restores the last checkpoint and
    continues with a re-rolled batch stream (train.nan_recovery); with the
    budget at 0 the abort-with-checkpoint-pointer behavior is preserved."""

    def _poisoning_trainer(self, scene, out, steps, poison_call,
                           poison_params=True):
        """poison_params=True simulates a real divergence (NaN in the
        state); False simulates a corrupted loss READBACK with a healthy
        state (the transient the triage path distinguishes)."""
        import jax
        import jax.numpy as jnp

        from pano_nerf_tpu.engine.trainer import Trainer

        hp = small_hparams(scene, out, steps=steps)
        hp["val.check_every_n_epoch"] = 0.002   # checkpoint every 2 steps
        hp["log_every_n_step"] = 1
        trainer = Trainer(hp)
        calls = {"n": 0}
        orig = trainer.system.make_train_step_device_data

        def make(dataset, enable_surf, batch_size, steps_per_call=1):
            fn = orig(dataset, enable_surf, batch_size,
                      steps_per_call=steps_per_call)

            def wrapped(state, key):
                state2, parts = fn(state, key)
                calls["n"] += 1
                if calls["n"] == poison_call:
                    parts = dict(parts)
                    parts["loss"] = jnp.float32(float("nan"))
                    if poison_params:
                        state2 = state2._replace(params=jax.tree.map(
                            lambda x: x * jnp.float32(float("nan")),
                            state2.params))
                return state2, parts
            return wrapped

        trainer.system.make_train_step_device_data = make
        return trainer, hp

    def test_recovers_from_checkpoint(self, scene, tmp_path):
        out = str(tmp_path / "exp")
        os.makedirs(out, exist_ok=True)
        trainer, _ = self._poisoning_trainer(scene, out, steps=8,
                                             poison_call=4)
        trainer.fit(sanity_val=False)
        with open(os.path.join(out, "metrics.jsonl")) as fp:
            records = [json.loads(l) for l in fp]
        rec = [r for r in records if r["kind"] == "nan_recovery"]
        assert len(rec) == 1
        assert rec[0]["restored_step"] == 2 and rec[0]["retry"] == 1
        # training continued to completion after the rewind
        assert trainer.ckpt.latest_step() == 8
        assert not [r for r in records if r["kind"] == "abort"]

    def test_false_alarm_continues(self, scene, tmp_path):
        """A non-finite loss READING with finite params on device is a
        transient readback — logged, no rewind, training completes."""
        out = str(tmp_path / "exp")
        os.makedirs(out, exist_ok=True)
        trainer, _ = self._poisoning_trainer(scene, out, steps=8,
                                             poison_call=4,
                                             poison_params=False)
        trainer.fit(sanity_val=False)
        with open(os.path.join(out, "metrics.jsonl")) as fp:
            records = [json.loads(l) for l in fp]
        assert [r for r in records if r["kind"] == "nan_false_alarm"]
        assert not [r for r in records if r["kind"] == "nan_recovery"]
        assert trainer.ckpt.latest_step() == 8
        # The false alarm landed ON a val boundary (step 4, val_every=2):
        # the scheduled checkpoint/validation must still run (regression:
        # an early `continue` skipped the block, letting the last-good
        # checkpoint lag a full val period behind).
        assert [r for r in records if r["kind"] == "val" and r["step"] == 4]

    def test_profiler_survives_rewind(self, scene, tmp_path):
        """A NaN rewind across the profiler window must not re-open the
        trace (start_trace while active raises and would kill the run the
        recovery was saving)."""
        out = str(tmp_path / "exp")
        os.makedirs(out, exist_ok=True)
        trainer, hp = self._poisoning_trainer(scene, out, steps=8,
                                              poison_call=4)
        hp["profile_dir"] = str(tmp_path / "trace")
        hp["profile_start_step"] = 2
        hp["profile_steps"] = 4
        trainer.fit(sanity_val=False)   # old code: double start_trace raises
        with open(os.path.join(out, "metrics.jsonl")) as fp:
            records = [json.loads(l) for l in fp]
        assert [r for r in records if r["kind"] == "nan_recovery"]
        assert trainer.ckpt.latest_step() == 8

    def test_abort_when_disabled(self, scene, tmp_path):
        out = str(tmp_path / "exp")
        os.makedirs(out, exist_ok=True)
        trainer, hp = self._poisoning_trainer(scene, out, steps=8,
                                              poison_call=4)
        hp["train.nan_recovery"] = 0
        with pytest.raises(FloatingPointError):
            trainer.fit(sanity_val=False)
        with open(os.path.join(out, "metrics.jsonl")) as fp:
            records = [json.loads(l) for l in fp]
        assert [r for r in records if r["kind"] == "abort"]


class TestCheckpointer:
    def test_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from pano_nerf_tpu.engine.checkpoint import Checkpointer

        state = {"step": jnp.asarray(7), "w": jnp.arange(12.0).reshape(3, 4)}
        ck = Checkpointer(str(tmp_path / "ck"))
        ck.save(7, jax.device_get(state), wait=True)
        restored = ck.restore(state)
        np.testing.assert_array_equal(np.asarray(restored["w"]),
                                      np.asarray(state["w"]))
        assert int(restored["step"]) == 7
        ck.close()


class TestMultiStepScan:
    def test_multi_step_equals_single_steps(self):
        """steps_per_call=K matches K single-step calls with the same key
        (same RNG stream: each inner step folds key with its own
        state.step). Equality is numerical, not bitwise — the scan body
        compiles separately from the unrolled program, so fp scheduling
        differs at the ~1e-6 level."""
        import jax
        import numpy as np

        from __graft_entry__ import _make_rays, _tiny_hparams
        from pano_nerf_tpu.data.pano_dataset import generate_lit_rays
        from pano_nerf_tpu.engine.system import PanoNeRFSystem
        from pano_nerf_tpu.parallel import mesh as mesh_lib

        hp = _tiny_hparams(16)
        system = PanoNeRFSystem(hp, mesh_lib.get_mesh(1))
        system.set_env_rays(generate_lit_rays(num=4, far=10.0))
        rng = np.random.default_rng(0)
        rays = _make_rays(256)
        rgbs = np.abs(rng.standard_normal((256, 3))).astype(np.float32)
        ds = system.put_dataset_on_device(rays, rgbs)

        key = jax.random.PRNGKey(7)
        s1 = system.create_state(jax.random.PRNGKey(0))
        f1 = system.make_train_step_device_data(ds, enable_surf=True,
                                                batch_size=16)
        for _ in range(3):
            s1, p1 = f1(s1, key)

        s3 = system.create_state(jax.random.PRNGKey(0))
        f3 = system.make_train_step_device_data(ds, enable_surf=True,
                                                batch_size=16,
                                                steps_per_call=3)
        s3, p3 = f3(s3, key)

        assert int(s3.step) == int(s1.step) == 3
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s3.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)
        # The scalar loss is chaotic at init (ReLU flips amplify the
        # ~1e-6 scheduling diffs over 3 sgd steps); the parameter check
        # above is the semantic guarantee.
        np.testing.assert_allclose(float(p1["loss"]), float(p3["loss"]),
                                   atol=0.05)


class TestRenderPathScript:
    def test_render_path_cli_with_video(self, scene, tmp_path, monkeypatch):
        """scripts/render_path.py renders a novel-view pose path from a
        checkpoint (EXR + PNG per frame) and stitches the --video GIF."""
        import importlib.util
        import sys as _sys

        from pano_nerf_tpu.engine.trainer import Trainer

        out = str(tmp_path / "panonerf_0_1_2")
        os.makedirs(out, exist_ok=True)
        hp = small_hparams(scene, out, steps=2)
        Trainer(hp).fit(sanity_val=False)

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        frames = str(tmp_path / "frames")
        video = str(tmp_path / "fly.gif")
        argv = ["render_path.py", "--data_path", scene, "--ckpt_dir", out,
                "--config", os.path.join(root, "configs", "panonerf.yaml"),
                "--out", frames, "--n_views", "6", "--video", video,
                "--out_dir", str(tmp_path / "exps"),
                "train.factor", "1", "val.factor", "1",
                "train.sample_num", "'n0_1_2'",
                "train.batch_size", "32", "train.precision", "f32",
                "nerf.num_samples", "4", "nerf.num_env_samples", "2",
                "nerf.num_ray_samples", "2", "optimizer.max_steps", "2",
                "val.check_every_n_epoch", "1000000",
                "val.chunk_size", "128", "parallel.num_devices", "2"]
        monkeypatch.setattr(_sys, "argv", argv)
        spec = importlib.util.spec_from_file_location(
            "render_path_script",
            os.path.join(root, "scripts", "render_path.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()

        written = sorted(f for f in os.listdir(frames)
                         if f.endswith(".exr"))
        assert len(written) >= 2, written
        for f in written:
            assert os.path.exists(
                os.path.join(frames, f.replace(".exr", ".png")))
        assert os.path.getsize(video) > 0


class TestEvalScript:
    def test_eval_cli_after_fit(self, scene, tmp_path, monkeypatch):
        """scripts/eval.py restores a checkpoint and reproduces the
        trainer's validation pass offline: eval_<step>/ product tree plus
        a kind="eval" metrics record, without touching val_<step>/."""
        import importlib.util
        import json
        import sys as _sys

        from pano_nerf_tpu.engine.trainer import Trainer

        out = str(tmp_path / "panonerf_0_1_2")
        os.makedirs(out, exist_ok=True)
        hp = small_hparams(scene, out, steps=2)
        Trainer(hp).fit(sanity_val=False)

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        argv = ["eval.py", "--data_path", scene, "--ckpt_dir", out,
                "--config", os.path.join(root, "configs", "panonerf.yaml"),
                "--max_images", "1",
                "train.factor", "1", "val.factor", "1",
                "train.sample_num", "'n0_1_2'",
                "train.batch_size", "32", "train.precision", "f32",
                "nerf.num_samples", "4", "nerf.num_env_samples", "2",
                "nerf.num_ray_samples", "2", "optimizer.max_steps", "2",
                "val.check_every_n_epoch", "1000000",
                "val.chunk_size", "128", "parallel.num_devices", "2"]
        monkeypatch.setattr(_sys, "argv", argv)
        spec = importlib.util.spec_from_file_location(
            "eval_script", os.path.join(root, "scripts", "eval.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()

        eval_dir = os.path.join(out, "eval_000002")
        assert os.path.isdir(os.path.join(eval_dir, "pred_hdr"))
        assert os.path.isdir(os.path.join(eval_dir, "gt_hdr"))
        records = [json.loads(line)
                   for line in open(os.path.join(out, "metrics.jsonl"))]
        evals = [r for r in records if r.get("kind") == "eval"]
        assert len(evals) == 1 and evals[0]["step"] == 2
        assert "psnr_hdr_vol" in evals[0] and "psnr_ldr_vol" in evals[0]
