"""Reference-checkpoint import: torch MLP weights -> flax NerfMLP params.

Instantiates the ACTUAL reference modules (models/pano_mip_nerf.py MLP,
models/mip_nerf.py PureMLP) with random torch init, converts their
state_dict through pano_nerf_tpu.utils.import_torch, and asserts the flax
forward reproduces the torch forward on identical inputs — the property a
migrating user needs. Also covers the loud-failure contract on topology
mismatch and the CLI's end-to-end orbax round trip.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"

for _name in ("OpenEXR", "Imath"):
    if _name not in sys.modules:
        stub = types.ModuleType(_name)
        stub.InputFile = stub.OutputFile = stub.Header = object
        stub.PixelType = type("PixelType", (), {"FLOAT": 2, "HALF": 1,
                                                "__init__": lambda s, t: None})
        sys.modules[_name] = stub
sys.path.insert(0, REFERENCE)
try:
    ref_pano = pytest.importorskip("models.pano_mip_nerf")
    ref_mip = pytest.importorskip("models.mip_nerf")
finally:
    sys.path.remove(REFERENCE)

import jax
import jax.numpy as jnp

from pano_nerf_tpu.models.mlp import NerfMLP
from pano_nerf_tpu.utils.import_torch import (convert_mlp_state_dict,
                                              find_mlp_prefix)

# Reference production topology (configs/panonerf.yaml nerf.mlp.*):
# xyz 96 = (16-0)*3*2, view 27 = 4*3*2 + 3 identity lanes.
XYZ_DIM, VIEW_DIM = 96, 27


def _numpy_sd(module, prefix=""):
    return {prefix + k: v.detach().numpy()
            for k, v in module.state_dict().items()}


def _flax_equiv(num_rgb, num_density):
    return NerfMLP(num_rgb_channels=num_rgb,
                   num_density_channels=num_density)


def _assert_forward_parity(torch_mlp, num_rgb, num_density, prefix=""):
    rng = np.random.default_rng(20260818)
    x = rng.normal(size=(4, 11, XYZ_DIM)).astype(np.float32)
    v = rng.normal(size=(4, VIEW_DIM)).astype(np.float32)

    mlp = _flax_equiv(num_rgb, num_density)
    template = mlp.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(v)[:, None, :])
    params = convert_mlp_state_dict(_numpy_sd(torch_mlp, prefix), template)

    with torch.no_grad():
        t_rgb, t_density = torch_mlp(torch.as_tensor(x), torch.as_tensor(v))
    j_rgb, j_density = mlp.apply(params, jnp.asarray(x),
                                 jnp.asarray(v)[:, None, :])
    np.testing.assert_allclose(np.asarray(j_rgb), t_rgb.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_density), t_density.numpy(),
                               rtol=1e-5, atol=1e-5)


class TestConversionParity:
    def test_pano_mlp(self):
        torch.manual_seed(0)
        m = ref_pano.MLP(net_depth=8, net_width=256, net_depth_condition=1,
                         net_width_condition=128, skip_index=4,
                         num_rgb_channels=3, num_density_channels=5,
                         activation="relu", xyz_dim=XYZ_DIM,
                         view_dim=VIEW_DIM)
        _assert_forward_parity(m, num_rgb=3, num_density=5)

    def test_pure_mlp(self):
        torch.manual_seed(1)
        m = ref_mip.PureMLP(net_depth=8, net_width=256,
                            net_depth_condition=1, net_width_condition=128,
                            skip_index=4, num_rgb_channels=3,
                            num_density_channels=1, activation="relu",
                            xyz_dim=XYZ_DIM, view_dim=VIEW_DIM)
        _assert_forward_parity(m, num_rgb=3, num_density=1)

    def test_lightning_prefix(self):
        """Keys as a Lightning checkpoint carries them (mip_nerf.mlp.*)."""
        torch.manual_seed(2)
        m = ref_pano.MLP(net_depth=8, net_width=256, net_depth_condition=1,
                         net_width_condition=128, skip_index=4,
                         num_rgb_channels=3, num_density_channels=5,
                         activation="relu", xyz_dim=XYZ_DIM,
                         view_dim=VIEW_DIM)
        sd = _numpy_sd(m, prefix="mip_nerf.mlp.")
        assert find_mlp_prefix(sd) == "mip_nerf.mlp."
        _assert_forward_parity(m, num_rgb=3, num_density=5,
                               prefix="mip_nerf.mlp.")


class TestFailureModes:
    def _sd_and_template(self, num_density_ref, num_density_target):
        torch.manual_seed(3)
        m = ref_pano.MLP(net_depth=8, net_width=256, net_depth_condition=1,
                         net_width_condition=128, skip_index=4,
                         num_rgb_channels=3,
                         num_density_channels=num_density_ref,
                         activation="relu", xyz_dim=XYZ_DIM,
                         view_dim=VIEW_DIM)
        mlp = _flax_equiv(3, num_density_target)
        template = mlp.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 1, XYZ_DIM)),
                            jnp.zeros((1, 1, VIEW_DIM)))
        return _numpy_sd(m), template

    def test_head_mismatch_raises(self):
        """A 5-channel reference head cannot feed an emissive (8-ch) model."""
        sd, template = self._sd_and_template(5, 8)
        with pytest.raises(ValueError, match="emissive_head|topology"):
            convert_mlp_state_dict(sd, template)

    def test_missing_tensor_raises(self):
        sd, template = self._sd_and_template(5, 5)
        del sd["color_layer.bias"]
        with pytest.raises(ValueError, match="missing tensor"):
            convert_mlp_state_dict(sd, template)

    def test_not_an_mlp_raises(self):
        with pytest.raises(ValueError, match="not a.*reference MLP"):
            find_mlp_prefix({"foo.weight": np.zeros((2, 2))})


class TestExport:
    def test_export_roundtrips_and_loads_into_reference(self):
        """export_mlp_state_dict emits reference-named tensors that (a)
        round-trip bit-exactly through convert_mlp_state_dict and (b)
        load_state_dict into the actual reference torch MLP with forward
        parity."""
        mlp = _flax_equiv(3, 5)
        params = mlp.init(jax.random.PRNGKey(7),
                          jnp.zeros((1, 1, XYZ_DIM)),
                          jnp.zeros((1, 1, VIEW_DIM)))
        from pano_nerf_tpu.utils.import_torch import export_mlp_state_dict
        sd = export_mlp_state_dict(params)
        assert all(k.startswith("mip_nerf.mlp.") for k in sd)

        back = convert_mlp_state_dict(sd, params)
        for mod, leaves in params["params"].items():
            for leaf in leaves:
                np.testing.assert_array_equal(
                    np.asarray(leaves[leaf]), back["params"][mod][leaf])

        m = ref_pano.MLP(net_depth=8, net_width=256, net_depth_condition=1,
                         net_width_condition=128, skip_index=4,
                         num_rgb_channels=3, num_density_channels=5,
                         activation="relu", xyz_dim=XYZ_DIM,
                         view_dim=VIEW_DIM)
        m.load_state_dict({k[len("mip_nerf.mlp."):]: torch.as_tensor(v)
                           for k, v in sd.items()})
        rng = np.random.default_rng(7)
        x = rng.normal(size=(3, 9, XYZ_DIM)).astype(np.float32)
        v = rng.normal(size=(3, VIEW_DIM)).astype(np.float32)
        with torch.no_grad():
            t_rgb, t_density = m(torch.as_tensor(x), torch.as_tensor(v))
        j_rgb, j_density = mlp.apply(params, jnp.asarray(x),
                                     jnp.asarray(v)[:, None, :])
        np.testing.assert_allclose(np.asarray(j_rgb), t_rgb.numpy(),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(j_density), t_density.numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_export_cli(self, tmp_path):
        """CLI: orbax checkpoint -> .ckpt that the import CLI accepts."""
        import subprocess
        env_root = "/root/repo"
        # Build a real orbax checkpoint via the import CLI first (fast).
        torch.manual_seed(6)
        m = ref_pano.MLP(net_depth=8, net_width=256, net_depth_condition=1,
                         net_width_condition=128, skip_index=4,
                         num_rgb_channels=3, num_density_channels=5,
                         activation="relu", xyz_dim=XYZ_DIM,
                         view_dim=VIEW_DIM)
        src = tmp_path / "src.ckpt"
        torch.save({"state_dict": {f"mip_nerf.mlp.{k}": v for k, v
                                   in m.state_dict().items()}}, src)
        res = subprocess.run(
            [sys.executable, f"{env_root}/scripts/import_reference_ckpt.py",
             "--torch_ckpt", str(src), "--out_dir", str(tmp_path / "exps"),
             "--config", f"{env_root}/configs/panonerf.yaml"],
            capture_output=True, text=True, cwd=env_root)
        assert res.returncode == 0, res.stderr[-2000:]
        import json
        exp_dir = os.path.dirname(
            json.loads(res.stdout.strip().splitlines()[-1])["ckpt_dir"])

        out_ckpt = tmp_path / "exported.ckpt"
        res = subprocess.run(
            [sys.executable, f"{env_root}/scripts/export_reference_ckpt.py",
             "--ckpt_dir", exp_dir, "--out", str(out_ckpt),
             "--out_dir", str(tmp_path / "exps2"),
             "--config", f"{env_root}/configs/panonerf.yaml"],
            capture_output=True, text=True, cwd=env_root)
        assert res.returncode == 0, res.stderr[-2000:]
        blob = torch.load(out_ckpt, map_location="cpu", weights_only=False)
        want = m.state_dict()["color_layer.weight"].numpy()
        got = blob["state_dict"]["mip_nerf.mlp.color_layer.weight"].numpy()
        np.testing.assert_array_equal(got, want)
        assert blob["hyper_parameters"]["nerf.mlp_name"] == "panonerf"


class TestCliRoundTrip:
    def test_import_then_restore(self, tmp_path):
        """CLI writes an orbax checkpoint that restores into create_state's
        template with the converted weights intact."""
        torch.manual_seed(4)
        m = ref_pano.MLP(net_depth=8, net_width=256, net_depth_condition=1,
                         net_width_condition=128, skip_index=4,
                         num_rgb_channels=3, num_density_channels=5,
                         activation="relu", xyz_dim=XYZ_DIM,
                         view_dim=VIEW_DIM)
        ckpt_path = tmp_path / "last.ckpt"
        torch.save({"state_dict": {f"mip_nerf.mlp.{k}": v for k, v
                                   in m.state_dict().items()}}, ckpt_path)

        import subprocess
        out_dir = tmp_path / "exps"
        env_root = "/root/repo"
        res = subprocess.run(
            [sys.executable, f"{env_root}/scripts/import_reference_ckpt.py",
             "--torch_ckpt", str(ckpt_path), "--out_dir", str(out_dir),
             "--config", f"{env_root}/configs/panonerf.yaml"],
            capture_output=True, text=True, cwd=env_root)
        assert res.returncode == 0, res.stderr[-2000:]

        import json
        rec = json.loads(res.stdout.strip().splitlines()[-1])
        assert rec["step"] == 0

        # Restore through the normal path and spot-check one tensor.
        from pano_nerf_tpu.engine.checkpoint import Checkpointer
        from pano_nerf_tpu.engine.system import build_system
        from pano_nerf_tpu.core.config import load_config
        from train import prepare_hparams
        hparams = load_config(f"{env_root}/configs/panonerf.yaml")
        hparams.update(out_dir=str(out_dir), torch_ckpt=str(ckpt_path))
        hparams = prepare_hparams(hparams)
        system = build_system(hparams)
        state = system.create_state(jax.random.PRNGKey(0))
        restored = Checkpointer(rec["ckpt_dir"]).restore(
            jax.device_get(state), step=0)
        got = np.asarray(restored.params["params"]["color"]["kernel"])
        want = m.state_dict()["color_layer.weight"].numpy().T
        np.testing.assert_allclose(got, want, rtol=0, atol=0)

    def test_auto_topology_from_hyper_parameters(self, tmp_path):
        """A Lightning ckpt carries the reference run's full dot-key config
        (save_hyperparameters, systems/base_system.py:12); the importer
        must adopt its nerf.* keys, so a mipnerf checkpoint imports
        correctly even when the CLI points at the panonerf config."""
        torch.manual_seed(5)
        m = ref_mip.PureMLP(net_depth=8, net_width=256,
                            net_depth_condition=1, net_width_condition=128,
                            skip_index=4, num_rgb_channels=3,
                            num_density_channels=1, activation="relu",
                            xyz_dim=XYZ_DIM, view_dim=VIEW_DIM)
        ckpt_path = tmp_path / "mip_last.ckpt"
        torch.save({
            "state_dict": {f"mip_nerf.mlp.{k}": v
                           for k, v in m.state_dict().items()},
            "hyper_parameters": {"nerf.mlp_name": "mipnerf",
                                 "nerf.mlp.num_density_channels": 1},
        }, ckpt_path)

        import subprocess
        env_root = "/root/repo"
        res = subprocess.run(
            [sys.executable, f"{env_root}/scripts/import_reference_ckpt.py",
             "--torch_ckpt", str(ckpt_path),
             "--out_dir", str(tmp_path / "exps"),
             "--config", f"{env_root}/configs/panonerf.yaml"],
            capture_output=True, text=True, cwd=env_root)
        assert res.returncode == 0, res.stderr[-2000:]
        assert "adopted" in res.stdout
        # The experiment dir is named after the ADOPTED model family.
        import json
        rec = json.loads(res.stdout.strip().splitlines()[-1])
        assert "mipnerf" in rec["ckpt_dir"]
