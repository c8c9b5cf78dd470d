"""Config-system tests: dot-key flattening, literal_eval coercion, merge
precedence — the reference's exact semantics (configs/config.py)."""

import os

import pytest
import yaml

from pano_nerf_tpu.core import config as cfg


@pytest.fixture
def tmp_yaml(tmp_path):
    def write(name, data):
        p = str(tmp_path / name)
        with open(p, "w") as fp:
            yaml.safe_dump(data, fp)
        return p
    return write


class TestParsing:
    def test_nested_to_dot_keys(self, tmp_yaml):
        p = tmp_yaml("a.yaml", {"nerf": {"mlp": {"net_width": 256}}})
        assert cfg.load(p) == {"nerf.mlp.net_width": 256}

    def test_literal_eval_coercion(self, tmp_yaml):
        p = tmp_yaml("a.yaml", {
            "a": "None", "b": "2e-4", "c": "[1, 2]", "d": "plain_string"})
        got = cfg.load(p)
        assert got["a"] is None
        assert got["b"] == 2e-4
        assert got["c"] == (1, 2)  # lists become tuples
        assert got["d"] == "plain_string"

    def test_ture_typo_stays_truthy(self, tmp_yaml):
        """The reference's shipped configs contain `append_identity: Ture`
        (configs/panonerf.yaml:44); literal_eval fails and the truthy string
        survives. Behavior preserved."""
        p = tmp_yaml("a.yaml", {"nerf": {"append_identity": "Ture"}})
        got = cfg.load(p)
        assert got["nerf.append_identity"] == "Ture"
        assert bool(got["nerf.append_identity"]) is True


class TestBaseInheritance:
    def test_base_overlay(self, tmp_yaml):
        tmp_yaml("base.yaml", {"nerf": {"num_samples": 64, "lr": "2e-4"}})
        p = tmp_yaml("preset.yaml",
                     {"_base_": "base.yaml", "nerf": {"num_samples": 32}})
        got = cfg.load(p)
        assert got["nerf.num_samples"] == 32      # preset wins
        assert got["nerf.lr"] == 2e-4             # base key survives
        assert "_base_" not in got                # key is consumed

    def test_base_chain(self, tmp_yaml):
        tmp_yaml("a.yaml", {"x": 1, "y": 1, "z": 1})
        tmp_yaml("b.yaml", {"_base_": "a.yaml", "y": 2, "z": 2})
        p = tmp_yaml("c.yaml", {"_base_": "b.yaml", "z": 3})
        assert cfg.load(p) == {"x": 1, "y": 2, "z": 3}

    def test_base_cycle_bounded(self, tmp_yaml):
        tmp_yaml("a.yaml", {"_base_": "b.yaml"})
        p = tmp_yaml("b.yaml", {"_base_": "a.yaml"})
        with pytest.raises(ValueError, match="too deep"):
            cfg.load(p)

    def test_shipped_hdr_preset_resolves(self):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        got = cfg.load(os.path.join(repo, "configs", "panonerf_hdr.yaml"))
        base = cfg.load(os.path.join(repo, "configs", "panonerf.yaml"))
        assert got["nerf.env_tight_chroma"] is True
        assert got["nerf.env_tight_rgb"] == 0.01
        # The full etc_chromic composition shipped after the box/wall
        # gates + duo_cool seed matrix came back green (NOTES.md).
        assert got["loss.chrom_illum_comp"] is True
        # The preset PINS the pre-round-5 schedule (the default flipped
        # to 1e-3/5e-6, which measurably weakens this preset's HDR edge
        # on the flagship scene — NOTES.md round-4 lr matrix).
        assert got["optimizer.lr_init"] == 2e-4
        assert got["optimizer.lr_final"] == 2e-5
        # Everything else is the production recipe.
        skip = {"nerf.env_tight_chroma", "nerf.env_tight_rgb",
                "loss.chrom_illum_comp", "optimizer.lr_init",
                "optimizer.lr_final"}
        for k, v in base.items():
            if k not in skip:
                assert got[k] == v, k

    def test_shipped_shadow_preset_resolves(self):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        got = cfg.load(os.path.join(repo, "configs", "panonerf_shadow.yaml"))
        hdr = cfg.load(os.path.join(repo, "configs", "panonerf_hdr.yaml"))
        # The occlusion recipe = hdr preset + the anneal-off distill tie
        # (round-4 schedule study: on from step 0, zero by 85%).
        assert got["nerf.env_distill_samples"] == 16
        assert got["loss.env_distill"] == 0.1
        assert got["loss.env_distill_end"] == 0.7
        assert got["loss.env_distill_fall"] == 0.15
        # Round-5: ort_tie_boost deliberately NOT in the preset (the x3
        # seed matrix measured a -3.2 dB worst-seed LDR cost — it ships
        # as a documented per-run knob instead).
        assert got["loss.ort_tie_boost"] == 0.0
        skip = {"nerf.env_distill_samples", "loss.env_distill",
                "loss.env_distill_end", "loss.env_distill_fall"}
        for k, v in hdr.items():
            if k not in skip:
                assert got[k] == v, k

    def test_shipped_fast_preset_resolves(self):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        got = cfg.load(os.path.join(repo, "configs", "panonerf_fast.yaml"))
        base = cfg.load(os.path.join(repo, "configs", "panonerf.yaml"))
        # Hot start + finer finish (round-4 lr1e3/lr1e3f gates).
        assert got["optimizer.lr_init"] == 1e-3
        assert got["optimizer.lr_final"] == 5e-6
        for k, v in base.items():
            if k not in ("optimizer.lr_init", "optimizer.lr_final"):
                assert got[k] == v, k


class TestMerging:
    def test_file_then_opts_precedence(self, tmp_yaml):
        base = tmp_yaml("base.yaml", {"train": {"batch_size": 512, "x": 1}})
        config = cfg.load(base)
        cfg.merge_from_list(config, ["train.batch_size", "1024"])
        assert config["train.batch_size"] == 1024
        assert config["train.x"] == 1

    def test_merge_list_requires_pairs(self):
        with pytest.raises(AssertionError):
            cfg.merge_from_list({}, ["only_key"])

    def test_unknown_key_warns_but_proceeds(self, capsys):
        config = {"a": 1}
        cfg.merge_from_config(config, {"new_key": 2}, check=True)
        assert config["new_key"] == 2
        assert "[Error]" in capsys.readouterr().out

    def test_load_config_roundtrip(self):
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        hp = cfg.load_config(os.path.join(root, "configs", "panonerf.yaml"))
        assert hp["nerf.mlp_name"] == "panonerf"
        assert hp["train.batch_size"] == 512
        # Round-5 default flip: hot start, finer finish (NOTES.md round-5
        # flip matrix — all 9 cells green).
        assert hp["optimizer.lr_init"] == 1e-3
        assert hp["optimizer.lr_final"] == 5e-6
        assert hp["checkpoint.resume_path"] is None

    def test_cli_overrides(self):
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        hp = cfg.load_config(os.path.join(root, "configs", "mipnerf.yaml"),
                             ["optimizer.max_steps", "100",
                              "train.sample_num", "'n1_2'"])
        assert hp["optimizer.max_steps"] == 100
        assert hp["train.sample_num"] == "n1_2"


class TestTrainPrep:
    def test_sample_num_parsing_and_surface_fraction(self):
        import train as train_mod

        hp = {"seed": 0, "train.sample_num": "n45_46_72",
              "nerf.mlp_name": "panonerf", "train.surface_start_step": 0.4,
              "optimizer.max_steps": 1000, "out_dir": "/tmp/x_testprep"}
        hp = train_mod.prepare_hparams(hp)
        assert hp["train.sample_num"] == [45, 46, 72]
        assert hp["train.surface_start_step"] == 400
        assert hp["exp_name"] == "panonerf_45_46_72"
