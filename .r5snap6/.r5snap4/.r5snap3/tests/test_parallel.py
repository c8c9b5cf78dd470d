"""Multi-device SPMD tests on the 8-device virtual CPU mesh.

The fake-backend substitute for multi-chip hardware (SURVEY.md §4): the full
Pano-NeRF train step is jitted over a data-parallel mesh and must produce
the same result as single-device execution (gradient psum over the batch is
mathematically invisible).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_rays

from pano_nerf_tpu.core.rays import Rays
from pano_nerf_tpu.data.pano_dataset import generate_lit_rays
from pano_nerf_tpu.parallel import mesh as mesh_lib


def tiny_hparams(batch):
    import __graft_entry__ as ge
    return ge._tiny_hparams(batch)


@pytest.fixture(scope="module")
def built():
    from pano_nerf_tpu.engine.system import PanoNeRFSystem

    batch = 32
    hp = tiny_hparams(batch)
    hp["train.precision"] = "f32"

    def build(n_dev):
        mesh = mesh_lib.get_mesh(n_dev)
        system = PanoNeRFSystem(hp, mesh)
        system.set_env_rays(generate_lit_rays(num=4, far=10.0))
        state = system.create_state(jax.random.PRNGKey(0))
        return system, state

    return batch, build


class TestMesh:
    def test_eight_devices_available(self):
        assert len(jax.devices()) == 8

    def test_batch_sharded_over_mesh(self, built):
        batch, build = built
        system, _ = build(8)
        rays = make_rays(batch)
        sharded = system.shard_batch((rays,))[0]
        sh = sharded.origins.sharding
        assert sh.num_devices == 8
        # Leading axis split: each device holds batch/8 rays.
        shard_shape = sh.shard_shape(sharded.origins.shape)
        assert shard_shape == (batch // 8, 3)

    def test_state_replicated(self, built):
        _, build = built
        system, state = build(8)
        k = state.params["params"]["trunk_0"]["kernel"]
        assert k.sharding.is_fully_replicated


class TestSPMDTrainStep:
    def test_multi_device_matches_single(self, built):
        """One train step on 8 devices == the same step on 1 device."""
        batch, build = built
        rays = make_rays(batch)
        rgbs = np.abs(np.random.default_rng(0).standard_normal(
            (batch, 3))).astype(np.float32)
        key = jax.random.PRNGKey(7)

        results = {}
        for n_dev in (1, 8):
            system, state = build(n_dev)
            step = system.make_train_step(enable_surf=True)
            b = system.shard_batch((rays, rgbs))
            state, parts = step(state, b, key)
            results[n_dev] = (
                np.asarray(jax.device_get(parts["loss"])),
                np.asarray(jax.device_get(
                    state.params["params"]["trunk_0"]["kernel"])))

        np.testing.assert_allclose(results[1][0], results[8][0], rtol=1e-5)
        np.testing.assert_allclose(results[1][1], results[8][1], atol=1e-6)

    def test_multiple_steps_stay_finite(self, built):
        batch, build = built
        system, state = build(8)
        step = system.make_train_step(enable_surf=True)
        rng = np.random.default_rng(1)
        key = jax.random.PRNGKey(3)
        for i in range(3):
            rays = make_rays(batch, key=i)
            rgbs = np.abs(rng.standard_normal((batch, 3))).astype(np.float32)
            b = system.shard_batch((rays, rgbs))
            state, parts = step(state, b, key)
        assert np.isfinite(float(jax.device_get(parts["loss"])))
        assert int(jax.device_get(state.step)) == 3


class TestSPMDEval:
    def test_sharded_render_matches_single_device(self, built):
        """The chunk renderer shard_maps each chunk over the data axis on
        a multi-device mesh; rays are per-ray independent, so the sharded
        render must match single-device bit-for-bit-close."""
        batch, build = built
        n = 48  # 3 chunks of 16 with chunk_size below
        rays = make_rays(n)

        outs = {}
        for n_dev in (1, 8):
            system, state = build(n_dev)
            system.val_chunk_size = 16  # 16 % 8 == 0 -> shard_map engages
            render = system.make_render_image(enable_surf=True)
            outs[n_dev] = jax.device_get(render(state.params, rays))

        assert set(outs[1]) == set(outs[8])
        for k in outs[1]:
            # Per-device matmul shapes change the CPU backend's reduction
            # tiling, so FMA order differs by ~1e-7; the normals chain
            # amplifies that to ~1e-5 (measured). Logic parity, float
            #-order noise.
            np.testing.assert_allclose(outs[1][k], outs[8][k], atol=1e-4,
                                       err_msg=k)

    def test_indivisible_chunk_falls_back(self, built):
        """chunk_size not divisible by the device count renders unsharded
        (correctness over scaling) instead of erroring."""
        batch, build = built
        system, state = build(8)
        system.val_chunk_size = 12  # 12 % 8 != 0
        render = system.make_render_image(enable_surf=True)
        out = jax.device_get(render(state.params, make_rays(24)))
        assert np.isfinite(out["rgb_fine"]).all()


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        assert out[0].shape == (64, 3)
