"""Worker process for tests/test_multihost.py: one rank of a real
2-process jax.distributed CPU world running a Pano-NeRF train step.

Covers the multi-host branches that are dead in single-process tests:
train.maybe_init_distributed (train.py), the `process_count() > 1` paths of
parallel/mesh.py (`shard_batch` via make_array_from_process_local_data and
multi-host `replicate`).

Usage (spawned by the test with PANO_NERF_MULTIHOST/COORD/NPROCS/PROC_ID
and XLA_FLAGS=--xla_force_host_platform_device_count=2 in the env):
    python tests/multihost_worker.py
Prints "RESULT {json}" on success.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import train as train_mod  # noqa: E402


def main():
    assert train_mod.maybe_init_distributed(), "distributed init did not run"
    pid = jax.process_index()
    nproc = jax.process_count()
    assert nproc == 2, nproc
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    from __graft_entry__ import _make_rays, _tiny_hparams
    from pano_nerf_tpu.core.rays import rays_map
    from pano_nerf_tpu.data.pano_dataset import generate_lit_rays
    from pano_nerf_tpu.engine.system import PanoNeRFSystem
    from pano_nerf_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.get_mesh()
    system = PanoNeRFSystem(_tiny_hparams(8), mesh)
    system.set_env_rays(generate_lit_rays(num=4, far=10.0))
    state = system.create_state(jax.random.PRNGKey(0))
    step = system.make_train_step(enable_surf=True)

    # Global batch of 8 rays; this process contributes rows [4*pid, 4*pid+4).
    rays = _make_rays(8)
    rng = np.random.default_rng(0)
    rgbs = np.abs(rng.standard_normal((8, 3))).astype(np.float32)
    lo, hi = 4 * pid, 4 * pid + 4
    local = (rays_map(lambda x: np.asarray(x)[lo:hi], rays), rgbs[lo:hi])
    batch = system.shard_batch(local)
    assert batch[1].shape == (8, 3), batch[1].shape  # global shape

    state, parts = step(state, batch, jax.random.PRNGKey(1))
    loss = float(jax.device_get(parts["loss"]))
    assert np.isfinite(loss), loss

    # Device-resident production path under the multi-process world
    # (VERDICT r2 #5): put_dataset_on_device replicates the flattened ray
    # set via the process-local branch of parallel/mesh.py:57-73, and the
    # jitted step samples its batch on device. Every rank holds identical
    # data, so the sampled batches and losses must agree across ranks.
    ds_rays = _make_rays(64, seed=3)
    ds_rgbs = np.abs(np.random.default_rng(3).standard_normal(
        (64, 3))).astype(np.float32)
    dataset = system.put_dataset_on_device(ds_rays, ds_rgbs)
    dstep = system.make_train_step_device_data(dataset, enable_surf=True,
                                               batch_size=8)
    dstate = system.create_state(jax.random.PRNGKey(0))
    dstate, dparts = dstep(dstate, jax.random.PRNGKey(2))
    dloss = float(jax.device_get(dparts["loss"]))
    assert np.isfinite(dloss), dloss

    # Multi-step scan dispatch (production default steps_per_call=8)
    # under the multi-process world: the scanned executable must compile
    # over the global mesh and agree across ranks like the single step.
    sstep = system.make_train_step_device_data(dataset, enable_surf=True,
                                               batch_size=8,
                                               steps_per_call=2)
    sstate = system.create_state(jax.random.PRNGKey(0))
    sstate, sparts = sstep(sstate, jax.random.PRNGKey(2))
    sloss = float(jax.device_get(sparts["loss"]))
    assert np.isfinite(sloss), sloss

    # Sharded evaluation across the 2-process mesh: the chunk renderer
    # shard_maps over the global data axis (engine/system.py::_chunked,
    # chunk 8 over 4 devices -> 2 rays/device), every rank reading back
    # the (replicated-output) fine rgb mean for cross-rank agreement.
    system.val_chunk_size = 8
    render = system.make_render_image(enable_surf=True)
    rout = render(dstate.params, _make_rays(16, seed=5))
    rmean = float(jax.device_get(jax.numpy.mean(rout["rgb_fine"])))
    assert np.isfinite(rmean), rmean

    print("RESULT " + json.dumps({"pid": pid, "loss": loss,
                                  "device_data_loss": dloss,
                                  "scan_loss": sloss,
                                  "render_mean": rmean}), flush=True)


if __name__ == "__main__":
    main()
