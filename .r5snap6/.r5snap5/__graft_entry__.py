"""Driver entry points: single-chip compile check + multi-chip dry run.

`entry()` returns a jittable flagship forward (PanoMipNeRF fine+surface path)
with example args. `dryrun_multichip(n)` jits the FULL Pano-NeRF training
step over an n-device data mesh and executes one step on tiny shapes.
"""

import numpy as np


def _tiny_hparams(batch_size=32):
    return {
        "seed": 0,
        "train.batch_size": batch_size,
        "train.randomized": True,
        "train.white_bkgd": False,
        "train.precision": "bf16",
        "val.randomized": False,
        "val.chunk_size": 32,
        "nerf.mlp_name": "panonerf",
        "nerf.num_env_samples": 4,
        "nerf.num_ray_samples": 4,
        "nerf.num_samples": 8,
        "nerf.num_levels": 2,
        "nerf.resample_padding": 0.01,
        "nerf.stop_resample_grad": True,
        "nerf.use_viewdirs": True,
        "nerf.disparity": False,
        "nerf.ray_shape": "cone",
        "nerf.min_deg_point": 0,
        "nerf.max_deg_point": 16,
        "nerf.deg_view": 4,
        "nerf.density_activation": "softplus",
        "nerf.density_noise": 0.0,
        "nerf.density_bias": -1.0,
        "nerf.rgb_activation": "softplus",
        "nerf.alb_activation": "sigmoid",
        "nerf.rgb_padding": 0,
        "nerf.disable_integration": False,
        "nerf.append_identity": True,
        "nerf.mlp.num_density_channels": 5,
        "nerf.mlp.net_depth": 8,
        "nerf.mlp.net_width": 256,
        "nerf.mlp.net_depth_condition": 1,
        "nerf.mlp.net_width_condition": 128,
        "nerf.mlp.net_activation": "relu",
        "nerf.mlp.skip_index": 4,
        "nerf.mlp.num_rgb_channels": 3,
        "optimizer.lr_init": 2e-4,
        "optimizer.lr_final": 2e-5,
        "optimizer.lr_delay_steps": 120,
        "optimizer.lr_delay_mult": 0.01,
        "optimizer.max_steps": 100,
        "loss.coarse_loss_mult": 0.1,
        "loss.surface_loss": 1,
        "loss.ort_loss": 0.1,
        "loss.chrom_loss": 0.1,
    }


def _make_rays(n, seed=0):
    import jax.numpy as jnp

    from pano_nerf_tpu.core.rays import Rays

    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    return Rays(
        origins=jnp.zeros((n, 3)),
        directions=jnp.asarray(d),
        viewdirs=jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True)),
        radii=jnp.full((n, 1), 0.01),
        lossmult=jnp.ones((n, 1)),
        near=jnp.zeros((n, 1)),
        far=jnp.full((n, 1), 10.0),
        noise_var=jnp.zeros((n, 1)),
    )


def entry():
    """(fn, example_args) — jittable forward step of the flagship model."""
    import jax

    from pano_nerf_tpu.models.pano_mip_nerf import PanoMipNeRF

    model = PanoMipNeRF(num_samples=16, num_env_samples=4)
    params = model.init(jax.random.PRNGKey(0))
    rays = _make_rays(64)
    env_rays = _make_rays(4, seed=1)
    env_rays = env_rays._replace(
        origins=env_rays.origins * 0,
        lossmult=env_rays.lossmult * (4 * np.pi / 4))
    key = jax.random.PRNGKey(1)

    def fn(params, key, rays, env_rays):
        outs = model(params, key, rays, env_rays, randomized=True,
                     white_bkgd=False, enable_surf=True, use_ort_loss=True)
        fine = outs[-1]
        return fine.rgb, fine.distance, fine.normal, fine.surf_rgb

    return fn, (params, key, rays, env_rays)


def dryrun_multichip(n_devices: int) -> None:
    """Jit + run ONE full Pano-NeRF train step over an n-device data mesh."""
    import jax

    from pano_nerf_tpu.data.pano_dataset import generate_lit_rays
    from pano_nerf_tpu.engine.system import PanoNeRFSystem
    from pano_nerf_tpu.parallel import mesh as mesh_lib

    try:
        # Standalone fallback: force an n-device virtual CPU platform. Only
        # possible before any backend is initialized; harmless no-op failure
        # otherwise (the driver environment provides the devices).
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n_devices)
    except RuntimeError:
        pass
    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")
    mesh = mesh_lib.get_mesh(n_devices)

    batch = 8 * n_devices
    hp = _tiny_hparams(batch)
    system = PanoNeRFSystem(hp, mesh)
    system.set_env_rays(generate_lit_rays(num=4, far=10.0))

    state = system.create_state(jax.random.PRNGKey(0))
    step_fn = system.make_train_step(enable_surf=True)

    rays = _make_rays(batch)
    rgbs = np.abs(np.random.default_rng(0).standard_normal(
        (batch, 3))).astype(np.float32)
    batch_tree = system.shard_batch((rays, rgbs))

    state, parts = step_fn(state, batch_tree, jax.random.PRNGKey(2))
    jax.block_until_ready(state.params)
    loss = float(jax.device_get(parts["loss"]))
    assert np.isfinite(loss), f"non-finite loss {loss}"

    # Further passes: every opt-in recipe family compiles + executes one
    # sharded step on the same mesh. Each entry adds structurally
    # different graph pieces (gathers, bottleneck re-queries, extra head
    # channels, step-scheduled weights) — this is what certifies the
    # documented recipes, not just the defaults, as 8-device-safe.
    variant_losses = {}

    def run_variant(name, overrides, key0):
        hp_v = dict(hp)
        hp_v.update(overrides)
        sys_v = PanoNeRFSystem(hp_v, mesh)
        sys_v.set_env_rays(generate_lit_rays(num=4, far=10.0))
        st = sys_v.create_state(jax.random.PRNGKey(key0))
        st, pts = sys_v.make_train_step(enable_surf=True)(
            st, batch_tree, jax.random.PRNGKey(key0 + 1))
        jax.block_until_ready(st.params)
        lv = float(jax.device_get(pts["loss"]))
        assert np.isfinite(lv), f"non-finite {name} loss {lv}"
        variant_losses[name] = lv

    # The hdr preset's tight-chroma top-K re-read + compensated prior +
    # luma view-consistency tie, plus the chroma-head factorization.
    run_variant("hdr-preset", {
        "nerf.env_tight_rgb": 0.01,
        "nerf.env_tight_chroma": True,
        "nerf.env_tight_topk": 2,
        "nerf.chroma_head": True,
        "nerf.mlp.num_density_channels": 8,
        "loss.chrom_illum_comp": True,
        "loss.view_consistency": 0.1,
        "loss.vc_luma": True,
        "loss.distortion_loss": 0.01,
        "loss.saturation_loss": 0.01,
        "nerf.env_distill_samples": 4,
        "loss.env_distill": 0.3,
    }, 3)
    # The occlusion knob: tight-scale transmittance for the secondary
    # march (NOTES.md shadow study).
    run_variant("etw", {"nerf.env_tight_rgb": 0.01,
                        "nerf.env_tight_weights": True}, 5)
    # Emissive-surface decomposition + point normals (the two structural
    # model variants the recipe docs offer).
    run_variant("emissive+pnorm", {
        "nerf.emissive_head": True,
        "nerf.emission_bias": -6.0,
        "loss.emission_sparsity": 0.1,
        "nerf.point_normals": True,
    }, 7)
    # Step-scheduled env_distill (traced weight off TrainState.step,
    # round-4) + the one-way chroma tie — both change the traced loss
    # graph itself.
    # Round-5 spatially-varying illuminant field + its one-way
    # distillation back into the radiance field (duo attack #8/#8b) +
    # the transmittance half of the per-direction distill (attack #13)
    # + the tie-window ort boost — every new round-5 structure in one
    # sharded step.
    run_variant("illum-field+ilfd+eda", {
        "nerf.illum_field": True,
        "nerf.illum_sh_deg": 2,
        "nerf.env_tight_rgb": 0.01,
        "nerf.env_tight_chroma": True,
        "loss.chrom_loss": 0.0,
        "loss.illum_distill": 0.1,
        "nerf.env_distill_samples": 4,
        "loss.env_distill": 0.1,
        "loss.env_distill_acc": 0.1,
        "loss.env_distill_end": 0.7,
        "loss.env_distill_fall": 0.15,
        "loss.ort_tie_boost": 3.0,
    }, 13)
    run_variant("ed-sched+vccsg", {
        "nerf.env_distill_samples": 4,
        "loss.env_distill": 0.1,
        "loss.env_distill_start": 0.45,
        "loss.env_distill_ramp": 0.2,
        "loss.env_distill_end": 0.7,      # full trapezoid incl. the
        "loss.env_distill_fall": 0.15,    # panonerf_shadow anneal-off
        "loss.view_consistency": 0.1,
        "loss.vc_luma": True,
        "loss.vc_chroma": 0.1,
        "loss.vc_chroma_sg": True,
    }, 9)

    # Shipped preset YAMLs (round-4 VERDICT #5): certify the EXACT key
    # sets a user gets from configs/*.yaml — loaded through
    # core/config.load with only tiny-shape overrides on top — not
    # hand-rolled approximations of them.
    import os

    from pano_nerf_tpu.core import config as config_lib

    cfg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "configs")
    tiny_shapes = {
        "train.batch_size": batch,
        "val.chunk_size": 32,
        "nerf.num_samples": 8,
        "nerf.num_ray_samples": 4,
        "nerf.num_env_samples": 4,
        "optimizer.max_steps": 100,
    }
    for preset in ("panonerf.yaml", "panonerf_hdr.yaml",
                   "panonerf_fast.yaml", "panonerf_shadow.yaml"):
        cfg = config_lib.load(os.path.join(cfg_dir, preset))
        cfg.update(tiny_shapes)
        if int(cfg.get("nerf.env_distill_samples", 0) or 0) > 0:
            cfg["nerf.env_distill_samples"] = 4
        sys_p = PanoNeRFSystem(cfg, mesh)
        sys_p.set_env_rays(generate_lit_rays(num=4, far=10.0))
        st = sys_p.create_state(jax.random.PRNGKey(11))
        st, pts = sys_p.make_train_step(enable_surf=True)(
            st, batch_tree, jax.random.PRNGKey(12))
        jax.block_until_ready(st.params)
        lv = float(jax.device_get(pts["loss"]))
        assert np.isfinite(lv), f"non-finite {preset} loss {lv}"
        variant_losses[f"preset:{preset}"] = lv

    # Sharded evaluation: the chunk renderer shard_maps each chunk over
    # the same mesh (engine/system.py::_chunked) — compile + run it too.
    system.val_chunk_size = 4 * n_devices
    render = system.make_render_image(enable_surf=True)
    out = jax.device_get(render(state.params, _make_rays(8 * n_devices)))
    assert np.isfinite(out["rgb_fine"]).all(), "non-finite sharded render"
    variant_txt = ", ".join(f"{k} loss={v:.5f}"
                            for k, v in variant_losses.items())
    print(f"[dryrun_multichip] n_devices={n_devices} ok, loss={loss:.5f}, "
          f"{variant_txt}, sharded render ok")


if __name__ == "__main__":
    dryrun_multichip(8)
