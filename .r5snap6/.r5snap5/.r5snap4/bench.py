"""Benchmark: Pano-NeRF training throughput (rays/sec/chip) on real hardware.

Runs the production training configuration — device-resident dataset with
on-device batch sampling, full panonerf step (coarse+fine primary render,
density-gradient normals, 10x10 secondary env rays, Lambertian surface
rendering, all losses, Adam) — and reports sustained training rays/sec on
one chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`vs_baseline` divides by an A100 estimate for the torch reference that is
anchored in measurements (scripts/bench_reference_torch.py, 2026-08-16, this
host's 1-core CPU, identical step semantics at batch 512):

    reference torch step:   7.65 rays/s   (measured, fp32 CPU)
    this repo, same host:  48.84 rays/s   (measured, fp32 CPU, jit)
    this repo, TPU v5e:   94,910 rays/s   (measured, BENCH_r01)

The A100 estimate grants the reference the SAME CPU->accelerator uplift our
XLA step achieves (94,910 / 48.84 = 1,943x), corrected by the peak-compute
ratio A100 fp16 (312 TF) / v5e bf16 (197 TF) = 1.58x:

    ref_A100 ~= 7.65 * 1,943 * 1.58 ~= 23,500 rays/s.

This is deliberately reference-favoring: an eager torch+Lightning step with
hundreds of small kernels at batch 512 is launch-latency-bound on a GPU and
will not reach the uplift a single fused XLA program gets, so the true
speedup is at least `vs_baseline`.
"""

import json
import os
import sys
import time

import numpy as np

# Reference throughput estimate for A100, derived above from measured CPU
# anchors. Kept as a pinned constant so vs_baseline tracks TPU-side progress.
A100_REFERENCE_RAYS_PER_SEC = 23_500.0

BATCH = 512
# Production dispatch: 8 steps per lax.scan call (train.steps_per_call —
# amortizes the per-step launch gap; measured +5.7% at batch 512, NOTES.md
# round-3). 45 calls = 360 optimizer steps timed.
SCAN = 8
CALLS = 45
WARMUP = 5


def _arm_wedge_watchdog():
    """Guard against the silent tunnel-launch wedge (NOTES.md round-3).

    Distinct from the UNAVAILABLE outage (which the axon plugin retries
    internally and eventually raises, handled below): a freshly launched
    client can park in futex_wait before/at the backend handshake with no
    exception ever surfacing — observed 3/4 launches in one session,
    while `jax.devices()` from a NEW process stayed healthy. The remedy
    is the same clean-process re-exec, triggered by a progress deadline
    instead of an exception. Healthy runs reach the first compiled step
    well inside ~4 min even on a contended host; the deadline is 10 min,
    bounded to 3 attempts so a genuine outage still falls through to the
    UNAVAILABLE path (whose in-plugin retry needs ~25 min).
    """
    import threading

    deadline_s = float(os.environ.get("PANO_NERF_BENCH_WEDGE_S", "600"))
    attempt = int(os.environ.get("PANO_NERF_BENCH_WEDGE", "0"))
    if attempt >= 3 or deadline_s <= 0:
        return lambda: None, lambda: None

    # A wedged client makes NO progress at all; a merely-slow one (long
    # backend init / compile on this 1-core host) still crosses the
    # milestones below. The timer only fires when no milestone has been
    # reached for a full deadline window; otherwise it re-arms, so slow
    # compiles never burn re-exec attempts (round-3 advisor finding).
    state = {"beats": 0, "seen": 0, "stop": False}

    def heartbeat():
        state["beats"] += 1

    def fire():
        if state["stop"]:
            return
        if state["beats"] != state["seen"]:
            state["seen"] = state["beats"]
            rearm = threading.Timer(deadline_s, fire)
            rearm.daemon = True
            rearm.start()
            return
        print(f"[bench] no progress within {deadline_s:.0f}s — tunnel "
              f"launch wedge (attempt {attempt + 1}/3); re-executing",
              file=sys.stderr, flush=True)
        os.environ["PANO_NERF_BENCH_WEDGE"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)

    timer = threading.Timer(deadline_s, fire)
    timer.daemon = True
    timer.start()

    def disarm():
        state["stop"] = True
        timer.cancel()

    return disarm, heartbeat


def main():
    disarm_watchdog, heartbeat = _arm_wedge_watchdog()
    import jax

    jax.devices()          # force backend init: the wedge parks HERE
    heartbeat()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _make_rays, _tiny_hparams
    from pano_nerf_tpu.data.pano_dataset import generate_lit_rays
    from pano_nerf_tpu.engine.system import PanoNeRFSystem
    from pano_nerf_tpu.parallel import mesh as mesh_lib

    # Production model/loss semantics come straight from the shipped
    # config (configs/panonerf.yaml) so this benchmark always measures
    # what `train.py` trains — sample counts, estimator mode, and the
    # loss-extension defaults track production automatically. Only the
    # data/infra keys are overridden below.
    from pano_nerf_tpu.core.config import load_config

    hp = _tiny_hparams(BATCH)
    prod = load_config(os.path.join(os.path.dirname(os.path.abspath(
        __file__)), "configs", "panonerf.yaml"))
    hp.update({k: v for k, v in prod.items()
               if k.startswith(("nerf.", "loss.", "optimizer."))})
    hp["optimizer.max_steps"] = 44000      # LR schedule as in production
    hp["train.scoped_vmem_kib"] = prod.get("train.scoped_vmem_kib", 0)

    mesh = mesh_lib.get_mesh(1)
    system = PanoNeRFSystem(hp, mesh)
    system.set_env_rays(generate_lit_rays(
        num=int(hp["nerf.num_ray_samples"]), far=10.0))
    state = system.create_state(jax.random.PRNGKey(0))

    # Real scene geometry resident on device: 3 HDR panoramas of the
    # synthetic box-room scene at factor-4 Replica resolution (~98k rays) —
    # the same generator bench_quality.py trains on (VERDICT r2 #6; the
    # step is shape-dominated, so this matches the old random-ray number
    # within noise — delta recorded in NOTES.md).
    import tempfile

    from pano_nerf_tpu.data.pano_dataset import PanoDataset
    from pano_nerf_tpu.data.synthetic import generate_scene

    scene_dir = os.path.join(tempfile.gettempdir(),
                             "bench_scene_3x128x256_v1")
    if not os.path.exists(os.path.join(scene_dir, "transforms_all.json")):
        generate_scene(scene_dir, n_views=3, height=128, width=256)
    ds = PanoDataset(scene_dir, split="train", factor=1, num=[0, 1, 2],
                     range=(0, 10))
    dataset = system.put_dataset_on_device(ds.rays, ds.images)
    step_fn = system.make_train_step_device_data(dataset, enable_surf=True,
                                                 batch_size=BATCH,
                                                 steps_per_call=SCAN)
    key = jax.random.PRNGKey(1)
    heartbeat()            # data resident on device: backend is alive

    for _ in range(WARMUP):
        state, parts = step_fn(state, key)
        heartbeat()        # each warmup call compiles/executes: progress
    jax.block_until_ready(state.params)
    # Past backend init + compile + first steps: the launch wedge cannot
    # happen anymore — stand down before the timed section.
    disarm_watchdog()

    t0 = time.perf_counter()
    for _ in range(CALLS):
        state, parts = step_fn(state, key)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    loss = float(jax.device_get(parts["loss"]))
    assert np.isfinite(loss), f"non-finite loss: {loss}"

    rays_per_sec = BATCH * SCAN * CALLS / dt
    print(json.dumps({
        "metric": "panonerf_train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        # vs measured-anchor A100 estimate for the torch reference (module
        # docstring; reference-favoring, so this is a lower bound).
        "vs_baseline": round(rays_per_sec / A100_REFERENCE_RAYS_PER_SEC, 3),
    }))


def _main_with_backend_retry():
    """Survive transient TPU-tunnel outages.

    The axon plugin already blocks/retries internally (~25 min observed)
    before raising UNAVAILABLE, and a failed backend init is cached for
    the life of the process — so the retry must be a CLEAN process:
    re-exec with a bounded attempt counter (5 x ~25 min covers a
    multi-hour outage). Any other failure propagates immediately.
    """
    try:
        main()
    except RuntimeError as e:
        transient = ("UNAVAILABLE" in str(e)
                     or "Unable to initialize backend" in str(e))
        attempt = int(os.environ.get("PANO_NERF_BENCH_RETRY", "0"))
        if not transient or attempt >= 5:
            raise
        print(f"[bench] TPU backend unavailable (attempt {attempt + 1}/5); "
              "re-executing after 60 s", file=sys.stderr, flush=True)
        time.sleep(60)
        os.environ["PANO_NERF_BENCH_RETRY"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    _main_with_backend_retry()
