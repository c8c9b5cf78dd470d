"""Quality benchmark: time-to-target ws-PSNR on the synthetic pano scene.

Trains the panonerf config from scratch on a generated scene and reports
wall-clock time and step count to reach a target LDR ws-PSNR (default 25 dB)
plus the final quality — the "time-to-quality" half of BASELINE.md's metric
pair (rays/sec/chip is bench.py).

Usage: python scripts/bench_quality.py [--target 25] [--max_steps 20000]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=float, default=25.0,
                    help="LDR ws-PSNR target (dB)")
    ap.add_argument("--max_steps", type=int, default=20000)
    ap.add_argument("--batch_size", type=int, default=512,
                    help="production train.batch_size (512, the per-chip "
                         "throughput sweet spot; 1024 reaches 25 dB in "
                         "fewer steps but more seconds)")
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--val_every", type=int, default=1000)
    ap.add_argument("--scene", default=None,
                    help="existing scene dir (default: generate one)")
    ap.add_argument("--opts", nargs="*", default=[],
                    help="dot-key config overrides, e.g. "
                         "nerf.num_samples 16 (for matched-config runs "
                         "against scripts/bench_reference_torch.py "
                         "--steps-to-target)")
    args = ap.parse_args()

    import jax

    from pano_nerf_tpu.core.config import load_config
    from pano_nerf_tpu.data.synthetic import generate_scene
    from pano_nerf_tpu.engine.trainer import Trainer

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tempfile.mkdtemp(prefix="bench_exp_")
    if args.scene:
        scene = args.scene
    else:
        scene = tempfile.mkdtemp(prefix="bench_scene_")
        generate_scene(scene, n_views=6, height=args.height,
                       width=args.width)

    hp = load_config(os.path.join(root, "configs", "panonerf.yaml"))
    hp.update({
        "data_path": scene,
        "save_dir": out,
        "range": (0, 10),
        "train.factor": 1,
        "val.factor": 1,
        "train.sample_num": [0, 1, 2],
        "train.batch_size": args.batch_size,
        "optimizer.max_steps": args.max_steps,
        "val.check_every_n_epoch": 10 ** 9,  # manual validation below
        "val.chunk_size": 4096,
        "log_every_n_step": 10 ** 9,
        "parallel.num_devices": 1,
    })
    if args.opts:
        from pano_nerf_tpu.core.config import merge_from_list
        merge_from_list(hp, args.opts)

    # NOTE deliberately no pre-backend output here: the queue runner's
    # wedge watchdog keys on log bytes, and the first print must come
    # AFTER the tunnel handshake (the `[data] device-resident` line from
    # put_dataset_on_device) or a wedged launch would look alive.
    trainer = Trainer(hp)
    system = trainer.system
    state = system.create_state(jax.random.PRNGKey(hp["seed"]))
    # Post-handshake liveness line (stderr, flushed): create_state's
    # params are materialized on device, so reaching this print means
    # the tunnel handshake succeeded — the queue runner's wedge
    # watchdog keys on log growth (round-5 NOTES). A PRE-backend print
    # here would blind it.
    jax.block_until_ready(state.params)
    print(f"[bench_quality] backend up: scene={scene} "
          f"batch={args.batch_size} max_steps={args.max_steps}",
          file=sys.stderr, flush=True)
    # Production data path: device-resident dataset + multi-step lax.scan
    # dispatch, exactly what trainer.fit runs (the old host-fed
    # make_train_step loop measured the 1-core host pipeline, not the
    # TPU: 21.6k vs ~100k+ rays/s).
    ds = trainer.train_dataset
    dataset = system.put_dataset_on_device(ds.rays, ds.images)
    spc = int(hp.get("train.steps_per_call", 8))
    step_fn = system.make_train_step_device_data(
        dataset, enable_surf=True, batch_size=args.batch_size,
        steps_per_call=spc)
    key = jax.random.PRNGKey(1)

    # Warm the validation/render compile BEFORE the clock starts: the
    # metric excludes compile on both sides (the reference estimate is
    # pure step time), and with the round-5 default schedule the 25 dB
    # crossing arrives at the first validation — leaving the render
    # compile inside hit_time would make it the dominant term.
    trainer.validate(state, 0, max_images=1)

    t0 = time.perf_counter()
    compile_done = None
    hit_step, hit_time = None, None
    psnr_curve = []
    for call in range(args.max_steps // spc):
        state, parts = step_fn(state, key)
        step = (call + 1) * spc
        if call == 0:
            jax.block_until_ready(state.params)
            compile_done = time.perf_counter() - t0
        # Validate at the first call boundary at/after each val_every mark.
        if step % args.val_every < spc:
            m = trainer.validate(state, step, max_images=1)
            psnr_curve.append((step, m["psnr_ldr_vol"]))
            # Streamed progress (stderr, flushed): the queue runner's
            # wedge watchdog distinguishes a healthy-but-quiet run from
            # a tunnel-handshake wedge by log growth (round-5 NOTES).
            print(f"[bench_quality {step}/{args.max_steps}] "
                  f"ldr_ws_psnr={m['psnr_ldr_vol']:.2f}",
                  file=sys.stderr, flush=True)
            if hit_step is None and m["psnr_ldr_vol"] >= args.target:
                hit_step = step
                hit_time = time.perf_counter() - t0 - compile_done
                break

    total = time.perf_counter() - t0
    result = {
        "metric": f"time_to_{args.target:g}dB_ldr_ws_psnr",
        "value": round(hit_time, 1) if hit_time is not None else None,
        "unit": "s",
        "steps_to_target": hit_step,
        "compile_s": round(compile_done, 1),
        "psnr_curve": [(s, round(p, 2)) for s, p in psnr_curve],
        "total_s": round(total, 1),
    }
    # Reference-side anchor (VERDICT r2 #3): REF_STEPS_TO_TARGET.json is
    # written by scripts/bench_reference_torch.py --steps-to-target at a
    # matched reduced config; the step RATIO scales our full-config
    # time-to-target into a reference-favoring A100 estimate using the
    # measured 23.5k rays/s throughput anchor (bench.py docstring /
    # BASELINE.md). Only comparable when this run used the SAME quality
    # target; the derivation assumes step-efficiency transfers across
    # configs (documented in BASELINE.md).
    ref_file = os.path.join(root, "REF_STEPS_TO_TARGET.json")
    if hit_step is not None and os.path.exists(ref_file):
        with open(ref_file) as fp:
            ref = json.load(fp)
        step_ratio = None
        if (ref.get("steps_to_target")
                and ref.get("target_ldr_ws_psnr") == args.target
                and ref.get("ours_steps_matched")):
            step_ratio = ref["steps_to_target"] / ref["ours_steps_matched"]
        elif ref.get("step_ratio"):
            # Curve-derived ratio at the highest threshold both matched
            # runs crossed (scripts/derive_quality_anchor.py) — the
            # reduced config cannot reach the headline target itself.
            step_ratio = float(ref["step_ratio"])
            result["ratio_threshold_db"] = ref.get("ratio_threshold_db")
        if step_ratio:
            ref_a100_s = (hit_step * step_ratio
                          * args.batch_size / 23_500.0)
            result["step_ratio_matched"] = round(step_ratio, 4)
            result["ref_a100_time_to_target_s"] = round(ref_a100_s, 1)
            if hit_time:
                result["vs_baseline"] = round(ref_a100_s / hit_time, 3)
                # Reference-favoring bound: grant the reference our own
                # step efficiency (measured: it needs step_ratio x more).
                result["vs_baseline_conservative"] = round(
                    hit_step * args.batch_size / 23_500.0 / hit_time, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
