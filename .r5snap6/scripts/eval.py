"""Evaluate a trained checkpoint on the validation split, offline.

The reference has no standalone evaluation entry point — its validation
only ever runs inside the Lightning fit loop (and its checkpoint-monitor
metric is never even logged: /root/reference/systems/panonerf_system.py
validation_step's self.log calls are commented out). This script restores
a checkpoint from an experiment directory and runs exactly the trainer's
validation pass: every val panorama rendered through the jitted chunk
renderer, the full solid-angle-weighted metric family (HDR/LDR ws-PSNR,
SSIM, depth, normal MAE, albedo scale-invariant MSE), and the image
product tree — written under `eval_<step>/` so offline re-evaluations
never collide with the training run's own `val_<step>/` trees.

Usage:
  python scripts/eval.py --data_path /tmp/scene --ckpt_dir EXP_DIR \
      --config configs/panonerf.yaml [--step N] [opts k v ...]

EXP_DIR is the experiment directory containing `checkpoints/` (e.g.
`exps/panonerf_0_1_2`). Prints one JSON line with the mean metrics and
appends the same record (kind="eval") to EXP_DIR/metrics.jsonl.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pano_nerf_tpu.core.config import parse_args  # noqa: E402
from train import prepare_hparams  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", required=True,
                        help="scene directory with transforms_all.json")
    parser.add_argument("--ckpt_dir", required=True,
                        help="experiment dir containing checkpoints/")
    parser.add_argument("--step", type=int, default=None,
                        help="checkpoint step to restore (default: latest)")
    parser.add_argument("--max_images", type=int, default=None,
                        help="evaluate only the first N val panoramas")
    parser.add_argument("--range", nargs="+", type=float, default=[0, 10])
    parser.add_argument("--config", default="./configs/panonerf.yaml")
    parser.add_argument("--meta_file", default="transforms_all")
    parser.add_argument("--reform_cam", type=int, default=0)
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="dot-key overrides: e.g. val.chunk_size 4096")
    hparams = parse_args(parser)
    # Route prepare_hparams' save-dir derivation at the checkpoint dir's
    # parent so no stray ./exps/ is created; then pin save_dir to the
    # experiment dir itself (its name may differ from exp_name).
    ckpt_dir = os.path.abspath(hparams["ckpt_dir"])
    hparams["out_dir"] = os.path.dirname(ckpt_dir) or "."
    hparams = prepare_hparams(hparams)
    hparams["save_dir"] = ckpt_dir

    import jax

    from pano_nerf_tpu.engine.trainer import Trainer

    trainer = Trainer(hparams)
    state = trainer.system.create_state(jax.random.PRNGKey(hparams["seed"]))
    state = trainer.ckpt.restore(state, step=hparams.get("step"))
    step = int(jax.device_get(state.step))
    print(f"[eval] restored step {step} from {ckpt_dir}/checkpoints")
    metrics = trainer.validate(state, step=step, tag="eval",
                               max_images=hparams.get("max_images"))
    print(json.dumps(metrics), flush=True)


if __name__ == "__main__":
    main()
