"""CLI entry point: train a mip-NeRF or Pano-NeRF system on panoramic EXRs.

Public surface preserved from the reference (/root/reference/train.py):
`python train.py --data_path ... --config configs/panonerf.yaml [opts k v ...]`
with flat dot-key YAML overrides as trailing positional pairs.
"""

import argparse
import os
import random

import numpy as np

from pano_nerf_tpu.core.config import parse_args


def setup_seed(seed: int) -> None:
    np.random.seed(seed)
    random.seed(seed)
    # JAX randomness is handled by explicit PRNG keys derived from the seed.


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=str, required=True,
                        help="scene directory with transforms_all.json")
    parser.add_argument("--out_dir", type=str, default="./exps/")
    parser.add_argument("--devices", type=int, default=None,
                        help="number of devices for the data mesh "
                             "(default: all)")
    parser.add_argument("--range", nargs="+", type=float, default=[0, 10])
    parser.add_argument("--config", default="./configs/default.yaml")
    parser.add_argument("--meta_file", default="transforms_all")
    parser.add_argument("--reform_cam", type=int, default=0)
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="dot-key overrides: e.g. train.batch_size 1024")
    return parser


def prepare_hparams(hparams: dict) -> dict:
    """Post-parse fixups, mirroring /root/reference/train.py:50-57."""
    setup_seed(hparams["seed"])
    # 'n45_46_72' -> [45, 46, 72]
    if isinstance(hparams["train.sample_num"], str):
        hparams["train.sample_num"] = [
            int(x) for x in hparams["train.sample_num"][1:].split("_")]
    hparams["exp_name"] = (
        f"{hparams['nerf.mlp_name']}_"
        + "_".join(str(x) for x in hparams["train.sample_num"]))
    sss = hparams["train.surface_start_step"]
    if 0 < sss < 1:
        hparams["train.surface_start_step"] = int(
            sss * hparams["optimizer.max_steps"])
    hparams["save_dir"] = os.path.join(hparams["out_dir"], hparams["exp_name"])
    os.makedirs(hparams["save_dir"], exist_ok=True)
    if hparams.get("devices") is not None:
        hparams["parallel.num_devices"] = hparams["devices"]
    return hparams


def maybe_init_distributed() -> bool:
    """Multi-host SPMD: when launched under a multi-process runtime (one
    process per host of a TPU slice), initialize the distributed client so
    jax.devices() spans the slice and sharded batches assemble via
    make_array_from_process_local_data.

    `PANO_NERF_MULTIHOST=1` turns it on. On TPU pods the coordinator is
    auto-detected; elsewhere (or to force a topology) set PANO_NERF_COORD
    (host:port), PANO_NERF_NPROCS, and PANO_NERF_PROC_ID. Returns whether
    initialization ran (tests/test_multihost.py drives a real 2-process
    CPU world through this path).
    """
    if not os.environ.get("PANO_NERF_MULTIHOST"):
        return False
    import jax

    kw = {}
    if os.environ.get("PANO_NERF_COORD"):
        kw = dict(coordinator_address=os.environ["PANO_NERF_COORD"],
                  num_processes=int(os.environ["PANO_NERF_NPROCS"]),
                  process_id=int(os.environ["PANO_NERF_PROC_ID"]))
    jax.distributed.initialize(**kw)
    return True


def main() -> None:
    hparams = prepare_hparams(parse_args(build_parser()))
    maybe_init_distributed()

    from pano_nerf_tpu.engine.trainer import Trainer  # defer jax import

    trainer = Trainer(hparams)
    trainer.fit(resume_path=hparams.get("checkpoint.resume_path"))


if __name__ == "__main__":
    main()
