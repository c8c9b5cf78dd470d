"""Export a trained JAX checkpoint as a reference-loadable torch .ckpt.

The reverse of scripts/import_reference_ckpt.py: restores an orbax
checkpoint from one of our experiment dirs and writes a Lightning-style
.ckpt — `state_dict` under the reference's `mip_nerf.mlp.*` names
(/root/reference/systems/base_system.py:26) with `hyper_parameters`
carrying this run's dot-key config — so a model trained here can be
loaded back into the reference implementation (or any torch tooling that
reads its checkpoints).

Usage:
  python scripts/export_reference_ckpt.py --ckpt_dir EXP_DIR \
      --out last_jax.ckpt --config configs/panonerf.yaml [opts k v ...]

Runs on CPU — no TPU needed to convert.
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pano_nerf_tpu.core.config import parse_args  # noqa: E402
from train import prepare_hparams  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_dir", required=True,
                        help="experiment dir containing checkpoints/")
    parser.add_argument("--out", required=True, help="output .ckpt path")
    parser.add_argument("--step", type=int, default=None,
                        help="checkpoint step to export (default: latest)")
    parser.add_argument("--out_dir", type=str, default="./exps_export/")
    parser.add_argument("--range", nargs="+", type=float, default=[0, 10])
    parser.add_argument("--config", default="./configs/panonerf.yaml")
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="dot-key overrides matching the training run")
    hparams = parse_args(parser)
    hparams = prepare_hparams(hparams)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import torch

    from pano_nerf_tpu.engine.checkpoint import Checkpointer
    from pano_nerf_tpu.engine.system import build_system
    from pano_nerf_tpu.utils.import_torch import export_mlp_state_dict

    system = build_system(hparams)
    state = system.create_state(jax.random.PRNGKey(hparams["seed"]))
    ckpt = Checkpointer(os.path.join(hparams["ckpt_dir"], "checkpoints"))
    state = ckpt.restore(jax.device_get(state), step=hparams.get("step"))
    step = int(state.step)

    sd = {k: torch.as_tensor(v) for k, v in
          export_mlp_state_dict(jax.device_get(state.params)).items()}
    hyper = {k: v for k, v in hparams.items()
             if isinstance(v, (int, float, str, bool))}
    torch.save({"state_dict": sd, "hyper_parameters": hyper,
                "global_step": step}, hparams["out"])
    print(json.dumps({"exported_tensors": len(sd), "step": step,
                      "out": os.path.abspath(hparams["out"])}), flush=True)


if __name__ == "__main__":
    main()
