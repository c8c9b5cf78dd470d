"""Import a reference (torch Lightning) checkpoint into a JAX experiment dir.

Migration entry point for users of the reference implementation
(/root/reference): point this at a Lightning `.ckpt` (or a bare
`state_dict` .pt) from a reference training run and it writes an orbax
checkpoint at step 0 that scripts/eval.py, scripts/render_path.py, and
train.py (resume / fine-tune) consume directly. All of the reference's
trained state is its one shared MLP (systems/base_system.py:82 optimizes
`self.mip_nerf.mlp.parameters()` only), so the import is exact — the
optimizer state starts fresh (Adam moments are not transferable across
frameworks in any meaningful way).

Usage:
  python scripts/import_reference_ckpt.py --torch_ckpt last.ckpt \
      --out_dir ./exps_imported --config configs/panonerf.yaml [opts k v ...]

Model topology resolves in precedence order: --config defaults, then the
checkpoint's own embedded hyper-parameters (the reference's LightningModule
calls save_hyperparameters(hparams), systems/base_system.py:12, so every
.ckpt carries its full dot-key config — all `nerf.*` keys are adopted
automatically), then explicit CLI opts. Residual mismatches fail with a
per-tensor report. Runs on CPU — no TPU needed to convert.
"""

import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pano_nerf_tpu.core.config import merge_from_list, parse_args  # noqa: E402
from train import prepare_hparams  # noqa: E402


def load_torch_checkpoint(path: str):
    """Read a Lightning .ckpt or raw state_dict .pt.

    Returns (state_dict as name->numpy, embedded hyper-parameter dict or
    {} when absent).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    hyper = {}
    if isinstance(obj, dict) and "state_dict" in obj:
        hyper = dict(obj.get("hyper_parameters") or {})
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a dict-like checkpoint, got "
                         f"{type(obj).__name__}")
    sd = {k: v.detach().cpu().numpy()
          for k, v in obj.items() if hasattr(v, "detach")}
    return sd, hyper


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch_ckpt", required=True,
                        help="reference .ckpt / .pt file")
    parser.add_argument("--out_dir", type=str, default="./exps_imported/")
    parser.add_argument("--step", type=int, default=0,
                        help="step label for the written checkpoint")
    parser.add_argument("--range", nargs="+", type=float, default=[0, 10])
    parser.add_argument("--config", default="./configs/panonerf.yaml")
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="dot-key overrides, e.g. nerf.mlp_name mipnerf")
    hparams = parse_args(parser)
    hparams["train.sample_num"] = hparams.get("train.sample_num", "n0")

    sd, hyper = load_torch_checkpoint(hparams["torch_ckpt"])
    # Adopt the checkpoint's own model topology (the reference saves its
    # full dot-key config into every ckpt); explicit CLI opts still win.
    topo = {k: v for k, v in hyper.items() if k.startswith("nerf.")}
    if topo:
        hparams.update(topo)
        merge_from_list(hparams, hparams.get("opts") or [])
        print(f"[import] adopted {len(topo)} nerf.* keys from the "
              "checkpoint's hyper-parameters")
    hparams = prepare_hparams(hparams)

    import jax

    # Conversion is host-side and tiny; never block on an accelerator.
    jax.config.update("jax_platforms", "cpu")

    from pano_nerf_tpu.engine.checkpoint import Checkpointer
    from pano_nerf_tpu.engine.system import build_system
    from pano_nerf_tpu.utils.import_torch import convert_mlp_state_dict
    system = build_system(hparams)
    state = system.create_state(jax.random.PRNGKey(hparams["seed"]))
    params = convert_mlp_state_dict(sd, jax.device_get(state.params))
    state = state._replace(params=jax.device_put(params))

    ckpt_dir = os.path.join(hparams["save_dir"], "checkpoints")
    ckpt = Checkpointer(ckpt_dir)
    ckpt.save(int(hparams["step"]), state, wait=True)
    ckpt.close()
    n = sum(int(np.prod(np.shape(l))) for l in jax.tree.leaves(params))
    print(json.dumps({"imported_params": n,
                      "source": os.path.abspath(hparams["torch_ckpt"]),
                      "ckpt_dir": ckpt_dir, "step": int(hparams["step"])}),
          flush=True)


if __name__ == "__main__":
    main()
