"""Convert reference (torch / Lightning) MLP checkpoints to the JAX tree.

Migration path for users of the reference implementation: all of the
reference's trained state lives in one shared MLP (`MLP`,
/root/reference/models/pano_mip_nerf.py:17-114; `PureMLP`,
/root/reference/models/mip_nerf.py:15-102), held by the LightningModule at
`self.mip_nerf.mlp` (/root/reference/systems/base_system.py:26), so a
Lightning `.ckpt`'s `state_dict` carries exactly these tensors:

    <prefix>layers.{i}.0.{weight,bias}         # 8x256 ReLU trunk
    <prefix>density_layer.{weight,bias}        # density / material head
    <prefix>extra_layer.{weight,bias}          # bottleneck before the view branch
    <prefix>view_layers.{i}.0.{weight,bias}    # view-conditioned branch
    <prefix>color_layer.{weight,bias}          # radiance head

Our `NerfMLP` (pano_nerf_tpu/models/mlp.py) is the same topology under flax
naming — trunk_{i}, density, bottleneck, view_{i}, color — with kernels
stored [in, out] instead of torch's [out, in]. Conversion is therefore a
rename + transpose, validated leaf-by-leaf against the target parameter
tree so topology mismatches (e.g. an `nerf.emissive_head: True` model fed a
5-channel reference head) fail loudly instead of training from garbage.

The CLI wrapper is scripts/import_reference_ckpt.py.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

Leaf = np.ndarray

# Flax module name -> reference torch submodule name (torch keys are
# "<name>.weight" / "<name>.bias"; trunk/view layers wrap the Linear in an
# nn.Sequential with the ReLU, hence the ".0").
_STATIC_MAP = {
    "density": "density_layer",
    "bottleneck": "extra_layer",
    "color": "color_layer",
}


def _torch_name(flax_name: str) -> str:
    if flax_name in _STATIC_MAP:
        return _STATIC_MAP[flax_name]
    if flax_name.startswith("trunk_"):
        return f"layers.{int(flax_name[6:])}.0"
    if flax_name.startswith("view_"):
        return f"view_layers.{int(flax_name[5:])}.0"
    raise KeyError(f"no reference counterpart for flax module {flax_name!r}")


def find_mlp_prefix(state_dict: Mapping[str, Leaf]) -> str:
    """Locate the MLP inside a state_dict by its first trunk layer.

    Accepts a bare MLP state_dict (prefix ''), a model-level one
    ('mlp.'), or a full Lightning checkpoint ('mip_nerf.mlp.').
    """
    suffix = "layers.0.0.weight"
    prefixes = sorted(k[: -len(suffix)] for k in state_dict
                      if k.endswith(suffix) and "view_" not in k)
    if not prefixes:
        raise ValueError(
            "state_dict contains no '*layers.0.0.weight' key — not a "
            "reference MLP/PureMLP checkpoint "
            f"(got {len(state_dict)} keys, e.g. "
            f"{sorted(state_dict)[:3]})")
    if len(prefixes) > 1:
        raise ValueError(f"ambiguous MLP prefixes in state_dict: {prefixes}")
    return prefixes[0]


def convert_mlp_state_dict(state_dict: Mapping[str, Leaf],
                           params_template: Mapping) -> Dict:
    """Map a reference torch state_dict onto our flax parameter tree.

    Args:
      state_dict: name -> numpy array (call .numpy() on torch tensors
        first; this module deliberately never imports torch).
      params_template: the target tree from `model.init(key)` — used for
        structure and shape validation only; its values are not read.

    Returns:
      {"params": {...}} with float32 numpy leaves, same structure as the
      template.

    Raises:
      ValueError on missing tensors or shape mismatches, with every
      offender listed (a truncated import must never half-succeed).
    """
    prefix = find_mlp_prefix(state_dict)
    template = params_template["params"]
    out: Dict[str, Dict[str, Leaf]] = {}
    problems = []
    for flax_name, leaves in template.items():
        tname = f"{prefix}{_torch_name(flax_name)}"
        converted = {}
        for leaf_name, transform in (("kernel", lambda w: w.T),
                                     ("bias", lambda b: b)):
            tkey = f"{tname}.{'weight' if leaf_name == 'kernel' else 'bias'}"
            if tkey not in state_dict:
                problems.append(f"missing tensor {tkey!r}")
                continue
            val = np.asarray(state_dict[tkey], dtype=np.float32)
            val = transform(val)
            want = np.shape(leaves[leaf_name])
            if val.shape != tuple(want):
                problems.append(
                    f"{tkey!r} -> {flax_name}.{leaf_name}: shape "
                    f"{val.shape} != expected {tuple(want)} (topology "
                    "mismatch — check nerf.mlp.* / emissive_head settings "
                    "against the reference run's config)")
                continue
            converted[leaf_name] = val
        out[flax_name] = converted
    # Surface reference tensors we did not consume (an honest importer
    # refuses to silently drop trained weights).
    consumed = {f"{prefix}{_torch_name(n)}.{s}"
                for n in template for s in ("weight", "bias")}
    mlp_keys = {k for k in state_dict if k.startswith(prefix)
                and (k.endswith(".weight") or k.endswith(".bias"))}
    extra = sorted(mlp_keys - consumed)
    if extra:
        problems.append(f"unconsumed reference MLP tensors: {extra} "
                        "(reference model deeper/wider than the target?)")
    if problems:
        raise ValueError("reference checkpoint does not match the target "
                         "model:\n  " + "\n  ".join(problems))
    return {"params": out}


def export_mlp_state_dict(params: Mapping,
                          prefix: str = "mip_nerf.mlp.") -> Dict[str, Leaf]:
    """Inverse of convert_mlp_state_dict: flax params -> reference keys.

    Emits the tensor names a reference Lightning checkpoint carries (the
    default prefix matches systems/base_system.py:26's `self.mip_nerf`),
    kernels transposed back to torch's [out, in]. The result round-trips
    bit-exactly through convert_mlp_state_dict.
    """
    out: Dict[str, Leaf] = {}
    for flax_name, leaves in params["params"].items():
        tname = f"{prefix}{_torch_name(flax_name)}"
        out[f"{tname}.weight"] = np.asarray(leaves["kernel"],
                                            dtype=np.float32).T
        out[f"{tname}.bias"] = np.asarray(leaves["bias"], dtype=np.float32)
    return out
