"""Flat dot-key YAML config system.

Provides the public config surface the reference exposes
(/root/reference/configs/config.py): nested YAML flattens into a single
dict whose keys join the nesting path with dots (`nerf.mlp.net_width`).
String leaves are coerced through `ast.literal_eval` when they parse
(`'None'` -> None, `'2e-4'` -> 2e-4), lists become tuples, and configs
merge default <- named file <- CLI key/value pairs <- argparse namespace.

Deliberately preserved quirk: a YAML value such as `append_identity: Ture`
(typo in the reference's shipped configs, configs/panonerf.yaml:44) fails
literal_eval and stays a non-empty string, which is truthy — identical
behavior to the reference.
"""

from __future__ import annotations

import argparse
import os
from ast import literal_eval
from typing import Iterator, Optional, Tuple

import yaml

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
DEFAULT_CONFIG_FILE = os.path.join(_REPO_ROOT, "configs", "default.yaml")


def _coerce(value):
    """Best-effort literal coercion of a YAML leaf.

    Strings that parse as Python literals become those literals; anything
    else passes through. Lists (from YAML or from coercion) are frozen to
    tuples so config values stay hashable / jit-static.
    """
    if isinstance(value, str):
        try:
            value = literal_eval(value)
        except (ValueError, SyntaxError):
            return value  # a genuine string (including typos like 'Ture')
    if isinstance(value, list):
        value = tuple(value)
    return value


def _walk_leaves(nested: dict, path: str = "") -> Iterator[Tuple[str, object]]:
    """Depth-first iterator over (dot-joined key, coerced leaf) pairs."""
    for key, value in nested.items():
        dotted = f"{path}{key}"
        if isinstance(value, dict):
            yield from _walk_leaves(value, f"{dotted}.")
        else:
            yield dotted, _coerce(value)


def flatten(nested: Optional[dict]) -> dict:
    """Nested mapping -> flat dot-key dict with coerced leaves."""
    if not nested:
        return {}
    return dict(_walk_leaves(nested))


def load(fname: str, _depth: int = 0) -> dict:
    """Load + flatten one YAML file, resolving `_base_` inheritance.

    A top-level `_base_: other.yaml` key (path relative to the file's own
    directory) loads the base file first and overlays this file's keys on
    top — so preset configs (e.g. configs/panonerf_hdr.yaml) state only
    their deltas. Chains resolve recursively with a small depth bound.
    """
    if _depth > 8:
        raise ValueError(f"config _base_ chain too deep at {fname!r}")
    with open(fname, "r") as fp:
        flat = flatten(yaml.safe_load(fp))
    base = flat.pop("_base_", None)
    if base is None:
        return flat
    if not isinstance(base, str):
        raise ValueError(f"_base_ in {fname!r} must be a file name")
    base_path = os.path.join(os.path.dirname(os.path.abspath(fname)), base)
    config = load(base_path, _depth + 1)
    config.update(flat)
    return config


def merge_from_config(config: dict, updates: dict, check: bool = True) -> None:
    """Overlay `updates` onto `config` in place.

    With `check`, keys absent from the base config are reported (matching
    the reference's warn-and-proceed behavior) but still applied.
    """
    if check:
        for key in updates.keys() - config.keys():
            print(f"[Error] unknown config key {key!r} introduced by merge")
    config.update(updates)


def merge_from_file(config: dict, fname: str) -> None:
    merge_from_config(config, load(fname), check=False)


def merge_from_list(config: dict, pairs) -> None:
    """Overlay alternating [key, value, key, value, ...] CLI overrides."""
    pairs = list(pairs)
    assert len(pairs) % 2 == 0, "The list must have key value pairs."
    updates = {key: _coerce(value)
               for key, value in zip(pairs[0::2], pairs[1::2])}
    merge_from_config(config, updates)


def default() -> dict:
    try:
        return load(DEFAULT_CONFIG_FILE)
    except FileNotFoundError:
        return {}


def load_config(config_path: Optional[str] = None, opts=None) -> dict:
    """Load default config, merge a named config file, then CLI opts pairs."""
    config = default()
    if config_path is not None:
        merge_from_file(config, config_path)
    if opts:
        merge_from_list(config, opts)
    return config


def parse_args(parser: argparse.ArgumentParser) -> dict:
    """argparse + YAML merge, mirroring the reference CLI contract."""
    args = parser.parse_args()
    config = load_config(getattr(args, "config", None),
                         getattr(args, "opts", None))
    for key, value in vars(args).items():
        config.setdefault(key, value)
    return config
