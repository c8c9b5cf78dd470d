"""Flat dot-key YAML config system.

Reproduces the public config surface of the reference
(/root/reference/configs/config.py:14-93): nested YAML is flattened into a
single dict with dot-joined keys (`nerf.mlp.net_width`), string leaves are
coerced via `ast.literal_eval` when possible (so `'None'` -> None, `'2e-4'`
-> 2e-4), lists become tuples, and configs merge default <- file <- CLI
key/value pairs <- argparse namespace.

Deliberately preserved quirk: a YAML value such as `append_identity: Ture`
(typo in the reference's shipped configs, configs/panonerf.yaml:44) fails
literal_eval and stays a non-empty string, which is truthy — identical
behavior to the reference.
"""

from __future__ import annotations

import argparse
from ast import literal_eval
from os.path import dirname, join
from typing import Optional

import yaml

DEFAULT_CONFIG_FILE = join(dirname(dirname(dirname(__file__))), "configs", "default.yaml")


def _parse_dict(d: Optional[dict], d_out: Optional[dict] = None, prefix: str = "") -> dict:
    if d is None:
        return {}
    d_out = d_out if d_out is not None else {}
    for k, v in d.items():
        if isinstance(v, dict):
            _parse_dict(v, d_out, prefix=prefix + k + ".")
        else:
            if isinstance(v, str):
                try:
                    v = literal_eval(v)
                except (ValueError, SyntaxError):
                    pass  # really a string
            if isinstance(v, list):
                v = tuple(v)
            d_out[prefix + k] = v
    return d_out


def load(fname: str) -> dict:
    with open(fname, "r") as fp:
        return _parse_dict(yaml.safe_load(fp))


def merge_from_config(config: dict, config_merge: dict, check: bool = True) -> None:
    for k, v in config_merge.items():
        if k not in config and check:
            print(f"[Error] New args {k} is added")
        config[k] = v


def merge_from_file(config: dict, fname: str) -> None:
    merge_from_config(config, load(fname), False)


def merge_from_list(config: dict, list_merge) -> None:
    assert len(list_merge) % 2 == 0, "The list must have key value pairs."
    config_merge = _parse_dict(dict(zip(list_merge[0::2], list_merge[1::2])))
    merge_from_config(config, config_merge)


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
        merge_from_list(config, list(opts))
    return config


def parse_args(parser: argparse.ArgumentParser) -> dict:
    """argparse + YAML merge, mirroring the reference CLI contract."""
    args = parser.parse_args()
    config = load_config(getattr(args, "config", None), getattr(args, "opts", None))
    for k, v in args.__dict__.items():
        if k not in config:
            config[k] = v
    return config
