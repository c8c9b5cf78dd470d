"""Ray bundles as JAX pytrees.

The reference carries rays as a torch namedtuple with 8 fields
(/root/reference/datasets/base_datasets.py:13-15). Here `Rays` is a NamedTuple
of arrays, which JAX treats as a pytree: it can be jit-traced, sharded with
`NamedSharding`, donated, and mapped over with `jax.tree_util` directly.

Fields (all arrays share leading batch dims):
  origins:    [..., 3] ray origin in world space
  directions: [..., 3] un-normalized ray direction (norm carries pixel scale)
  viewdirs:   [..., 3] unit-norm view direction
  radii:      [..., 1] base radius of the cone at unit distance
  lossmult:   [..., 1] per-ray loss weight (solid angle for env rays)
  near:       [..., 1] near plane distance
  far:        [..., 1] far plane distance
  noise_var:  [..., 1] per-pixel angular noise scale (carried for API parity;
              the reference never consumes it in the models)
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import numpy as np


class Rays(NamedTuple):
    origins: jax.Array
    directions: jax.Array
    viewdirs: jax.Array
    radii: jax.Array
    lossmult: jax.Array
    near: jax.Array
    far: jax.Array
    noise_var: jax.Array


RAYS_KEYS = Rays._fields


def rays_map(fn: Callable, rays: Rays) -> Rays:
    """Apply `fn` to every field of a Rays bundle."""
    return Rays(*(fn(getattr(rays, k)) for k in RAYS_KEYS))


def rays_from_numpy(rays: Rays, dtype=np.float32) -> Rays:
    """Cast every field of a host-side Rays bundle to `dtype` numpy arrays."""
    return rays_map(lambda x: np.asarray(x, dtype=dtype), rays)


def flatten_rays(rays: Rays) -> Rays:
    """Collapse all leading dims so each field is [N, C]."""
    return rays_map(lambda x: x.reshape(-1, x.shape[-1]), rays)


def take_rays(rays: Rays, idx) -> Rays:
    """Gather rays at flat indices `idx` (first axis)."""
    return rays_map(lambda x: x[idx], rays)
