"""The NeRF MLP as a Flax module, tuned for the TPU MXU.

Topology mirrors the reference `MLP`/`PureMLP`
(/root/reference/models/pano_mip_nerf.py:17-114, models/mip_nerf.py:15-102):
an 8x256 ReLU trunk with a skip connection re-injecting the input encoding
after layer `skip_index`, a density head, a bottleneck ("extra") layer, and a
view-conditioned color branch (1x128 by default).

TPU-first details:
* `dtype` controls compute precision — bf16 feeds the MXU at full rate while
  `param_dtype` stays fp32. Raw head outputs are cast back to fp32 before
  activations so softplus/compositing run in full precision.
* Inputs may carry arbitrary leading batch dims ([B, N, F] or [B, D, S, F]);
  XLA collapses them into a single large matmul M-dimension.
* Weight init is Xavier-uniform everywhere (the reference xavier-inits all
  layers except the final color layer, which keeps torch's default — a
  distinction with no statistical consequence that we do not replicate).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class NerfMLP(nn.Module):
    net_depth: int = 8
    net_width: int = 256
    net_depth_condition: int = 1
    net_width_condition: int = 128
    skip_index: int = 4
    num_rgb_channels: int = 3
    num_density_channels: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, view_direction: Optional[Array] = None
                 ) -> Tuple[Array, Array]:
        """Evaluate the MLP on encoded samples.

        Args:
          x: [..., F] integrated positional encodings.
          view_direction: [..., Fv] encoded view dirs, broadcastable against
            x's leading dims (same rank).
        Returns:
          raw_rgb [..., num_rgb_channels], raw_density
          [..., num_density_channels] — both float32, pre-activation.
        """
        dense = lambda feats, name: nn.Dense(
            feats, name=name, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform())
        inputs = x.astype(self.dtype)
        x = inputs
        for i in range(self.net_depth):
            x = nn.relu(dense(self.net_width, f"trunk_{i}")(x))
            if i % self.skip_index == 0 and i > 0:
                x = jnp.concatenate([x, inputs], axis=-1)
        raw_density = dense(self.num_density_channels, "density")(x)
        if view_direction is not None:
            bottleneck = dense(self.net_width, "bottleneck")(x)
            view_direction = jnp.broadcast_to(
                view_direction.astype(self.dtype),
                bottleneck.shape[:-1] + view_direction.shape[-1:])
            x = jnp.concatenate([bottleneck, view_direction], axis=-1)
            for i in range(self.net_depth_condition):
                x = nn.relu(dense(self.net_width_condition, f"view_{i}")(x))
        raw_rgb = dense(self.num_rgb_channels, "color")(x)
        return raw_rgb.astype(jnp.float32), raw_density.astype(jnp.float32)
