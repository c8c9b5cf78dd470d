"""Learning-rate schedule: log-lerp decay with reverse-cosine warmup.

Optax-native counterpart of the reference `MipLRDecay` torch scheduler
(/root/reference/utils/lr_schedule.py:51-60): lr(0)=lr_init,
lr(max_steps)=lr_final, log-linear in between, scaled during the first
`lr_delay_steps` by lr_delay_mult eased out with sin(pi/2 * t).
"""

from __future__ import annotations

import jax.numpy as jnp


def mip_lr_decay(lr_init: float, lr_final: float, max_steps: int,
                 lr_delay_steps: int = 0, lr_delay_mult: float = 1.0):
    """Returns an optax-compatible schedule: step -> learning rate."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t)
                           + jnp.log(lr_final) * t)
        return delay_rate * log_lerp

    return schedule
