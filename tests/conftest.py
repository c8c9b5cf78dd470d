"""Test config: force an 8-device virtual CPU platform before JAX loads.

This is the fake-backend substitute the reference lacks (SURVEY.md §4):
multi-chip sharding tests run against 8 virtual CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_rays(n, key=1, near=0.0, far=10.0):
    """Small random ray bundle for unit tests."""
    import jax
    import jax.numpy as jnp

    from pano_nerf_tpu.core.rays import Rays

    k = jax.random.PRNGKey(key)
    d = jax.random.normal(k, (n, 3))
    return Rays(
        origins=jnp.zeros((n, 3)),
        directions=d,
        viewdirs=d / jnp.linalg.norm(d, axis=-1, keepdims=True),
        radii=jnp.full((n, 1), 0.01),
        lossmult=jnp.ones((n, 1)),
        near=jnp.full((n, 1), near),
        far=jnp.full((n, 1), far),
        noise_var=jnp.zeros((n, 1)),
    )
