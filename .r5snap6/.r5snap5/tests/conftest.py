"""Test config: force an 8-device virtual CPU platform.

This is the fake-backend substitute the reference lacks (SURVEY.md §4):
multi-chip sharding tests run against 8 virtual CPU devices.

NB: env vars (JAX_PLATFORMS / XLA_FLAGS) are not sufficient in environments
where a sitecustomize pre-imports jax with a hardware plugin; the config
updates below win as long as no backend has been initialized yet.
"""

import os

import jax  # noqa: E402

if os.environ.get("PANO_NERF_TEST_TPU", "0") == "1":
    # Escape hatch: run the TPU-gated kernel tests on the real chip
    # (e.g. `PANO_NERF_TEST_TPU=1 pytest tests/test_fused_normals.py`).
    pass
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_rays(n, key=1, near=0.0, far=10.0):
    """Small random ray bundle for unit tests."""
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
