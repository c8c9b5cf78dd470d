"""pano-nerf-tpu: a TPU-native JAX framework for HDR panoramic radiance fields.

A from-scratch rebuild of the capabilities of Lu-Zhan/Pano-NeRF (AAAI 2024):
training mip-NeRF-style radiance fields from sparse LDR equirectangular
panoramas and synthesizing HDR novel views with recovered geometry (depth,
normals, albedo) through a geometry-aware irradiance/surface-rendering path.

Design: pure-functional JAX with explicit PRNG keys, jit-compiled train steps,
bf16 MXU compute with fp32 compositing, Pallas kernels for the fused
sample->IPE->MLP->composite hot loop, and SPMD data-parallel ray sharding over
a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from pano_nerf_tpu.core.rays import Rays, rays_map  # noqa: F401
