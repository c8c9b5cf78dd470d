"""Rodrigues rotations: rotate a canonical axis onto target vectors, batched.

Counterpart of /root/reference/utils/vector_rotation.py (not imported by the
reference pipeline; part of the public inventory). The batched version is a
single vectorized numpy/jnp expression instead of the reference's
matmul-with-flattened-skew trick (vector_rotation.py:50-89).
"""

from __future__ import annotations

import numpy as np


def _skew(v: np.ndarray) -> np.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric cross-product matrices."""
    zeros = np.zeros_like(v[..., 0])
    return np.stack([
        np.stack([zeros, -v[..., 2], v[..., 1]], -1),
        np.stack([v[..., 2], zeros, -v[..., 0]], -1),
        np.stack([-v[..., 1], v[..., 0], zeros], -1),
    ], axis=-2)


def rot_to_target(target_vec: np.ndarray,
                  origin_vec=np.array([0.0, 1.0, 0.0])) -> np.ndarray:
    """Rotation matrix taking `origin_vec` to a single unit `target_vec`.

    Reference: utils/vector_rotation.py:8-24 (`rot_to_target_np`).
    """
    target_vec = np.asarray(target_vec, dtype=np.float64)
    origin_vec = np.asarray(origin_vec, dtype=np.float64)
    if np.array_equal(origin_vec, -target_vec):
        return np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, 1.0]])
    cos = np.dot(origin_vec, target_vec) / (
        np.linalg.norm(origin_vec) * np.linalg.norm(target_vec))
    theta = np.arccos(np.clip(cos, -1.0, 1.0))
    n = np.cross(origin_vec, target_vec)
    n = n / np.linalg.norm(n)
    K = _skew(n)
    return np.eye(3) + np.sin(theta) * K + K @ K * (1 - np.cos(theta))


def batched_rot_to_target(target_vecs: np.ndarray,
                          origin_vec=np.array([0.0, 1.0, 0.0])
                          ) -> np.ndarray:
    """Rotation matrices taking `origin_vec` to each of [B, 3] unit targets.

    Antipodal targets get the same 180-degree-about-x fallback the reference
    uses (vector_rotation.py:57, 86-87).
    Reference: utils/vector_rotation.py:52-89 (`RotToTarget.rot2t`).
    """
    t = np.asarray(target_vecs, dtype=np.float64)
    o = np.asarray(origin_vec, dtype=np.float64)
    cos = np.clip(t @ o, -1.0, 1.0)                # [B]
    theta = np.arccos(cos)[:, None, None]
    n = np.cross(np.broadcast_to(o, t.shape), t)   # [B, 3]
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.maximum(norm, 1e-12)
    K = _skew(n)
    R = (np.eye(3)[None] + np.sin(theta) * K
         + K @ K * (1 - np.cos(theta)))
    flip = np.isclose(cos, -1.0)
    R[flip] = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, 1.0]])
    return R


class RotToTarget:
    """Stateless batched-rotation facade matching the reference class API."""

    def rot2t(self, tvec: np.ndarray) -> np.ndarray:
        return batched_rot_to_target(np.asarray(tvec).reshape(-1, 3))


def random_rotations(key, batch_shape=()) -> "jax.Array":
    """Haar-uniform random SO(3) matrices, shape batch_shape + (3, 3).

    Quaternion method: q ~ N(0, I_4) normalized is uniform on S^3, which
    double-covers SO(3) uniformly. Used to decorrelate the env-direction set
    across training steps/rays (no reference counterpart — the reference's
    irradiance estimator uses a fixed Fibonacci set, which biases small
    emitters; see PanoMipNeRF `env_rotation`). Traceable jnp code.
    """
    import jax
    import jax.numpy as jnp
    q = jax.random.normal(key, tuple(batch_shape) + (4,))
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                    2 * (x * z + w * y)], -1)
    r1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                    2 * (y * z - w * x)], -1)
    r2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                    1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([r0, r1, r2], axis=-2)
