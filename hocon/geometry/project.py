"""Batched pinhole camera projection.

Reference parity: ``meshreg/models/project.py`` — ``batch_proj2d(pts3d, K)``
computing ``uv = (K @ p) / p_z``. Pure einsum, fuses into surrounding XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def persp_project(points3d: jnp.ndarray, camintr: jnp.ndarray) -> jnp.ndarray:
    """Pinhole projection of camera-space 3D points to pixels.

    Args:
      points3d: (..., N, 3) points in camera coordinates (z > 0 in front).
      camintr: (..., 3, 3) intrinsics K.

    Returns:
      (..., N, 2) pixel coordinates.
    """
    hom = jnp.einsum("...ij,...nj->...ni", camintr, points3d)
    return hom[..., :2] / (hom[..., 2:3] + _EPS)


def transform_points(
    points: jnp.ndarray, rot: jnp.ndarray, trans: jnp.ndarray
) -> jnp.ndarray:
    """Apply rigid transform: ``p' = R p + t``.

    Args:
      points: (..., N, 3).
      rot: (..., 3, 3).
      trans: (..., 3).
    """
    return jnp.einsum("...ij,...nj->...ni", rot, points) + trans[..., None, :]
