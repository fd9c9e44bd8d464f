"""Rotation representations, numerically safe and fully batched.

Reference parity: the PyTorch reference uses axis-angle (Rodrigues) both for
MANO pose (manopth ``rodrigues_layer.py``) and for the object 6-DoF branch
(``meshreg/models/meshregnet.py``). We add a 6D rotation parameterization
(Zhou et al. CVPR'19) as an alternative head output — it is better
conditioned for regression and is pure matmul/normalization, which XLA maps
straight onto the MXU/VPU.

All functions are shape-polymorphic over leading batch dims and safe under
``jax.jit`` / ``jax.grad`` (no data-dependent control flow; the small-angle
branch of Rodrigues uses a Taylor expansion selected with ``jnp.where`` so
gradients stay finite at theta == 0).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def rodrigues(axisang: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vectors to rotation matrices (batched Rodrigues formula).

    Args:
      axisang: (..., 3) axis-angle; the norm is the rotation angle.

    Returns:
      (..., 3, 3) rotation matrices.

    Gradient-safe at theta -> 0: uses sinc-style Taylor expansions for
    sin(t)/t and (1-cos(t))/t^2 instead of dividing by the angle.
    """
    theta_sq = jnp.sum(axisang * axisang, axis=-1)  # (...,)
    theta = jnp.sqrt(theta_sq + _EPS * _EPS)

    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks near zero.
    small = theta_sq < 1e-8
    sin_over = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    cos_term = jnp.where(
        small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / (theta_sq + _EPS * _EPS)
    )

    x, y, z = axisang[..., 0], axisang[..., 1], axisang[..., 2]
    zeros = jnp.zeros_like(x)
    # Cross-product (hat) matrix K.
    k = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )  # (..., 3, 3)
    k2 = jnp.matmul(k, k)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axisang.dtype), k.shape)
    return eye + sin_over[..., None, None] * k + cos_term[..., None, None] * k2


def rot6d_to_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation parameterization to rotation matrix (Zhou et al. 2019).

    Args:
      x: (..., 6) — two unconstrained 3-vectors.

    Returns:
      (..., 3, 3) rotation matrices (orthonormal, det=+1) via Gram-Schmidt.
    """
    a1 = x[..., 0:3]
    a2 = x[..., 3:6]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + _EPS)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / (jnp.linalg.norm(a2p, axis=-1, keepdims=True) + _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2).swapaxes(-1, -2)  # columns = b1,b2,b3


def matrix_to_rodrigues(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices to axis-angle (log map). Inverse of :func:`rodrigues`.

    Args:
      rot: (..., 3, 3).

    Returns:
      (..., 3) axis-angle with angle in [0, pi].
    """
    trace = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    # Skew part gives axis * 2 sin(theta) — well-conditioned away from pi.
    ax = jnp.stack(
        [
            rot[..., 2, 1] - rot[..., 1, 2],
            rot[..., 0, 2] - rot[..., 2, 0],
            rot[..., 1, 0] - rot[..., 0, 1],
        ],
        axis=-1,
    )
    # sin(theta) from the SKEW NORM, theta via atan2: arccos(trace) is
    # ill-conditioned near theta = pi in f32 (the trace quantizes at
    # eps(1) ~ 1.2e-7 around -1, a measured 15% sine error at
    # theta = pi - 1e-3), while the skew entries are small differences
    # with ~1e-7 absolute error — relatively accurate exactly where
    # arccos is not, and atan2 is well-conditioned everywhere.
    sin_t = 0.5 * jnp.linalg.norm(ax, axis=-1)
    theta = jnp.arctan2(sin_t, cos_t)
    scale = jnp.where(
        theta < 1e-4, 0.5 + theta * theta / 12.0, theta / (2.0 * sin_t + _EPS)
    )
    aa_skew = ax * scale[..., None]

    # Near theta = pi the skew part vanishes (R is symmetric at exactly pi)
    # and aa_skew collapses to ~0. Recover |axis| from the symmetric part
    # (R_ii = cos + (1-cos) a_i^2) and the relative signs from the
    # off-diagonal sums (R_ij + R_ji = 2 (1-cos) a_i a_j), anchoring the
    # overall sign at the largest component (a and -a are both valid logs
    # at exactly pi).
    diag = jnp.stack([rot[..., 0, 0], rot[..., 1, 1], rot[..., 2, 2]], -1)
    a_abs = jnp.sqrt(
        jnp.clip((diag - cos_t[..., None]) / (1.0 - cos_t[..., None] + _EPS),
                 0.0, 1.0)
    )
    m01 = rot[..., 0, 1] + rot[..., 1, 0]
    m02 = rot[..., 0, 2] + rot[..., 2, 0]
    m12 = rot[..., 1, 2] + rot[..., 2, 1]
    sgn = lambda x: jnp.where(x >= 0, 1.0, -1.0)
    a0, a1, a2 = a_abs[..., 0], a_abs[..., 1], a_abs[..., 2]
    k0 = jnp.logical_and(a0 >= a1, a0 >= a2)
    k1 = jnp.logical_and(jnp.logical_not(k0), a1 >= a2)
    s0 = jnp.where(k0, 1.0, jnp.where(k1, sgn(m01), sgn(m02)))
    s1 = jnp.where(k1, 1.0, jnp.where(k0, sgn(m01), sgn(m12)))
    s2 = jnp.where(jnp.logical_or(k0, k1), jnp.where(k0, sgn(m02), sgn(m12)),
                   1.0)
    aa_pi = a_abs * jnp.stack([s0, s1, s2], -1) * theta[..., None]

    near_pi = jnp.logical_and(sin_t < 1e-3, cos_t < 0.0)
    return jnp.where(near_pi[..., None], aa_pi, aa_skew)


def with_zeros_4x4(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Pack (..., 3, 3) rotation + (..., 3) translation into (..., 4, 4)."""
    top = jnp.concatenate([rot, trans[..., :, None]], axis=-1)  # (...,3,4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
