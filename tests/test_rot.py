"""Unit tests for rotation utilities (cross-checked vs torch-cpu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hocon.geometry.rot import (
    matrix_to_rodrigues,
    rodrigues,
    rot6d_to_matrix,
)


def _quat_rotmat(axisang):
    """Independent axis-angle->matrix via quaternions (numpy oracle)."""
    theta = np.linalg.norm(axisang, axis=-1, keepdims=True)
    axis = axisang / np.where(theta > 0, theta, 1.0)
    half = theta[..., 0] / 2.0
    w = np.cos(half)
    xyz = axis * np.sin(half)[..., None]
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    return np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            np.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            np.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def test_rodrigues_matches_quaternion_oracle():
    rng = np.random.default_rng(0)
    aa = rng.standard_normal((64, 3)).astype(np.float32)
    got = np.asarray(rodrigues(jnp.asarray(aa)))
    want = _quat_rotmat(aa)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_rodrigues_zero_angle_is_identity_and_grad_finite():
    aa = jnp.zeros((4, 3))
    r = rodrigues(aa)
    np.testing.assert_allclose(np.asarray(r), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6)
    g = jax.grad(lambda a: jnp.sum(rodrigues(a)))(aa)
    assert np.all(np.isfinite(np.asarray(g)))


def test_rodrigues_orthonormal():
    rng = np.random.default_rng(1)
    aa = jnp.asarray(rng.standard_normal((32, 3)).astype(np.float32) * 3)
    r = rodrigues(aa)
    eye = jnp.einsum("bij,bkj->bik", r, r)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    det = np.linalg.det(np.asarray(r))
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_matrix_to_rodrigues_roundtrip():
    rng = np.random.default_rng(2)
    aa = rng.standard_normal((32, 3)).astype(np.float32)
    aa = aa / np.linalg.norm(aa, axis=-1, keepdims=True) * rng.uniform(0.01, 3.0, (32, 1))
    r = rodrigues(jnp.asarray(aa))
    back = np.asarray(matrix_to_rodrigues(r))
    np.testing.assert_allclose(back, aa, atol=1e-3)


def test_rot6d_orthonormal_and_identity():
    x = jnp.asarray([[1.0, 0, 0, 0, 1.0, 0]])
    r = rot6d_to_matrix(x)
    np.testing.assert_allclose(np.asarray(r)[0], np.eye(3), atol=1e-6)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((16, 6)).astype(np.float32))
    r = rot6d_to_matrix(x)
    eye = jnp.einsum("bij,bkj->bik", r, r)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)


@pytest.mark.parametrize("shape", [(3,), (2, 5, 3)])
def test_rodrigues_shape_polymorphic(shape):
    rng = np.random.default_rng(4)
    aa = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    assert rodrigues(aa).shape == shape[:-1] + (3, 3)


def test_rodrigues_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    aa = rng.standard_normal((16, 3)).astype(np.float32)
    got = np.asarray(rodrigues(jnp.asarray(aa)))
    # torch oracle via matrix_exp of the hat matrix.
    t = torch.from_numpy(aa)
    zeros = torch.zeros(16)
    k = torch.stack(
        [
            torch.stack([zeros, -t[:, 2], t[:, 1]], -1),
            torch.stack([t[:, 2], zeros, -t[:, 0]], -1),
            torch.stack([-t[:, 1], t[:, 0], zeros], -1),
        ],
        dim=-2,
    )
    want = torch.linalg.matrix_exp(k).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_matrix_to_rodrigues_near_pi():
    """The log map must stay correct at and near theta = pi, where the skew
    part of R vanishes (reviewer-confirmed failure of the naive formula)."""
    rng = np.random.default_rng(7)
    axes = rng.normal(size=(8, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    for theta in (np.pi, np.pi - 1e-3, np.pi - 1e-5, np.pi - 0.05):
        aa = jnp.asarray(axes * theta, jnp.float32)
        r = rodrigues(aa)
        back = matrix_to_rodrigues(r)
        # a and -a are both valid logs at exactly pi: compare the induced
        # ROTATIONS, plus the recovered angle.
        r2 = rodrigues(back)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(r), atol=2e-3)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(back), axis=-1), theta, atol=2e-3
        )
