import jax.numpy as jnp
import numpy as np

from hocon.geometry.project import persp_project, transform_points
from hocon.geometry.rot import rodrigues


def test_persp_project_matches_manual():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.1, 0.1, (2, 10, 3)).astype(np.float32)
    pts[..., 2] += 0.5
    k = np.array(
        [[[500.0, 0, 128], [0, 500.0, 112], [0, 0, 1]]] * 2, dtype=np.float32
    )
    got = np.asarray(persp_project(jnp.asarray(pts), jnp.asarray(k)))
    want_u = 500.0 * pts[..., 0] / pts[..., 2] + 128.0
    want_v = 500.0 * pts[..., 1] / pts[..., 2] + 112.0
    np.testing.assert_allclose(got[..., 0], want_u, rtol=1e-4)
    np.testing.assert_allclose(got[..., 1], want_v, rtol=1e-4)


def test_transform_points_rigid():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.standard_normal((3, 7, 3)).astype(np.float32))
    rot = rodrigues(jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32)))
    t = jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32))
    out = transform_points(pts, rot, t)
    # Distances are preserved under rigid transform.
    d_in = np.linalg.norm(np.asarray(pts[:, :1] - pts), axis=-1)
    d_out = np.linalg.norm(np.asarray(out[:, :1] - out), axis=-1)
    np.testing.assert_allclose(d_in, d_out, atol=1e-5)
