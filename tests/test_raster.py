"""Soft rasterizer tests: brute-force oracle, invariants, gradients.

Kernel-test strategy per SURVEY.md §4: validate against a dense
O(pixels x faces) numpy oracle on tiny meshes (single triangle -> blob),
then check gradients with finite differences via jax.test_util.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hocon.render import raster as R


def _brute_force_oracle(verts_pix, verts_z, faces, attrs, hw, sigma, gamma):
    """Dense numpy reimplementation of the soft-raster math (no chunking)."""
    b, v, _ = verts_pix.shape
    h, w = hw
    f = faces.shape[0]
    zmin = verts_z.min(axis=1, keepdims=True)
    zmax = verts_z.max(axis=1, keepdims=True)
    zbar = (verts_z - zmin) / np.maximum(zmax - zmin, 1e-6) * 0.9 + 0.05

    xs, ys = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    out_sil = np.zeros((b, h, w))
    out_attr = np.zeros((b, h, w, attrs.shape[-1]))
    out_depth = np.zeros((b, h, w))
    for bi in range(b):
        one_minus = np.ones((h, w))
        num = np.zeros((h, w, attrs.shape[-1] + 1))
        den = np.zeros((h, w))
        for fi in range(f):
            idx = faces[fi]
            tri = verts_pix[bi, idx]  # (3,2)
            mat = np.stack([tri[:, 0], tri[:, 1], np.ones(3)], axis=0)
            det = np.linalg.det(mat)
            if abs(det) < 1e-12:
                continue
            minv = np.linalg.inv(mat)
            pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1)  # (h,w,3)
            bary = pix @ minv.T  # (h,w,3)
            gn = np.linalg.norm(minv[:, :2], axis=1)
            s = bary / gn  # perpendicular distances to the 3 edge lines
            d_in = s.min(axis=-1)
            # exact point-to-segment squared distances
            dist2 = np.full(s.shape[:-1], np.inf)
            for k in range(3):
                va, vb = tri[(k + 1) % 3], tri[(k + 2) % 3]
                L = np.linalg.norm(vb - va)
                ehat = (vb - va) / max(L, 1e-12)
                u = (pix[..., :2] - va) @ ehat
                ov = np.maximum(np.maximum(-u, u - L), 0.0)
                dist2 = np.minimum(dist2, s[..., k] ** 2 + ov**2)
            signed_sq = np.where(d_in > 0, d_in**2, -dist2)
            p = 1.0 / (1.0 + np.exp(-signed_sq / sigma**2))
            one_minus *= 1.0 - p
            zpix = np.clip(bary @ zbar[bi, idx], 0.0, 1.0)
            wgt = p * np.exp(-zpix / gamma)
            apix = bary @ attrs[bi, idx]  # (h,w,C)
            num[..., :-1] += wgt[..., None] * apix
            num[..., -1] += wgt * zpix
            den += wgt
        w_bg = np.exp(-1.0 / gamma)
        out_sil[bi] = 1.0 - one_minus
        out_attr[bi] = num[..., :-1] / (den + w_bg)[..., None]
        out_depth[bi] = (num[..., -1] + w_bg * 1.0) / (den + w_bg)
    return out_sil, out_attr, out_depth


def _triangle_scene(b=2):
    verts_pix = np.array(
        [[[8.0, 4.0], [24.0, 6.0], [14.0, 26.0]]] * b, dtype=np.float32
    )
    if b > 1:
        verts_pix[1] += 2.0
    verts_z = np.array([[0.5, 0.6, 0.7]] * b, dtype=np.float32)
    faces = np.array([[0, 1, 2]], dtype=np.int32)
    attrs = np.array([[[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]]] * b, dtype=np.float32)
    return verts_pix, verts_z, faces, attrs


def test_xla_matches_brute_force_single_triangle():
    vp, vz, f, a = _triangle_scene()
    out = R.soft_rasterize(
        jnp.asarray(vp), jnp.asarray(vz), jnp.asarray(f), jnp.asarray(a),
        image_size=(32, 32), sigma=1.0, gamma=0.05, backend="xla",
    )
    sil, attr, depth = _brute_force_oracle(vp, vz, f, a, (32, 32), 1.0, 0.05)
    np.testing.assert_allclose(np.asarray(out.sil), sil, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.attr), attr, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.depth), depth, atol=1e-4)


def test_xla_matches_brute_force_multi_face_occlusion():
    rng = np.random.default_rng(0)
    b, v = 2, 12
    verts_pix = rng.uniform(2, 30, (b, v, 2)).astype(np.float32)
    verts_z = rng.uniform(0.3, 1.0, (b, v)).astype(np.float32)
    faces = rng.integers(0, v, (20, 3)).astype(np.int32)
    attrs = rng.standard_normal((b, v, 3)).astype(np.float32)
    out = R.soft_rasterize(
        jnp.asarray(verts_pix), jnp.asarray(verts_z), jnp.asarray(faces),
        jnp.asarray(attrs), image_size=(32, 32), sigma=0.7, gamma=0.05,
        backend="xla", face_chunk=8,
    )
    sil, attr, depth = _brute_force_oracle(
        verts_pix, verts_z, faces, attrs, (32, 32), 0.7, 0.05
    )
    np.testing.assert_allclose(np.asarray(out.sil), sil, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.attr), attr, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.depth), depth, atol=2e-3)


def test_silhouette_inside_outside():
    vp, vz, f, a = _triangle_scene()
    out = R.soft_rasterize(
        jnp.asarray(vp), jnp.asarray(vz), jnp.asarray(f), jnp.asarray(a),
        image_size=(32, 32), sigma=0.3, gamma=0.05, backend="xla",
    )
    sil = np.asarray(out.sil[0])
    centroid = vp[0].mean(axis=0)  # deep inside
    assert sil[int(centroid[1]), int(centroid[0])] > 0.95
    assert sil[0, 31] < 0.05  # far corner outside
    assert np.all(sil >= 0) and np.all(sil <= 1 + 1e-6)


def test_occlusion_near_face_wins():
    """Two stacked triangles: attribute of the nearer one dominates."""
    tri = np.array([[4.0, 4.0], [28.0, 4.0], [16.0, 28.0]], dtype=np.float32)
    verts_pix = np.stack([tri, tri], axis=0).reshape(1, 6, 2)
    verts_z = np.array([[0.4, 0.4, 0.4, 0.9, 0.9, 0.9]], dtype=np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.int32)
    attrs = np.array([[[1.0]] * 3 + [[-1.0]] * 3], dtype=np.float32)
    out = R.soft_rasterize(
        jnp.asarray(verts_pix), jnp.asarray(verts_z), jnp.asarray(faces),
        jnp.asarray(attrs), image_size=(32, 32), sigma=0.5, gamma=1 / 40.0,
        backend="xla",
    )
    # Center pixel: near face attr (+1) should dominate.
    assert float(out.attr[0, 16, 16, 0]) > 0.95


def test_degenerate_face_ignored():
    verts_pix = np.array([[[5.0, 5.0], [5.0, 5.0], [5.0, 5.0]]], dtype=np.float32)
    verts_z = np.array([[0.5, 0.5, 0.5]], dtype=np.float32)
    faces = np.array([[0, 1, 2]], dtype=np.int32)
    out = R.soft_rasterize(
        jnp.asarray(verts_pix), jnp.asarray(verts_z), jnp.asarray(faces),
        image_size=(16, 16), backend="xla",
    )
    assert np.all(np.asarray(out.sil) < 1e-5)
    assert np.all(np.isfinite(np.asarray(out.attr)))


def test_winding_invariance():
    """Flipping triangle winding must not change the render."""
    vp, vz, f, a = _triangle_scene(b=1)
    out1 = R.soft_rasterize(
        jnp.asarray(vp), jnp.asarray(vz), jnp.asarray(f), jnp.asarray(a),
        image_size=(32, 32), backend="xla",
    )
    f_flip = f[:, ::-1].copy()
    out2 = R.soft_rasterize(
        jnp.asarray(vp), jnp.asarray(vz), jnp.asarray(f_flip), jnp.asarray(a),
        image_size=(32, 32), backend="xla",
    )
    np.testing.assert_allclose(np.asarray(out1.sil), np.asarray(out2.sil), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1.attr), np.asarray(out2.attr), atol=1e-5)


def test_gradients_finite_differences():
    from jax.test_util import check_grads

    vp, vz, f, a = _triangle_scene(b=1)
    vz_fixed = jnp.asarray(vz)

    def render_loss(verts_pix, attrs):
        # verts_z is held fixed: normalize_depth stop-gradients its min/max
        # bounds by design, so FD (which perturbs the bounds) and AD
        # legitimately disagree for the extreme-z vertices.
        out = R.soft_rasterize(
            verts_pix, vz_fixed, jnp.asarray(f), attrs,
            image_size=(16, 16), sigma=1.5, gamma=0.1, backend="xla",
        )
        return jnp.sum(out.sil**2) + jnp.sum(out.attr**2)

    check_grads(
        render_loss,
        (jnp.asarray(vp * 0.5), jnp.asarray(a)),
        order=1, modes=["rev"], atol=1e-2, rtol=1e-2,
    )


def test_gradients_interior_depth():
    """FD check of the depth-softmax gradient path through non-extreme z."""
    from jax.test_util import check_grads

    # Two triangles; the probe triangle's z sits strictly inside the z range
    # of the anchor triangle, so the stop-gradient normalization bounds are
    # owned by fixed vertices.
    f = jnp.asarray(np.array([[0, 1, 2], [3, 4, 5]], dtype=np.int32))
    vp_all = jnp.asarray(
        np.array(
            [[[4.0, 4.0], [14.0, 5.0], [8.0, 13.0],
              [5.0, 5.0], [13.0, 6.0], [9.0, 12.0]]],
            dtype=np.float32,
        )
    )
    z_anchor = jnp.asarray([[0.2, 1.0, 0.6]])

    def render_loss(z_probe):
        vz = jnp.concatenate([z_anchor, z_probe], axis=1)
        out = R.soft_rasterize(
            vp_all, vz, f, image_size=(16, 16), sigma=1.5, gamma=0.1,
            backend="xla",
        )
        return jnp.sum(out.depth**2) + jnp.sum(out.sil**2)

    check_grads(
        render_loss, (jnp.asarray([[0.5, 0.55, 0.6]]),),
        order=1, modes=["rev"], atol=1e-2, rtol=1e-2,
    )


def test_gradient_moves_triangle_toward_target_mask():
    """End-to-end sanity: gradient descent on vertex positions shrinks the
    IoU loss against a target silhouette — the property the photometric
    consistency training relies on."""
    f = jnp.asarray(np.array([[0, 1, 2]], dtype=np.int32))
    target_center = jnp.asarray([20.0, 20.0])

    def loss(vp):
        out = R.soft_rasterize(
            vp, jnp.ones((1, 3)) * 0.5, f, image_size=(32, 32),
            sigma=2.0, backend="xla",
        )
        xs = jnp.arange(32) + 0.5
        gx, gy = jnp.meshgrid(xs, xs, indexing="xy")
        tgt = jnp.exp(
            -((gx - target_center[0]) ** 2 + (gy - target_center[1]) ** 2) / 50.0
        )
        return jnp.mean((out.sil[0] - tgt) ** 2)

    vp = jnp.asarray([[[6.0, 4.0], [14.0, 5.0], [9.0, 13.0]]])
    l0 = loss(vp)
    g = jax.grad(loss)(vp)
    assert np.all(np.isfinite(np.asarray(g))) and np.any(np.asarray(g) != 0)
    vp2 = vp - 100.0 * g
    assert float(loss(vp2)) < float(l0)


def test_mano_mesh_renders(mano_model):
    """Full 778-vert / ~1552-face synthetic hand renders without NaNs and
    covers a plausible area."""
    import hocon.geometry.mano as M

    verts, _ = M.mano_forward(
        mano_model, jnp.zeros((1, 15)), jnp.zeros((1, 10)), jnp.zeros((1, 3)),
        scale_mm=False,
    )
    verts = verts + jnp.asarray([0.0, 0.0, 0.6])
    k = jnp.asarray([[[120.0, 0, 32], [0, 120.0, 32], [0, 0, 1.0]]])
    from hocon.geometry.project import persp_project

    vp = persp_project(verts, k)
    out = R.soft_rasterize(
        vp, verts[..., 2], mano_model.faces, image_size=(64, 64), backend="xla"
    )
    sil = np.asarray(out.sil)
    assert np.all(np.isfinite(sil))
    assert 0.05 < sil.mean() < 0.9
